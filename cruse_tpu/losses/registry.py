"""Loss registry: string -> callable dispatch, mirroring the reference's
loss_func modes (loss_func/loss.py:16-34) plus the train_base loss."""
from __future__ import annotations

from cruse_tpu.losses.pmsqe import pmsqe_loss
from cruse_tpu.losses.sisnr import si_snr_loss, si_snr_zero_mean
from cruse_tpu.losses.spectral import (
    rmse_loss,
    compressed_spectral_loss,
    weighted_male_loss,
    sdnr_loss,
    multi_res_spectral_loss,
    cirm_mse_loss,
)


def _neg_si_snr_zero_mean(est, ref, **kw):
    return -si_snr_zero_mean(est, ref)


def _cirm(est, ref, noisy=None, **kw):
    if noisy is None:
        raise TypeError(
            "the 'cirm' loss needs the noisy RI spectrum: call as "
            "get_loss('cirm')(est, ref, noisy=noisy_ri), or select it via "
            "loss_weights in the train step (which passes it)")
    return cirm_mse_loss(est, noisy, ref)


LOSS_REGISTRY = {
    # reference mode names (loss.py:18-21)
    "SI-SNR": lambda est, ref, **kw: si_snr_loss(est, ref),
    "MSE": lambda est, ref, **kw: rmse_loss(est, ref),
    "C_MSE": lambda est, ref, **kw: compressed_spectral_loss(ref, est),
    "WO_MALE": lambda est, ref, noisy=None, **kw: weighted_male_loss(est, ref, noisy),
    "SDNR": sdnr_loss,
    # framework-native names
    "si_snr": lambda est, ref, **kw: si_snr_loss(est, ref),
    "si_snr_zero_mean": _neg_si_snr_zero_mean,
    "compressed_spectral": lambda est, ref, **kw: compressed_spectral_loss(ref, est),
    "multi_res_spectral": lambda est, ref, **kw: multi_res_spectral_loss(est, ref),
    # cIRM MSE needs (enhanced, noisy, clean) RI spectra
    "cirm": _cirm,
    # differentiable PESQ-structured perceptual loss on RI spectra
    "pmsqe": lambda est, ref, sr=16000, **kw: pmsqe_loss(est, ref, sr=sr),
}


def get_loss(name: str):
    if name not in LOSS_REGISTRY:
        raise KeyError(f"unknown loss {name!r}; available: {sorted(LOSS_REGISTRY)}")
    return LOSS_REGISTRY[name]
