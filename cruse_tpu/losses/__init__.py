"""Losses & the gradient-norm balancer (L3)."""

from cruse_tpu.losses.sisnr import si_snr, si_snr_zero_mean, si_snr_loss  # noqa: F401
from cruse_tpu.losses.spectral import (  # noqa: F401
    rmse_loss,
    compressed_spectral_loss,
    weighted_male_loss,
    sdnr_loss,
    MultiResSpectralConfig,
    multi_res_spectral_loss,
)
from cruse_tpu.losses.pmsqe import pmsqe_loss, pmsqe_tables  # noqa: F401
from cruse_tpu.losses.balancer import Balancer, BalancerState  # noqa: F401
from cruse_tpu.losses.registry import LOSS_REGISTRY, get_loss  # noqa: F401
