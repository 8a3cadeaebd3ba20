"""MTFAA: multi-scale temporal-frequency axial attention model (full-band).

The reference ships only components (model/mtfaa.py:8-239: STFT wrapper,
split-channel complex convs, phase encoder, TFCM, linear filterbanks) and no
top-level network or ASA block (SURVEY.md §2.4) -- both are built new here
from the MTFAA paper ("Multi-Scale Temporal Frequency Convolutional Network
With Axial Attention for Speech Enhancement", ICASSP 2022).

Layout: activations are [B, T, F, C] (time-major NHWC); "complex" tensors
stack real||imag on the channel axis (first half real). All time convs are
causal; the axial time-attention is causally masked, so the whole network is
streamable in principle (full-sequence mode implemented; per-frame KV-cache
streaming is future work -- the benchmark config exercises end-to-end
training, BASELINE.md config 5).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from cruse_tpu.models.deep_filter import DeepFilterHead


# ---------------- linear filterbank (spafe-free) ----------------


@functools.lru_cache(maxsize=None)
def linear_filter_banks(nfilts: int, nfft: int, fs: int, low_freq: float | None = None,
                        high_freq: float | None = None) -> np.ndarray:
    """Triangular filters linearly spaced in Hz, shape [nfilts, nfft//2+1]
    (spafe.fbank.linear_fbanks equivalent used at model/mtfaa.py:220-224)."""
    low = low_freq or 0.0
    high = high_freq or fs / 2
    centers = np.linspace(low, high, nfilts + 2)
    bins = np.floor((nfft + 1) * centers / fs).astype(int)
    fbank = np.zeros((nfilts, nfft // 2 + 1))
    for i in range(nfilts):
        l, c, r = bins[i], bins[i + 1], bins[i + 2]
        for k in range(l, c):
            if c != l:
                fbank[i, k] = (k - l) / (c - l)
        for k in range(c, r):
            if r != c:
                fbank[i, k] = (r - k) / (r - c)
    return fbank.astype(np.float32)


class Banks:
    """amp <-> band transforms via the filter matrix and its pseudo-inverse
    (model/mtfaa.py:210-239 with the einsum subscripts repaired)."""

    def __init__(self, nfilters: int, nfft: int, fs: int, low_freq=None, high_freq=None):
        filt = linear_filter_banks(nfilters, nfft, fs, low_freq, high_freq)
        self.filter = jnp.asarray(filt * 1.3)  # [K, F]
        self.filter_inv = jnp.asarray(np.linalg.pinv(filt))  # [F, K]

    def amp2bank(self, amp: jax.Array) -> jax.Array:
        """[..., F] -> [..., K]."""
        return jnp.einsum("...f,kf->...k", amp, self.filter)

    def bank2amp(self, bands: jax.Array) -> jax.Array:
        """[..., K] -> [..., F]."""
        return jnp.einsum("...k,kf->...f", bands, self.filter_inv.T)


# ---------------- complex convs / phase encoder ----------------


def complex_split(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    c = x.shape[-1] // 2
    return x[..., :c], x[..., c:]


class ComplexConv(nn.Module):
    """Split-channel complex conv: (r2r - i2i, r2i + i2r), causal in time
    (mtfaa.py:39-107). Input/out channels count real+imag halves."""

    out_channels: int
    kernel_size: Tuple[int, int] = (1, 1)  # (time, freq)
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kf = self.kernel_size
        if kt > 1:
            x = jnp.pad(x, ((0, 0), (kt - 1, 0), (0, 0), (0, 0)))  # causal
        real, imag = complex_split(x)
        conv_r = nn.Conv(
            self.out_channels // 2, (kt, kf), strides=self.strides, padding=((0, 0), (0, 0)),
            kernel_init=nn.initializers.normal(0.05), name="real_conv",
        )
        conv_i = nn.Conv(
            self.out_channels // 2, (kt, kf), strides=self.strides, padding=((0, 0), (0, 0)),
            kernel_init=nn.initializers.normal(0.05), name="imag_conv",
        )
        r2r, i2i = conv_r(real), conv_i(imag)
        r2i, i2r = conv_i(real), conv_r(imag)
        return jnp.concatenate([r2r - i2i, r2i + i2r], axis=-1)


class PhaseEncoder(nn.Module):
    """Complex conv per input signal -> complex linear projection magnitude
    -> power-law compression (mtfaa.py:123-163)."""

    cout: int = 4
    n_sig: int = 1
    alpha: float = 0.5

    @nn.compact
    def __call__(self, cspecs) -> jax.Array:
        """cspecs: list of [B, T, F, 2] (real||imag). Returns [B, T, F, cout*n_sig/2]."""
        outs = []
        for i in range(self.n_sig):
            # ComplexConv pads its 3 time taps causally itself
            outs.append(ComplexConv(self.cout * 2, (3, 1), name=f"cconv_{i}")(cspecs[i]))
        reals = jnp.concatenate([complex_split(o)[0] for o in outs], axis=-1)
        imags = jnp.concatenate([complex_split(o)[1] for o in outs], axis=-1)
        proj = ComplexConv(reals.shape[-1] * 2, (1, 1), name="clp")(
            jnp.concatenate([reals, imags], axis=-1)
        )
        pr, pi = complex_split(proj)
        amp = jnp.sqrt(pr**2 + pi**2 + 1e-8)
        return jnp.power(amp, self.alpha)


# ---------------- TFCM ----------------


class TFCMBlock(nn.Module):
    """Residual temporal-freq conv block (mtfaa.py:166-193): 1x1 conv + BN +
    PReLU -> depthwise (3,3) conv, time-dilated + causal -> BN + PReLU ->
    1x1 conv, + input."""

    channels: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inp = x
        x = nn.Conv(self.channels, (1, 1), name="pconv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x)
        x = nn.PReLU()(x)
        pad_t = self.dilation * 2  # (K_t - 1) * dilation, K_t = 3
        x = jnp.pad(x, ((0, 0), (pad_t, 0), (1, 1), (0, 0)))
        x = nn.Conv(
            self.channels, (3, 3), kernel_dilation=(self.dilation, 1),
            padding="VALID", feature_group_count=self.channels, name="dila_conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(x)
        x = nn.PReLU()(x)
        x = nn.Conv(self.channels, (1, 1), name="pconv2")(x)
        return x + inp


class TFCM(nn.Module):
    """Stack with dilations 2^idx (mtfaa.py:196-207, `super` bug repaired)."""

    channels: int
    num_layers: int = 6

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for idx in range(self.num_layers):
            x = TFCMBlock(self.channels, 2**idx, name=f"block_{idx}")(x, train=train)
        return x


# ---------------- ASA (built new; absent in the reference) ----------------


class AxialSelfAttention(nn.Module):
    """F-axis attention then causally-masked T-axis attention, residual.

    1x1 convs produce q/k/v at channels//4 (paper's compression), softmax
    attention along one axis at a time -- O(F^2 + T^2) instead of O((FT)^2).
    """

    channels: int
    causal: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_att = max(self.channels // 4, 1)
        b, t, f, c = x.shape

        # --- frequency attention ---
        qf = nn.Conv(c_att, (1, 1), name="q_f")(x)
        kf = nn.Conv(c_att, (1, 1), name="k_f")(x)
        vf = nn.Conv(self.channels, (1, 1), name="v_f")(x)
        logits = jnp.einsum("btfc,btgc->btfg", qf, kf) / jnp.sqrt(c_att)
        attn = jax.nn.softmax(logits, axis=-1)
        xf = jnp.einsum("btfg,btgc->btfc", attn, vf)
        x = x + xf

        # --- temporal attention (causal) ---
        qt = nn.Conv(c_att, (1, 1), name="q_t")(x)
        kt = nn.Conv(c_att, (1, 1), name="k_t")(x)
        vt = nn.Conv(self.channels, (1, 1), name="v_t")(x)
        logits = jnp.einsum("btfc,bsfc->bfts", qt, kt) / jnp.sqrt(c_att)
        if self.causal:
            mask = jnp.tril(jnp.ones((t, t), bool))
            logits = jnp.where(mask[None, None], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        xt = jnp.einsum("bfts,bsfc->btfc", attn, vt)
        return x + xt


# ---------------- full network ----------------


@dataclasses.dataclass(frozen=True)
class MtfaaConfig:
    n_fft: int = 512
    sr: int = 16000
    n_bands: int = 128  # filterbank size (power of 2 for clean down/up sampling)
    phase_channels: int = 4
    channels: Tuple[int, ...] = (24, 32, 48)
    band_strides: Tuple[int, ...] = (2, 2, 2)
    tfcm_layers: int = 4
    mask_activation: str = "sigmoid"
    use_deep_filter: bool = True
    df_taps_t: int = 1
    df_taps_f: int = 1

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1


class MtfaaNet(nn.Module):
    """cspec [B, T, F, 2] -> (enhanced complex spec [B, T, F], aux).

    Phase encoder -> band split -> encoder stages (band-downsampling conv +
    TFCM + ASA) -> mirrored decoder with skips -> magnitude mask on full
    resolution + optional deep-filter refinement.
    """

    config: MtfaaConfig = MtfaaConfig()

    def compress(self, mag: jax.Array) -> jax.Array:
        return jnp.power(jnp.maximum(mag, 1e-12), 0.5)

    @nn.compact
    def __call__(self, cspec: jax.Array, state=None, train: bool = False):
        cfg = self.config
        assert cspec.shape[-1] == 2 and cspec.shape[-2] == cfg.num_bins
        banks = Banks(cfg.n_bands, cfg.n_fft, cfg.sr)

        amp = PhaseEncoder(cout=cfg.phase_channels, n_sig=1, name="phase_enc")([cspec])
        x = banks.amp2bank(amp.transpose(0, 1, 3, 2)).transpose(0, 1, 3, 2)  # [B,T,K,C]

        skips = []
        for si, ch in enumerate(cfg.channels):
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 1), (0, 0)))  # causal t, sym f
            x = nn.Conv(ch, (2, 3), strides=(1, cfg.band_strides[si]), padding="VALID",
                        name=f"enc_conv_{si}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"enc_bn_{si}")(x)
            x = nn.PReLU()(x)
            x = TFCM(ch, cfg.tfcm_layers, name=f"enc_tfcm_{si}")(x, train=train)
            x = AxialSelfAttention(ch, name=f"enc_asa_{si}")(x, train=train)
            skips.append(x)

        for si in reversed(range(len(cfg.channels))):
            ch_out = cfg.channels[si - 1] if si > 0 else cfg.phase_channels
            x = x + skips[si]
            x = nn.ConvTranspose(ch_out, (2, 3), strides=(1, cfg.band_strides[si]),
                                 padding="VALID", name=f"dec_conv_{si}")(x)
            x = x[:, : x.shape[1] - 1]  # causal trim
            x = x[:, :, 1 : 1 + skips[si].shape[2] * cfg.band_strides[si]]
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"dec_bn_{si}")(x)
            x = nn.PReLU()(x)
            x = TFCM(ch_out, cfg.tfcm_layers, name=f"dec_tfcm_{si}")(x, train=train)

        # magnitude mask head at band resolution -> full bins
        band_mask = nn.Conv(1, (1, 1), name="mask_head")(x)[..., 0]  # [B, T, K]
        mask = banks.bank2amp(band_mask)
        if cfg.mask_activation == "sigmoid":
            mask = nn.sigmoid(mask)
        else:
            mask = nn.relu(mask)

        spec = jax.lax.complex(cspec[..., 0], cspec[..., 1])
        enhanced = spec * mask

        if cfg.use_deep_filter:
            feats = x.reshape(*x.shape[:2], -1)  # [B, T, K*C]
            enhanced = DeepFilterHead(
                t_dim=cfg.df_taps_t, f_dim=cfg.df_taps_f, causal=True,
                num_freqs=cfg.num_bins, name="df_head",
            )(feats, enhanced)
        return enhanced, mask
