"""MTFAA: multi-scale temporal-frequency axial attention model (full-band).

The reference ships only components (model/mtfaa.py:8-239: STFT wrapper,
split-channel complex convs, phase encoder, TFCM, linear filterbanks) and no
top-level network or ASA block (SURVEY.md §2.4) -- both are built new here
from the MTFAA paper ("Multi-Scale Temporal Frequency Convolutional Network
With Axial Attention for Speech Enhancement", ICASSP 2022).

Layout: activations are [B, T, F, C] (time-major NHWC); "complex" tensors
stack real||imag on the channel axis (first half real). All time convs are
causal. The time-axis attention supports a sliding window
(``attention_window``); with a window set, the model streams frame-by-frame
with rolling KV caches, bit-exact with the batch path (tested). Without a
window it is full-causal (training / offline inference).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

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


# ---------------- causal-context helper ----------------


def causal_ext(x: jax.Array, ctx: int, hist: jax.Array | None):
    """Prepend `ctx` frames of context: carried history when streaming, zeros
    otherwise. Returns (extended [B, T+ctx, ...], new_history)."""
    if ctx == 0:
        return x, None
    if hist is None:
        pad = [(0, 0), (ctx, 0)] + [(0, 0)] * (x.ndim - 2)
        x_ext = jnp.pad(x, pad)
    else:
        x_ext = jnp.concatenate([hist, x], axis=1)
    return x_ext, x_ext[:, x_ext.shape[1] - ctx :]


# ---------------- complex convs / phase encoder ----------------


def complex_split(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    c = x.shape[-1] // 2
    return x[..., :c], x[..., c:]


class ComplexConv(nn.Module):
    """Split-channel complex conv: (r2r - i2i, r2i + i2r), causal in time
    (mtfaa.py:39-107). Channel counts include both real+imag halves."""

    out_channels: int
    kernel_size: Tuple[int, int] = (1, 1)  # (time, freq)
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x: jax.Array, hist: jax.Array | None = None):
        kt, kf = self.kernel_size
        x, new_hist = causal_ext(x, kt - 1, hist)
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
        return jnp.concatenate([r2r - i2i, r2i + i2r], axis=-1), new_hist


class PhaseEncoder(nn.Module):
    """Complex conv per input signal -> complex linear projection magnitude
    -> power-law compression (mtfaa.py:123-163)."""

    cout: int = 4
    n_sig: int = 1
    alpha: float = 0.5

    @nn.compact
    def __call__(self, cspecs, state=None):
        """cspecs: list of [B, T, F, 2]. Returns (amp [B,T,F,cout*n_sig], state)."""
        outs, new_state = [], []
        for i in range(self.n_sig):
            hist = state[i] if state is not None else None
            o, h = ComplexConv(self.cout * 2, (3, 1), name=f"cconv_{i}")(cspecs[i], hist)
            outs.append(o)
            new_state.append(h)
        reals = jnp.concatenate([complex_split(o)[0] for o in outs], axis=-1)
        imags = jnp.concatenate([complex_split(o)[1] for o in outs], axis=-1)
        proj, _ = ComplexConv(reals.shape[-1] * 2, (1, 1), name="clp")(
            jnp.concatenate([reals, imags], axis=-1)
        )
        pr, pi = complex_split(proj)
        amp = jnp.sqrt(pr**2 + pi**2 + 1e-8)
        return jnp.power(amp, self.alpha), tuple(new_state)


# ---------------- TFCM ----------------


class TFCMBlock(nn.Module):
    """Residual temporal-freq conv block (mtfaa.py:166-193): 1x1 conv + BN +
    PReLU -> depthwise (3,3) conv, time-dilated + causal -> BN + PReLU ->
    1x1 conv, + input."""

    channels: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, hist: jax.Array | None = None, train: bool = False):
        inp = x
        x = nn.Conv(self.channels, (1, 1), name="pconv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x)
        x = nn.PReLU()(x)
        x, new_hist = causal_ext(x, self.dilation * 2, hist)  # (K_t-1)*dila
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))  # sym freq
        x = nn.Conv(
            self.channels, (3, 3), kernel_dilation=(self.dilation, 1),
            padding="VALID", feature_group_count=self.channels, name="dila_conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(x)
        x = nn.PReLU()(x)
        x = nn.Conv(self.channels, (1, 1), name="pconv2")(x)
        return x + inp, new_hist


class TFCM(nn.Module):
    """Stack with dilations 2^idx (mtfaa.py:196-207, `super` bug repaired)."""

    channels: int
    num_layers: int = 6

    @nn.compact
    def __call__(self, x: jax.Array, state=None, train: bool = False):
        new_state = []
        for idx in range(self.num_layers):
            hist = state[idx] if state is not None else None
            x, h = TFCMBlock(self.channels, 2**idx, name=f"block_{idx}")(x, hist, train=train)
            new_state.append(h)
        return x, tuple(new_state)


# ---------------- ASA (built new; absent in the reference) ----------------


class AxialSelfAttention(nn.Module):
    """F-axis attention then causally-masked T-axis attention, residual.

    1x1 convs produce q/k/v at channels//4; softmax along one axis at a time
    (O(F^2 + T^2), not O((FT)^2)). ``window`` bounds the time attention to
    the last `window` frames; with a window set, streaming carries rolling
    K/V caches of window-1 frames plus a validity count and matches the
    batch path exactly.
    """

    channels: int
    causal: bool = True
    window: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array, state=None, train: bool = False):
        c_att = max(self.channels // 4, 1)
        b, t, f, c = x.shape

        # --- frequency attention (stateless) ---
        qf = nn.Conv(c_att, (1, 1), name="q_f")(x)
        kf = nn.Conv(c_att, (1, 1), name="k_f")(x)
        vf = nn.Conv(self.channels, (1, 1), name="v_f")(x)
        logits = jnp.einsum("btfc,btgc->btfg", qf, kf) / jnp.sqrt(c_att)
        attn = jax.nn.softmax(logits, axis=-1)
        x = x + jnp.einsum("btfg,btgc->btfc", attn, vf)

        # --- temporal attention ---
        qt = nn.Conv(c_att, (1, 1), name="q_t")(x)
        kt = nn.Conv(c_att, (1, 1), name="k_t")(x)
        vt = nn.Conv(self.channels, (1, 1), name="v_t")(x)

        if state is None:
            if self.causal and self.window is not None:
                # block-local causal attention (two-block trick): queries in
                # time block j attend keys in blocks j-1 and j with the
                # (q-w, q] window mask. O(T*2W) memory -- the round-1
                # gather-band formulation materialized [B,T,W,F,C] and OOMed
                # in training at real batch sizes.
                w = min(self.window, t)
                nb = -(-t // w)
                pad_t = nb * w - t
                q_p = jnp.pad(qt, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
                k_p = jnp.pad(kt, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
                v_p = jnp.pad(vt, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
                qb = q_p.reshape(b, nb, w, f, c_att)
                kb = k_p.reshape(b, nb, w, f, c_att)
                vb = v_p.reshape(b, nb, w, f, self.channels)
                k2 = jnp.concatenate([jnp.pad(kb, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :nb], kb], axis=2)
                v2 = jnp.concatenate([jnp.pad(vb, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :nb], vb], axis=2)
                logits = jnp.einsum("bnwfc,bnsfc->bnfws", qb, k2) / jnp.sqrt(c_att)
                # query slot wi (global n*w+wi) sees key slot si (global
                # n*w - w + si) iff 0 <= q-k < w  <=>  wi < si <= wi + w;
                # block 0's "previous block" is padding: also require si >= w
                wi = jnp.arange(w)[:, None]
                si = jnp.arange(2 * w)[None, :]
                band = (si > wi) & (si <= wi + w)  # [w, 2w]
                first = si >= w
                mask = jnp.where(
                    jnp.arange(nb)[:, None, None] == 0, band & first, band
                )  # [nb, w, 2w]
                logits = jnp.where(mask[None, :, None], logits, -1e9)
                attn = jax.nn.softmax(logits, axis=-1)
                xt = jnp.einsum("bnfws,bnsfc->bnwfc", attn, v2)
                xt = xt.reshape(b, nb * w, f, self.channels)[:, :t]
                # emit a valid rolling cache so a follow-up chunk can carry
                # attention context (not just conv/TFCM histories)
                wfull = self.window
                pad_t = max(wfull - 1 - t, 0)
                k_cache = jnp.pad(kt, ((0, 0), (pad_t, 0), (0, 0), (0, 0)))[:, -(wfull - 1) :]
                v_cache = jnp.pad(vt, ((0, 0), (pad_t, 0), (0, 0), (0, 0)))[:, -(wfull - 1) :]
                count = jnp.asarray(min(t, wfull - 1), jnp.int32)
                return x + xt, (k_cache, v_cache, count)
            # full causal attention (training / offline, no window)
            logits = jnp.einsum("btfc,bsfc->bfts", qt, kt) / jnp.sqrt(c_att)
            if self.causal:
                ti = jnp.arange(t)
                mask = ti[:, None] >= ti[None, :]
                logits = jnp.where(mask[None, None], logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1)
            xt = jnp.einsum("bfts,bsfc->btfc", attn, vt)
            return x + xt, None

        # streaming: rolling caches. state = (k_cache, v_cache, count)
        assert self.window is not None, "streaming ASA requires a finite window"
        w = self.window
        k_cache, v_cache, count = state  # [B, w-1, F, c_att], [B, w-1, F, C], scalar
        keys = jnp.concatenate([k_cache, kt], axis=1)  # [B, w-1+T, F, c_att]
        vals = jnp.concatenate([v_cache, vt], axis=1)
        s_len = keys.shape[1]
        logits = jnp.einsum("btfc,bsfc->bfts", qt, keys) / jnp.sqrt(c_att)
        qi = jnp.arange(t)
        si = jnp.arange(s_len)
        # query i (global pos count+i) sees cache slots filled so far plus
        # itself/window: valid s where s > (w-1+i) - w  and  s <= w-1+i
        # and cache slot s < w-1 requires s >= (w-1) - count (unfilled = zeros)
        band = (si[None, :] > (w - 1 + qi[:, None] - w)) & (si[None, :] <= (w - 1) + qi[:, None])
        valid = si[None, :] >= jnp.maximum((w - 1) - count, 0)
        mask = band & valid
        logits = jnp.where(mask[None, None], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        xt = jnp.einsum("bfts,bsfc->btfc", attn, vals)
        new_state = (keys[:, -(w - 1) :], vals[:, -(w - 1) :], jnp.minimum(count + t, w - 1))
        return x + xt, new_state

    def init_stream_state(self, batch_size: int, f: int, dtype=jnp.float32):
        assert self.window is not None
        c_att = max(self.channels // 4, 1)
        w = self.window
        return (
            jnp.zeros((batch_size, w - 1, f, c_att), dtype),
            jnp.zeros((batch_size, w - 1, f, self.channels), dtype),
            jnp.zeros((), jnp.int32),
        )


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
    attention_window: Optional[int] = None  # None = full causal (no streaming)
    mask_activation: str = "sigmoid"
    use_deep_filter: bool = True
    df_taps_t: int = 1
    df_taps_f: int = 1

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1


class MtfaaNet(nn.Module):
    """cspec [B, T, F, 2] -> ((enhanced complex spec [B, T, F], mask), state).

    Phase encoder -> band split -> encoder stages (band-downsampling conv +
    TFCM + ASA) -> mirrored decoder with skips -> magnitude mask at full
    resolution + optional deep-filter refinement. Pass carried state (from
    ``init_state``) for frame-by-frame streaming (requires a finite
    ``attention_window``).
    """

    config: MtfaaConfig = MtfaaConfig()

    def compress(self, mag: jax.Array) -> jax.Array:
        return jnp.power(jnp.maximum(mag, 1e-12), 0.5)

    @nn.compact
    def __call__(self, cspec: jax.Array, state: Dict[str, Any] | None = None,
                 train: bool = False):
        cfg = self.config
        assert cspec.shape[-1] == 2 and cspec.shape[-2] == cfg.num_bins
        banks = Banks(cfg.n_bands, cfg.n_fft, cfg.sr)
        st = state or {}
        new_state: Dict[str, Any] = {}

        amp, new_state["pe"] = PhaseEncoder(cout=cfg.phase_channels, n_sig=1, name="phase_enc")(
            [cspec], st.get("pe")
        )
        x = banks.amp2bank(amp.transpose(0, 1, 3, 2)).transpose(0, 1, 3, 2)  # [B,T,K,C]

        skips = []
        for si, ch in enumerate(cfg.channels):
            x, new_state[f"enc_conv_{si}"] = causal_ext(x, 1, st.get(f"enc_conv_{si}"))
            x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
            x = nn.Conv(ch, (2, 3), strides=(1, cfg.band_strides[si]), padding="VALID",
                        name=f"enc_conv_{si}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"enc_bn_{si}")(x)
            x = nn.PReLU()(x)
            x, new_state[f"enc_tfcm_{si}"] = TFCM(ch, cfg.tfcm_layers, name=f"enc_tfcm_{si}")(
                x, st.get(f"enc_tfcm_{si}"), train=train
            )
            x, new_state[f"enc_asa_{si}"] = AxialSelfAttention(
                ch, window=cfg.attention_window, name=f"enc_asa_{si}"
            )(x, st.get(f"enc_asa_{si}"), train=train)
            skips.append(x)

        for si in reversed(range(len(cfg.channels))):
            ch_out = cfg.channels[si - 1] if si > 0 else cfg.phase_channels
            x = x + skips[si]
            x, new_state[f"dec_conv_{si}"] = causal_ext(x, 1, st.get(f"dec_conv_{si}"))
            t_out = x.shape[1] - 1
            x = nn.ConvTranspose(ch_out, (2, 3), strides=(1, cfg.band_strides[si]),
                                 padding="VALID", name=f"dec_conv_{si}")(x)
            # causal: output frame t uses ext frames t..t+1
            x = x[:, 1 : 1 + t_out]
            x = x[:, :, 1 : 1 + skips[si].shape[2] * cfg.band_strides[si]]
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"dec_bn_{si}")(x)
            x = nn.PReLU()(x)
            x, new_state[f"dec_tfcm_{si}"] = TFCM(ch_out, cfg.tfcm_layers, name=f"dec_tfcm_{si}")(
                x, st.get(f"dec_tfcm_{si}"), train=train
            )

        # magnitude mask head at band resolution -> full bins
        band_mask = nn.Conv(1, (1, 1), name="mask_head")(x)[..., 0]  # [B, T, K]
        mask = banks.bank2amp(band_mask)
        if cfg.mask_activation == "sigmoid":
            mask = nn.sigmoid(mask)
        else:
            mask = nn.relu(mask)

        # spectral math stays fp32 even under bf16 model compute
        # (lax.complex has no bf16 kernel; phase accuracy wants fp32 anyway)
        spec = jax.lax.complex(
            cspec[..., 0].astype(jnp.float32), cspec[..., 1].astype(jnp.float32)
        )
        enhanced = spec * mask.astype(jnp.float32)

        if cfg.use_deep_filter:
            feats = x.reshape(*x.shape[:2], -1)  # [B, T, K*C]
            coefs = nn.Dense(
                cfg.num_bins * self._df_taps * 2, name="df_coef_head"
            )(feats).reshape(*feats.shape[:2], cfg.num_bins, self._df_taps, 2) / self._df_taps
            coefs = coefs.astype(jnp.float32)
            from cruse_tpu.models.deep_filter import deep_filter_apply, tap_offsets

            if state is None:
                out_r, out_i = deep_filter_apply(
                    jnp.real(enhanced), jnp.imag(enhanced),
                    coefs[..., 0], coefs[..., 1],
                    cfg.df_taps_t, cfg.df_taps_f, causal=True,
                )
                enhanced = jax.lax.complex(out_r, out_i)
                new_state["df"] = None if cfg.attention_window is None else (
                    jnp.real(spec * mask)[:, -(2 * cfg.df_taps_t) :],
                    jnp.imag(spec * mask)[:, -(2 * cfg.df_taps_t) :],
                )
            else:
                # streaming: rolling masked-spec history
                hr, hi = st["df"]
                full_r = jnp.concatenate([hr, jnp.real(enhanced)], axis=1)
                full_i = jnp.concatenate([hi, jnp.imag(enhanced)], axis=1)
                depth = full_r.shape[1]
                t_now = enhanced.shape[1]
                offsets = tap_offsets(cfg.df_taps_t, cfg.df_taps_f, causal=True)
                coef_c = coefs  # [B, T, F, K, 2]
                out_r = jnp.zeros_like(jnp.real(enhanced))
                out_i = jnp.zeros_like(out_r)
                for ki, (dt, df) in enumerate(offsets):
                    # frame index in full buffer for output frame j: depth - t_now + j - dt
                    src_r = jax.lax.dynamic_slice_in_dim(full_r, depth - t_now - dt, t_now, axis=1)
                    src_i = jax.lax.dynamic_slice_in_dim(full_i, depth - t_now - dt, t_now, axis=1)
                    if df > 0:
                        src_r = jnp.pad(src_r, ((0, 0), (0, 0), (df, 0)))[:, :, : cfg.num_bins]
                        src_i = jnp.pad(src_i, ((0, 0), (0, 0), (df, 0)))[:, :, : cfg.num_bins]
                    elif df < 0:
                        src_r = jnp.pad(src_r, ((0, 0), (0, 0), (0, -df)))[:, :, -df:]
                        src_i = jnp.pad(src_i, ((0, 0), (0, 0), (0, -df)))[:, :, -df:]
                    cr, ci = coef_c[..., ki, 0], coef_c[..., ki, 1]
                    out_r = out_r + src_r * cr - src_i * ci
                    out_i = out_i + src_r * ci + src_i * cr
                enhanced = jax.lax.complex(out_r, out_i)
                new_state["df"] = (full_r[:, -(2 * cfg.df_taps_t) :], full_i[:, -(2 * cfg.df_taps_t) :])
        return (enhanced, mask), (new_state if cfg.attention_window is not None else None)

    @property
    def _df_taps(self) -> int:
        return (2 * self.config.df_taps_t + 1) * (2 * self.config.df_taps_f + 1)

    def init_state(self, batch_size: int, dtype=jnp.float32) -> Dict[str, Any]:
        """Fresh streaming state (requires attention_window)."""
        cfg = self.config
        assert cfg.attention_window is not None, "set attention_window to stream"
        st: Dict[str, Any] = {}
        st["pe"] = (jnp.zeros((batch_size, 2, cfg.num_bins, 2), dtype),)
        k = cfg.n_bands
        ch_in = cfg.phase_channels
        band_sizes = [k]
        for s in cfg.band_strides:
            band_sizes.append((band_sizes[-1] + 2 - 3) // s + 1)
        for si, ch in enumerate(cfg.channels):
            st[f"enc_conv_{si}"] = jnp.zeros((batch_size, 1, band_sizes[si], ch_in), dtype)
            st[f"enc_tfcm_{si}"] = tuple(
                jnp.zeros((batch_size, 2 * 2**idx, band_sizes[si + 1], ch), dtype)
                for idx in range(cfg.tfcm_layers)
            )
            w = cfg.attention_window
            c_att = max(ch // 4, 1)
            st[f"enc_asa_{si}"] = (
                jnp.zeros((batch_size, w - 1, band_sizes[si + 1], c_att), dtype),
                jnp.zeros((batch_size, w - 1, band_sizes[si + 1], ch), dtype),
                jnp.zeros((), jnp.int32),
            )
            ch_in = ch
        for si in reversed(range(len(cfg.channels))):
            ch_out = cfg.channels[si - 1] if si > 0 else cfg.phase_channels
            st[f"dec_conv_{si}"] = jnp.zeros(
                (batch_size, 1, band_sizes[si + 1], cfg.channels[si]), dtype
            )
            st[f"dec_tfcm_{si}"] = tuple(
                jnp.zeros((batch_size, 2 * 2**idx, band_sizes[si], ch_out), dtype)
                for idx in range(cfg.tfcm_layers)
            )
        if cfg.use_deep_filter:
            st["df"] = (
                jnp.zeros((batch_size, 2 * cfg.df_taps_t, cfg.num_bins), dtype),
                jnp.zeros((batch_size, 2 * cfg.df_taps_t, cfg.num_bins), dtype),
            )
        return st
