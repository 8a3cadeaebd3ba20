"""MTFAA: multi-scale temporal-frequency axial attention model (full-band).

The reference ships only components (model/mtfaa.py:8-239: STFT wrapper,
split-channel complex convs, phase encoder, TFCM, linear filterbanks) and no
top-level network or ASA block (SURVEY.md §2.4) -- both are built new here
from the MTFAA paper ("Multi-Scale Temporal Frequency Convolutional Network
With Axial Attention for Speech Enhancement", ICASSP 2022).

Layout: the public API is unchanged (cspec [B, T, F, 2] in, [B, T, F]
enhanced spectrum out), but ALL internal activations are **T-minor**:
``[B, K(bands), C(channels), T(time)]`` with time on the lane axis. TPU
tiles the minor dimension to 128 lanes; MTFAA's channel counts are 4..48,
so the natural channels-minor layout wastes >80% of every HBM/VREG tile
(measured: a TFCM stack costs the same wall time at C=24 and C=128). With
T minor the tiles are dense: T pads by <2% and C=24 is an exact fp32
sublane multiple. Measured on v5e this makes the TFCM stack 2.3x faster
at identical math. Consequences:

- convolutions are expressed as shift-MAC einsums (slice per tap, one
  [Cin, Cout] contraction each) instead of lax.conv -- layout-preserving
  and exactly equivalent;
- normalization is a hand-rolled BatchNorm over the C axis (stats reduce
  over B, K, T) with flax-equivalent running-stat updates;
- attention einsums contract the C (sublane) axis and keep T/S minor.

All time ops are causal. The time-axis attention supports a sliding window
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

    # T-minor variants (freq/band axis 1, time minor)
    def amp2bank_tm(self, amp: jax.Array) -> jax.Array:
        """[B, F, C, T] -> [B, K, C, T]."""
        return jnp.einsum("kf,bfct->bkct", self.filter, amp)

    def bank2amp_tm(self, bands: jax.Array) -> jax.Array:
        """[B, K, T] -> [B, F, T]."""
        return jnp.einsum("fk,bkt->bft", self.filter_inv, bands)


# ---------------- causal-context helper (T-minor) ----------------


def causal_ext(x: jax.Array, ctx: int, hist: jax.Array | None):
    """Prepend `ctx` frames of time context on the MINOR axis: carried
    history when streaming, zeros otherwise. Returns (extended [..., T+ctx],
    new_history [..., ctx])."""
    if ctx == 0:
        return x, None
    if hist is None:
        pad = [(0, 0)] * (x.ndim - 1) + [(ctx, 0)]
        x_ext = jnp.pad(x, pad)
    else:
        x_ext = jnp.concatenate([hist, x], axis=-1)
    return x_ext, x_ext[..., x_ext.shape[-1] - ctx :]


def _bias_tm(b: jax.Array) -> jax.Array:
    """[C] bias broadcast for [B, K, C, T]."""
    return b[:, None]


# ---------------- complex convs / phase encoder ----------------


def complex_split(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Split real||imag halves on the channel axis (axis 2 of [B,F,C,T])."""
    c = x.shape[2] // 2
    return x[:, :, :c], x[:, :, c:]


class ComplexConv(nn.Module):
    """Split-channel complex conv: (r2r - i2i, r2i + i2r), causal in time
    (mtfaa.py:39-107). Channel counts include both real+imag halves.

    T-minor shift-MAC: one [Cin/2, Cout/2] einsum per (time, freq) tap.
    Only strides (1,1) are used by the model (phase encoder)."""

    out_channels: int
    kernel_size: Tuple[int, int] = (1, 1)  # (time, freq)

    @nn.compact
    def __call__(self, x: jax.Array, hist: jax.Array | None = None):
        kt, kf = self.kernel_size
        cin2 = x.shape[2] // 2
        cout2 = self.out_channels // 2
        x, new_hist = causal_ext(x, kt - 1, hist)
        real, imag = complex_split(x)
        init = nn.initializers.normal(0.05)
        wr = self.param("real_kernel", init, (kt, kf, cin2, cout2))
        br = self.param("real_bias", nn.initializers.zeros, (cout2,))
        wi = self.param("imag_kernel", init, (kt, kf, cin2, cout2))
        bi = self.param("imag_bias", nn.initializers.zeros, (cout2,))
        t_out = x.shape[-1] - (kt - 1)
        f_out = x.shape[1] - (kf - 1)

        def conv(u, w):
            acc = None
            for dt in range(kt):
                for df in range(kf):
                    sl = u[:, df : df + f_out, :, dt : dt + t_out]
                    term = jnp.einsum("bfct,co->bfot", sl, w[dt, df])
                    acc = term if acc is None else acc + term
            return acc

        r2r = conv(real, wr) + _bias_tm(br)
        i2i = conv(imag, wi) + _bias_tm(bi)
        r2i = conv(real, wi) + _bias_tm(bi)
        i2r = conv(imag, wr) + _bias_tm(br)
        return jnp.concatenate([r2r - i2i, r2i + i2r], axis=2), new_hist


class PhaseEncoder(nn.Module):
    """Complex conv per input signal -> complex linear projection magnitude
    -> power-law compression (mtfaa.py:123-163). cspecs: list of
    [B, F, 2, T] (real||imag on axis 2)."""

    cout: int = 4
    n_sig: int = 1
    alpha: float = 0.5

    @nn.compact
    def __call__(self, cspecs, state=None):
        outs, new_state = [], []
        for i in range(self.n_sig):
            hist = state[i] if state is not None else None
            o, h = ComplexConv(self.cout * 2, (3, 1), name=f"cconv_{i}")(cspecs[i], hist)
            outs.append(o)
            new_state.append(h)
        reals = jnp.concatenate([complex_split(o)[0] for o in outs], axis=2)
        imags = jnp.concatenate([complex_split(o)[1] for o in outs], axis=2)
        proj, _ = ComplexConv(reals.shape[2] * 2, (1, 1), name="clp")(
            jnp.concatenate([reals, imags], axis=2)
        )
        pr, pi = complex_split(proj)
        amp = jnp.sqrt(pr**2 + pi**2 + 1e-8)
        return jnp.power(amp, self.alpha), tuple(new_state)


# ---------------- normalization (T-minor BatchNorm) ----------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train_c(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float):
    """Train-mode batch norm over axis 2 of [B, K, C, T] with a
    dtype-clean hand-written backward.

    Why custom: autodiff through the fp32 stats path materializes THREE
    f32 copies of the activation per BatchNorm in the backward (observed
    in the round-4 profiler trace as 1.03 ms broadcast_multiply fusions of
    f32[16,64,24,626] x8); the step is bandwidth-bound, so those doubled
    bytes are pure loss. This backward keeps big tensors in the compute
    dtype and accumulates only the per-channel reductions in fp32
    (gradient parity: tests/test_tfcm_train.py::test_bn_train_c_grads).

    Returns (out, mean, var); mean/var feed the running-stat EMA only and
    must be stop-gradient'd by the caller (their cotangents are ignored).
    """
    out, _ = _bn_train_c_fwd(x, scale, bias, eps)
    return out


def _bn_train_c_fwd(x, scale, bias, eps):
    # stats accumulate in fp32 even under bf16 model compute (a bf16 sum
    # over ~1e6 elements has ~8 mantissa bits -- unusable)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 3))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 3)) - jnp.square(mean)
    inv = (jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)).astype(x.dtype)
    out = (x - mean.astype(x.dtype)[:, None]) * inv[:, None] + bias.astype(x.dtype)[:, None]
    return (out, mean, var), (x, mean, var, scale, bias)


def _bn_train_c_bwd(eps, res, cots):
    x, mean, var, scale, bias = res
    dy, _dm, _dv = cots  # stat cotangents are zero by caller contract
    dt = x.dtype
    n = x.shape[0] * x.shape[1] * x.shape[3]
    invr = jax.lax.rsqrt(var + eps)  # [C] fp32
    xh = ((x - mean.astype(dt)[:, None]) * invr.astype(dt)[:, None])
    dg = jnp.sum((dy * xh).astype(jnp.float32), axis=(0, 1, 3))
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 3))
    s = (invr * scale.astype(jnp.float32)).astype(dt)
    dx = s[:, None] * (
        dy - (db / n).astype(dt)[:, None] - xh * (dg / n).astype(dt)[:, None]
    )
    return dx, dg.astype(scale.dtype), db.astype(bias.dtype)


_bn_train_c.defvjp(lambda x, s, b, e: _bn_train_c_fwd(x, s, b, e), _bn_train_c_bwd)


class BatchNormC(nn.Module):
    """BatchNorm over the channel axis of [B, K, C, T] (stats reduce over
    B, K, T) with flax-equivalent running-average updates. Hand-rolled so
    the surrounding shift-MAC ops never force a channels-minor relayout.
    Train mode routes through _bn_train_c (dtype-clean custom backward)."""

    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        c = x.shape[2]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if train:
            out, mean, var = _bn_train_c(x, scale, bias, self.eps)
            if not self.is_initializing():
                m = self.momentum
                mean = jax.lax.stop_gradient(mean)
                var = jax.lax.stop_gradient(var)
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
            return out
        mean = ra_mean.value
        var = ra_var.value
        inv = (jax.lax.rsqrt(var + self.eps) * scale.astype(jnp.float32)).astype(x.dtype)
        return (x - mean.astype(x.dtype)[:, None]) * inv[:, None] + bias[:, None]


class PReLUc(nn.Module):
    """PReLU with a single learnable slope (flax nn.PReLU equivalent)."""

    init: float = 0.01

    @nn.compact
    def __call__(self, x: jax.Array):
        a = self.param("negative_slope", nn.initializers.constant(self.init), ())
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


# ---------------- TFCM ----------------


class TFCMBlock(nn.Module):
    """Residual temporal-freq conv block (mtfaa.py:166-193): 1x1 conv + BN +
    PReLU -> depthwise (3,3) conv, time-dilated + causal -> BN + PReLU ->
    1x1 conv, + input. T-minor: 1x1 convs are C-contraction einsums, the
    depthwise conv is 9 shifted elementwise MACs."""

    channels: int
    dilation: int = 1
    dw_impl: str = "xla"  # "xla" (9 shifted MACs) | "pallas" (fused
    # fwd + one-pass dx+dwd bwd, ops/dw_kernel.py -- wins IN-GRAPH where
    # XLA defuses the 9 per-tap weight-grad reductions, round-4 finding)

    @nn.compact
    def __call__(self, x: jax.Array, hist: jax.Array | None = None, train: bool = False):
        c = self.channels
        if (self.dw_impl.startswith("fused") and train and hist is None
                and not self.is_initializing()):
            return self._fused_train(x)
        inp = x
        w1 = self.param("pconv1_kernel", nn.initializers.lecun_normal(), (x.shape[2], c))
        b1 = self.param("pconv1_bias", nn.initializers.zeros, (c,))
        x = jnp.einsum("bkct,co->bkot", x, w1) + _bias_tm(b1)
        x = BatchNormC(name="bn1")(x, train=train)
        x = PReLUc(name="prelu1")(x)
        d = self.dilation
        x, new_hist = causal_ext(x, 2 * d, hist)  # (K_t-1)*dila on T
        wd = self.param("dw_kernel", nn.initializers.lecun_normal(), (3, 3, c))
        bd = self.param("dw_bias", nn.initializers.zeros, (c,))
        tlen = x.shape[-1] - 2 * d
        klen = inp.shape[1]
        if self.dw_impl.startswith("pallas"):
            from cruse_tpu.ops.dw_kernel import dw_causal_tm

            # "pallas_interpret" runs the kernel in interpreter mode (CPU
            # parity tests, mirroring asa_impl="flash_interpret")
            acc = dw_causal_tm(x, wd, d,
                               interpret=self.dw_impl.endswith("interpret"))
        else:
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))  # sym freq
            acc = None
            for it in range(3):  # causal time taps at offsets -2d, -d, 0
                for jf in range(3):  # symmetric freq taps
                    sl = xp[:, jf : jf + klen, :, it * d : it * d + tlen] * wd[it, jf][:, None]
                    acc = sl if acc is None else acc + sl
        x = acc + _bias_tm(bd)
        x = BatchNormC(name="bn2")(x, train=train)
        x = PReLUc(name="prelu2")(x)
        w2 = self.param("pconv2_kernel", nn.initializers.lecun_normal(), (c, c))
        b2 = self.param("pconv2_bias", nn.initializers.zeros, (c,))
        x = jnp.einsum("bkct,co->bkot", x, w2) + _bias_tm(b2)
        return x + inp, new_hist

    def _fused_train(self, x: jax.Array):
        """Training path through ops/tfcm_train.py: identical math, hand-
        scheduled 3-phase backward (the autodiff backward defuses ~9
        per-channel reductions per block into separate HBM passes at full-
        graph scale -- round-4 measurement, see ops/tfcm_train.py).
        Parameter/stat names and shapes match the standard path exactly,
        so checkpoints are interchangeable between impls."""
        from cruse_tpu.ops.tfcm_train import tfcm_block_train

        c = self.channels
        w1 = self.param("pconv1_kernel", nn.initializers.lecun_normal(), (x.shape[2], c))
        b1 = self.param("pconv1_bias", nn.initializers.zeros, (c,))
        wd = self.param("dw_kernel", nn.initializers.lecun_normal(), (3, 3, c))
        bd = self.param("dw_bias", nn.initializers.zeros, (c,))
        w2 = self.param("pconv2_kernel", nn.initializers.lecun_normal(), (c, c))
        b2 = self.param("pconv2_bias", nn.initializers.zeros, (c,))
        bn1 = _BNVars(c, name="bn1")
        bn2 = _BNVars(c, name="bn2")
        g1, be1, rm1, rv1 = bn1()
        g2, be2, rm2, rv2 = bn2()
        # PReLU slopes under the same module names as PReLUc
        a1 = _PReLUVar(name="prelu1")()
        a2 = _PReLUVar(name="prelu2")()
        params = (w1, b1, g1, be1, a1, wd, bd, g2, be2, a2, w2, b2)
        # "fused" -> hand-ordered XLA backward; "fused_pallas[_interpret]"
        # -> the reduction kernels (ops/tfcm_bwd_kernels.py)
        impl = self.dw_impl[len("fused_"):] if len(self.dw_impl) > 5 else "xla"
        y, new_hist, m1, v1, m2, v2 = tfcm_block_train(
            x, params, self.dilation, 1e-5, impl)
        # training discards streaming state: its cotangent is structurally
        # zero, which the kernel backward relies on
        new_hist = jax.lax.stop_gradient(new_hist)
        # running-stat EMA exactly as BatchNormC (momentum 0.9); stats are
        # stop-gradient'd -- the custom backward ignores their cotangents
        mom = 0.9
        for var, val in ((rm1, m1), (rv1, v1), (rm2, m2), (rv2, v2)):
            var.value = mom * var.value + (1 - mom) * jax.lax.stop_gradient(val)
        return y, new_hist


class _BNVars(nn.Module):
    """Parameter/stat holder matching BatchNormC's variable layout, for
    the fused TFCM training path (same names -> same checkpoint tree)."""

    channels: int

    @nn.compact
    def __call__(self):
        c = self.channels
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        return scale, bias, mean, var


class _PReLUVar(nn.Module):
    """Slope holder matching PReLUc's parameter name."""

    init: float = 0.01

    @nn.compact
    def __call__(self):
        return self.param("negative_slope", nn.initializers.constant(self.init), ())


class TFCM(nn.Module):
    """Stack with dilations 2^idx (mtfaa.py:196-207, `super` bug repaired).

    ``remat=True`` wraps each block in jax.checkpoint. This is a SPEED
    knob, not (only) a memory one: in the full training graph XLA stops
    fusing the ~12 per-block parameter-gradient reductions (each becomes
    its own HBM pass -- measured round 4: the windowed MTFAA step's
    backward is 60.6 ms for a 12.8 ms forward, with >20 ms attributable
    to unfused param-grad reductions, scripts/profile_step_anatomy.py /
    profile_tfcm_chain.py). Checkpointing each block makes its backward a
    compact local cluster that XLA fuses like the isolated block.
    """

    channels: int
    num_layers: int = 6
    remat: bool = False
    dw_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, state=None, train: bool = False):
        new_state = []
        block_cls = TFCMBlock
        if self.remat:
            block_cls = nn.remat(TFCMBlock, static_argnums=(3,))
        for idx in range(self.num_layers):
            hist = state[idx] if state is not None else None
            x, h = block_cls(self.channels, 2**idx, self.dw_impl,
                             name=f"block_{idx}")(x, hist, train)
            new_state.append(h)
        return x, tuple(new_state)


def _attn_softmax(logits: jax.Array, axis: int) -> jax.Array:
    """Softmax with fp32 internals but logits/probs materialized in the
    compute dtype. Round-4 finding: the previous `logits / jnp.sqrt(c)`
    and `jnp.where(mask, logits, -1e9)` promoted every attention tensor
    to f32 via Python-scalar promotion, doubling the bytes of the ASA's
    dominant [.., w, 2w] tensors (the step is bandwidth-bound)."""
    return jax.nn.softmax(logits.astype(jnp.float32), axis=axis).astype(logits.dtype)


def _neg_inf(dtype) -> jax.Array:
    return jnp.asarray(-1e9, dtype)


# ---------------- ASA (built new; absent in the reference) ----------------


class AxialSelfAttention(nn.Module):
    """F-axis attention then causally-masked T-axis attention, residual.

    1x1 projections produce q/k/v at channels//4; softmax along one axis at
    a time (O(F^2 + T^2), not O((FT)^2)). T-minor einsums contract the C
    axis so logits stay [.., T] / [.., S] minor. ``window`` bounds the time
    attention to the last `window` frames; with a window set, streaming
    carries rolling K/V caches of window-1 frames plus a validity count and
    matches the batch path exactly.
    """

    channels: int
    causal: bool = True
    window: Optional[int] = None
    # "auto" | "flash" | "flash_interpret" (CPU tests) | "xla"; batch paths only.
    # "auto" currently resolves to the einsum+mask path: the flash kernel
    # (ops/asa_kernel.py) is measured SLOWER on v5e at MTFAA geometries
    # (0.69x full-causal, 0.97x windowed fwd+bwd, scripts/profile_asa.py) --
    # the per-block matmuls at K=c_att=6..12 are MXU-latency-bound, so
    # skipping the HBM logits round-trip does not pay. Opt in explicitly to
    # re-measure.
    impl: str = "auto"

    def _use_flash(self) -> bool:
        return self.impl in ("flash", "flash_interpret")

    @nn.compact
    def __call__(self, x: jax.Array, state=None, train: bool = False):
        c_att = max(self.channels // 4, 1)
        b, f, c, t = x.shape
        init = nn.initializers.lecun_normal()

        def proj(u, name, cout):
            w = self.param(f"{name}_kernel", init, (u.shape[2], cout))
            bb = self.param(f"{name}_bias", nn.initializers.zeros, (cout,))
            return jnp.einsum("bkct,co->bkot", u, w) + _bias_tm(bb)

        # --- frequency attention (stateless) ---
        qf = proj(x, "q_f", c_att)
        kf = proj(x, "k_f", c_att)
        vf = proj(x, "v_f", self.channels)
        inv_scale = jnp.asarray(1.0 / np.sqrt(c_att), x.dtype)
        logits = jnp.einsum("bkct,bqct->bkqt", qf, kf) * inv_scale
        attn = _attn_softmax(logits, axis=2)
        x = x + jnp.einsum("bkqt,bqct->bkct", attn, vf)

        # --- temporal attention ---
        qt = proj(x, "q_t", c_att)
        kt = proj(x, "k_t", c_att)
        vt = proj(x, "v_t", self.channels)

        if state is None:
            if self._use_flash():
                # fused flash kernel: T-minor [B*F, c, T] in, attention
                # matrix never materialized (ops/asa_kernel.py); same math
                # as the einsum paths below (parity-tested)
                from cruse_tpu.ops.asa_kernel import flash_tattn_tm

                w = self.window if self.causal else None
                xt = flash_tattn_tm(
                    qt.reshape(b * f, c_att, t),
                    kt.reshape(b * f, c_att, t),
                    vt.reshape(b * f, self.channels, t),
                    w,
                    self.impl == "flash_interpret",
                ).reshape(b, f, self.channels, t)
                if self.window is None:
                    return x + xt, None
                wfull = self.window
                pad_t = max(wfull - 1 - t, 0)
                k_cache = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (pad_t, 0)))[..., -(wfull - 1) :]
                v_cache = jnp.pad(vt, ((0, 0), (0, 0), (0, 0), (pad_t, 0)))[..., -(wfull - 1) :]
                count = jnp.full((b,), min(t, wfull - 1), jnp.int32)
                return x + xt, (k_cache, v_cache, count)
            if self.causal and self.window is not None:
                # block-local causal attention (two-block trick): queries in
                # time block j attend keys in blocks j-1 and j with the
                # (q-w, q] window mask. O(T*2W) memory.
                w = min(self.window, t)
                nb = -(-t // w)
                pad_t = nb * w - t
                q_p = jnp.pad(qt, ((0, 0), (0, 0), (0, 0), (0, pad_t)))
                k_p = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (0, pad_t)))
                v_p = jnp.pad(vt, ((0, 0), (0, 0), (0, 0), (0, pad_t)))
                qb = q_p.reshape(b, f, c_att, nb, w)
                kb = k_p.reshape(b, f, c_att, nb, w)
                vb = v_p.reshape(b, f, self.channels, nb, w)
                # previous block's keys/vals: shift blocks right by one
                kprev = jnp.pad(kb, ((0, 0), (0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :, :nb]
                vprev = jnp.pad(vb, ((0, 0), (0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :, :nb]
                k2 = jnp.concatenate([kprev, kb], axis=4)  # [B,F,c,nb,2w]
                v2 = jnp.concatenate([vprev, vb], axis=4)
                logits = jnp.einsum("bfcnw,bfcns->bfnws", qb, k2) * inv_scale
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
                logits = jnp.where(mask[None, None], logits, _neg_inf(logits.dtype))
                attn = _attn_softmax(logits, axis=-1)
                xt = jnp.einsum("bfnws,bfcns->bfcnw", attn, v2)
                xt = xt.reshape(b, f, self.channels, nb * w)[..., :t]
                # emit a valid rolling cache so a follow-up chunk can carry
                # attention context (not just conv/TFCM histories)
                wfull = self.window
                pad_t = max(wfull - 1 - t, 0)
                k_cache = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (pad_t, 0)))[..., -(wfull - 1) :]
                v_cache = jnp.pad(vt, ((0, 0), (0, 0), (0, 0), (pad_t, 0)))[..., -(wfull - 1) :]
                count = jnp.full((b,), min(t, wfull - 1), jnp.int32)
                return x + xt, (k_cache, v_cache, count)
            # full causal attention (training / offline, no window)
            logits = jnp.einsum("bfct,bfcs->bfts", qt, kt) * inv_scale
            if self.causal:
                ti = jnp.arange(t)
                mask = ti[:, None] >= ti[None, :]
                logits = jnp.where(mask[None, None], logits, _neg_inf(logits.dtype))
            attn = _attn_softmax(logits, axis=-1)
            xt = jnp.einsum("bfts,bfcs->bfct", attn, vt)
            return x + xt, None

        # streaming: rolling caches. state = (k_cache, v_cache, count)
        assert self.window is not None, "streaming ASA requires a finite window"
        w = self.window
        k_cache, v_cache, count = state  # [B,F,c_att,w-1], [B,F,C,w-1], [B]
        keys = jnp.concatenate([k_cache, kt], axis=-1)  # [B,F,c_att,w-1+T]
        vals = jnp.concatenate([v_cache, vt], axis=-1)
        s_len = keys.shape[-1]
        logits = jnp.einsum("bfct,bfcs->bfts", qt, keys) * inv_scale
        qi = jnp.arange(t)
        si = jnp.arange(s_len)
        # query i (global pos count+i) sees cache slots filled so far plus
        # itself/window: valid s where s > (w-1+i) - w  and  s <= w-1+i
        # and cache slot s < w-1 requires s >= (w-1) - count (unfilled = zeros)
        band = (si[None, :] > (w - 1 + qi[:, None] - w)) & (si[None, :] <= (w - 1) + qi[:, None])
        # per-stream validity: cache slot s < w-1 is real only if that
        # stream has already produced >= (w-1) - s frames (multiplexed
        # serving resets streams independently, so count is per-batch)
        valid = si[None, None, :] >= jnp.maximum(
            (w - 1) - count, 0
        )[:, None, None]
        mask = band[None] & valid  # [B, t, s]
        logits = jnp.where(mask[:, None], logits, _neg_inf(logits.dtype))
        attn = _attn_softmax(logits, axis=-1)
        xt = jnp.einsum("bfts,bfcs->bfct", attn, vals)
        new_state = (keys[..., -(w - 1) :], vals[..., -(w - 1) :], jnp.minimum(count + t, w - 1))
        return x + xt, new_state

    def init_stream_state(self, batch_size: int, f: int, dtype=jnp.float32):
        assert self.window is not None
        c_att = max(self.channels // 4, 1)
        w = self.window
        return (
            jnp.zeros((batch_size, f, c_att, w - 1), dtype),
            jnp.zeros((batch_size, f, self.channels, w - 1), dtype),
            jnp.zeros((batch_size,), jnp.int32),
        )


# ---------------- band up/down sampling convs (T-minor) ----------------


class BandDownConv(nn.Module):
    """Causal (2,3) conv with freq stride `s`: the encoder stage conv.
    out[k, t] = sum_{dt<=1, dk<3, c} W[dt,dk,c,o] x_ext[s*k+dk-1, c, t-1+dt]
    (time taps: previous + current frame; symmetric freq padding)."""

    channels: int
    stride: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, hist: jax.Array | None = None):
        k_in, c_in = x.shape[1], x.shape[2]
        s = self.stride
        k_out = (k_in - 1) // s + 1
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (2, 3, c_in, self.channels))
        b = self.param("bias", nn.initializers.zeros, (self.channels,))
        x, new_hist = causal_ext(x, 1, hist)
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        t_out = x.shape[-1] - 1
        if s == 2 and k_in % 2 == 0:
            # Stride-2 fast path: even/odd freq reshape -> six UNIT-stride
            # tap views -> one [6*c_in, c_out] MXU contraction. The naive
            # strided slice below differentiates into a serial while-loop
            # gather (round-4 trace: 18.6 ms/step in ~2300 tiny launches at
            # bench shapes); unit-stride views differentiate to plain
            # pad-add fusions. Concatenating the taps on C also widens the
            # contraction 6x (c_in is 4 at stage 0 -- far under the MXU's
            # 128-lane contraction width, so the separate per-tap matmuls
            # were latency-bound).
            bsz = x.shape[0]
            r = xp.reshape(bsz, (k_in + 2) // 2, 2, c_in, x.shape[-1])
            fr = (r[:, :k_out, 0], r[:, :k_out, 1], r[:, 1 : k_out + 1, 0])
            taps = [v[..., dt : dt + t_out] for v in fr for dt in range(2)]
            xcat = jnp.concatenate(taps, axis=2)  # [B, k_out, 6*c_in, T]
            wf = jnp.concatenate(
                [w[dt, dk] for dk in range(3) for dt in range(2)], axis=0
            )
            return jnp.einsum("bkct,co->bkot", xcat, wf) + _bias_tm(b), new_hist
        acc = None
        for dt in range(2):
            for dk in range(3):
                sl = xp[:, dk : dk + s * (k_out - 1) + 1 : s, :, dt : dt + t_out]
                term = jnp.einsum("bkct,co->bkot", sl, w[dt, dk])
                acc = term if acc is None else acc + term
        return acc + _bias_tm(b), new_hist


class BandUpConv(nn.Module):
    """Causal transposed (2,3) conv with freq stride 2: the decoder stage.
    Output band 2k (even) takes the center freq tap of input band k; band
    2k+1 (odd) takes the outer taps of bands k and k+1. Time taps: current
    + previous frame (causal). Output freq length = 2 * input length."""

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array, hist: jax.Array | None = None):
        k_in, c_in = x.shape[1], x.shape[2]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (2, 3, c_in, self.channels))
        b = self.param("bias", nn.initializers.zeros, (self.channels,))
        x, new_hist = causal_ext(x, 1, hist)
        t_out = x.shape[-1] - 1

        def tap(u, dt, dk):
            return jnp.einsum("bkct,co->bkot", u[..., dt : dt + t_out], w[dt, dk])

        # x_next[k] = x[k+1] (zero past the top band)
        x_next = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]
        even = tap(x, 0, 1) + tap(x, 1, 1)
        odd = (tap(x, 0, 2) + tap(x, 1, 2)) + (tap(x_next, 0, 0) + tap(x_next, 1, 0))
        y = jnp.stack([even, odd], axis=2)  # [B, K, 2, C, T]
        y = y.reshape(x.shape[0], 2 * k_in, self.channels, t_out)
        return y + _bias_tm(b), new_hist


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
    tfcm_remat: bool = False  # checkpoint each TFCM block (measured
    # NEGATIVE on v5e: recompute does not restore fusion; kept as a
    # memory knob)
    tfcm_dw_impl: str = "fused_fold"  # TFCM training-path implementation:
    # "fused_fold" (default, round-5): hand-scheduled 3-phase backward
    #   (ops/tfcm_train.py) + BN1 algebraically folded into the 1x1
    #   contraction (stats from the CxC Gram of x; the normalized
    #   activation is emitted directly and reused by the backward).
    #   Measured: windowed train step 130.8 -> 123.7 ms (+5.7%).
    # "fused": same hand-scheduled backward, unfolded BN1.
    # "xla": plain autodiff through BatchNormC (reference semantics).
    # "pallas"/"fused_pallas": Pallas stencil variants (measured ties/
    #   losses, kept as documented experiments; ops/dw_kernel.py).
    # All impls share parameter/stat names -- checkpoints interchange.
    attention_window: Optional[int] = None  # None = full causal (no streaming)
    asa_impl: str = "auto"  # "auto" resolves to the einsum path (the flash
    # Pallas kernel measured SLOWER, ops/asa_kernel.py; opt in with "flash")
    asa_enabled: bool = True  # ablation knob (scripts/floor_derivation.py):
    # False removes the ASA blocks entirely to measure their differential
    # cost in the full training graph. Not a production configuration.
    asa_remat: bool = False  # jax.checkpoint around each ASA block: the
    # backward recomputes logits/attn from q/k/v instead of loading the
    # saved [B,F,nb,w,2w] tensors (~1.1 GB each across the 3 sites).
    # Scoped to ASA only -- whole-model remat measured negative (round 3).
    mask_activation: str = "sigmoid"
    use_deep_filter: bool = True
    df_taps_t: int = 1
    df_taps_f: int = 1

    def __post_init__(self):
        # BandUpConv's T-minor decoder stage is specialized to stride-2
        # up-sampling (even/odd interleave, mtfaa.py:457-483); a non-2
        # encoder stride would silently mis-shape the mirrored decoder.
        assert all(s == 2 for s in self.band_strides), (
            f"band_strides must all be 2 (got {self.band_strides}): the "
            "T-minor BandUpConv decoder only implements stride-2 upsampling"
        )

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1


class MtfaaNet(nn.Module):
    """cspec [B, T, F, 2] -> ((enhanced complex spec [B, T, F], mask), state).

    Phase encoder -> band split -> encoder stages (band-downsampling conv +
    TFCM + ASA) -> mirrored decoder with skips -> magnitude mask at full
    resolution + optional deep-filter refinement. Pass carried state (from
    ``init_state``) for frame-by-frame streaming (requires a finite
    ``attention_window``). Internals run in the T-minor [B, K, C, T] layout
    (see module docstring); the public API is layout-agnostic.
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

        # T-minor entry: [B, T, F, 2] -> [B, F, 2, T]
        cspec_tm = jnp.transpose(cspec, (0, 2, 3, 1))
        amp, new_state["pe"] = PhaseEncoder(cout=cfg.phase_channels, n_sig=1, name="phase_enc")(
            [cspec_tm], st.get("pe")
        )
        x = banks.amp2bank_tm(amp)  # [B, K, C, T]

        skips = []
        for si, ch in enumerate(cfg.channels):
            x, new_state[f"enc_conv_{si}"] = BandDownConv(
                ch, cfg.band_strides[si], name=f"enc_conv_{si}"
            )(x, st.get(f"enc_conv_{si}"))
            x = BatchNormC(name=f"enc_bn_{si}")(x, train=train)
            x = PReLUc(name=f"enc_prelu_{si}")(x)
            x, new_state[f"enc_tfcm_{si}"] = TFCM(ch, cfg.tfcm_layers, cfg.tfcm_remat, cfg.tfcm_dw_impl, name=f"enc_tfcm_{si}")(
                x, st.get(f"enc_tfcm_{si}"), train=train
            )
            if cfg.asa_enabled:
                asa_cls = AxialSelfAttention
                if cfg.asa_remat:
                    asa_cls = nn.remat(AxialSelfAttention, static_argnums=(2,))
                x, new_state[f"enc_asa_{si}"] = asa_cls(
                    ch, window=cfg.attention_window, impl=cfg.asa_impl,
                    name=f"enc_asa_{si}"
                )(x, st.get(f"enc_asa_{si}"), train=train)
            skips.append(x)

        for si in reversed(range(len(cfg.channels))):
            ch_out = cfg.channels[si - 1] if si > 0 else cfg.phase_channels
            x = x + skips[si]
            x, new_state[f"dec_conv_{si}"] = BandUpConv(ch_out, name=f"dec_conv_{si}")(
                x, st.get(f"dec_conv_{si}")
            )
            x = BatchNormC(name=f"dec_bn_{si}")(x, train=train)
            x = PReLUc(name=f"dec_prelu_{si}")(x)
            x, new_state[f"dec_tfcm_{si}"] = TFCM(ch_out, cfg.tfcm_layers, cfg.tfcm_remat, cfg.tfcm_dw_impl, name=f"dec_tfcm_{si}")(
                x, st.get(f"dec_tfcm_{si}"), train=train
            )

        # magnitude mask head at band resolution -> full bins
        wm = self.param("mask_head_kernel", nn.initializers.lecun_normal(),
                        (x.shape[2], 1))
        bm = self.param("mask_head_bias", nn.initializers.zeros, (1,))
        band_mask = jnp.einsum("bkct,co->bkot", x, wm)[:, :, 0] + bm  # [B, K, T]
        mask_tm = banks.bank2amp_tm(band_mask)  # [B, F, T]
        if cfg.mask_activation == "sigmoid":
            mask_tm = nn.sigmoid(mask_tm)
        else:
            mask_tm = nn.relu(mask_tm)
        mask = jnp.transpose(mask_tm, (0, 2, 1))  # [B, T, F]

        # spectral math stays fp32 even under bf16 model compute
        # (lax.complex has no bf16 kernel; phase accuracy wants fp32 anyway)
        spec = jax.lax.complex(
            cspec[..., 0].astype(jnp.float32), cspec[..., 1].astype(jnp.float32)
        )
        enhanced = spec * mask.astype(jnp.float32)

        if cfg.use_deep_filter:
            # coefficient head straight off the T-minor features
            wdf = self.param("df_coef_kernel", nn.initializers.lecun_normal(),
                             (x.shape[1] * x.shape[2], cfg.num_bins * self._df_taps * 2))
            bdf = self.param("df_coef_bias", nn.initializers.zeros,
                             (cfg.num_bins * self._df_taps * 2,))
            feats = x.reshape(x.shape[0], x.shape[1] * x.shape[2], x.shape[3])
            coefs_tm = (jnp.einsum("bct,cd->bdt", feats, wdf) + bdf[:, None]) / self._df_taps
            t_now = coefs_tm.shape[-1]
            from cruse_tpu.models.deep_filter import (
                deep_filter_apply_tm, tap_offsets,
            )

            if state is None:
                # batch path stays T-minor end to end: the coef reshape
                # [B, F*K*2, T] -> [B, F, K, 2, T] is free (d decomposes in
                # the same f-major/tap/ri order as the old T-major reshape,
                # so weight layout and checkpoints are unchanged), the
                # masked spectrum comes straight off cspec_tm/mask_tm, and
                # the taps are lane/sublane shifts. Measured step effect:
                # neutral (123.8 -> 123.6 ms windowed train) — XLA already
                # folded the old transposes; kept as the simpler layout.
                coefs_bf = coefs_tm.reshape(
                    x.shape[0], cfg.num_bins, self._df_taps, 2, t_now
                ).astype(jnp.float32)
                mask32 = mask_tm.astype(jnp.float32)
                em_r = cspec_tm[:, :, 0].astype(jnp.float32) * mask32
                em_i = cspec_tm[:, :, 1].astype(jnp.float32) * mask32
                out_r, out_i = deep_filter_apply_tm(
                    em_r, em_i,
                    coefs_bf[:, :, :, 0], coefs_bf[:, :, :, 1],
                    cfg.df_taps_t, cfg.df_taps_f, causal=True,
                )
                enhanced = jax.lax.complex(
                    jnp.transpose(out_r, (0, 2, 1)), jnp.transpose(out_i, (0, 2, 1))
                )
                ctx = 2 * cfg.df_taps_t
                new_state["df"] = None if cfg.attention_window is None else (
                    jnp.transpose(em_r[..., -ctx:], (0, 2, 1)),
                    jnp.transpose(em_i[..., -ctx:], (0, 2, 1)),
                )
            else:
                coefs = jnp.transpose(coefs_tm, (0, 2, 1)).reshape(
                    x.shape[0], t_now, cfg.num_bins, self._df_taps, 2
                ).astype(jnp.float32)
                # streaming: rolling masked-spec history ([B, T, F] layout --
                # frame-sized tensors, latency- not bandwidth-bound)
                hr, hi = st["df"]
                full_r = jnp.concatenate([hr, jnp.real(enhanced)], axis=1)
                full_i = jnp.concatenate([hi, jnp.imag(enhanced)], axis=1)
                depth = full_r.shape[1]
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
        """Fresh streaming state (requires attention_window). T-minor: every
        conv/TFCM history is [B, K, C, ctx] and ASA caches are [B, F, C, w-1]."""
        cfg = self.config
        assert cfg.attention_window is not None, "set attention_window to stream"
        st: Dict[str, Any] = {}
        st["pe"] = (jnp.zeros((batch_size, cfg.num_bins, 2, 2), dtype),)
        k = cfg.n_bands
        ch_in = cfg.phase_channels
        band_sizes = [k]
        for s in cfg.band_strides:
            band_sizes.append((band_sizes[-1] + 2 - 3) // s + 1)
        for si, ch in enumerate(cfg.channels):
            st[f"enc_conv_{si}"] = jnp.zeros((batch_size, band_sizes[si], ch_in, 1), dtype)
            st[f"enc_tfcm_{si}"] = tuple(
                jnp.zeros((batch_size, band_sizes[si + 1], ch, 2 * 2**idx), dtype)
                for idx in range(cfg.tfcm_layers)
            )
            w = cfg.attention_window
            c_att = max(ch // 4, 1)
            st[f"enc_asa_{si}"] = (
                jnp.zeros((batch_size, band_sizes[si + 1], c_att, w - 1), dtype),
                jnp.zeros((batch_size, band_sizes[si + 1], ch, w - 1), dtype),
                jnp.zeros((batch_size,), jnp.int32),  # per-stream validity
            )
            ch_in = ch
        for si in reversed(range(len(cfg.channels))):
            ch_out = cfg.channels[si - 1] if si > 0 else cfg.phase_channels
            st[f"dec_conv_{si}"] = jnp.zeros(
                (batch_size, band_sizes[si + 1], cfg.channels[si], 1), dtype
            )
            st[f"dec_tfcm_{si}"] = tuple(
                jnp.zeros((batch_size, band_sizes[si], ch_out, 2 * 2**idx), dtype)
                for idx in range(cfg.tfcm_layers)
            )
        if cfg.use_deep_filter:
            st["df"] = (
                jnp.zeros((batch_size, 2 * cfg.df_taps_t, cfg.num_bins), dtype),
                jnp.zeros((batch_size, 2 * cfg.df_taps_t, cfg.num_bins), dtype),
            )
        return st
