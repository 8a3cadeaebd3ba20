"""RBJ-cookbook biquad EQ bank + IIR filtering, fully on-device.

TPU design notes
----------------
The reference applies random EQ chains on the host per utterance
(train_base/acoustics/audioAug.py:13-165, scipy/torchaudio). Here the
coefficient math is traced JAX (so `jax.random` keys drive per-example
random augmentation inside the jitted data pipeline) and the recursive
filter runs as a `lax.scan` over time in transposed direct-form II with the
batch dimension vectorized -- the scan carries only [B, 2] state per section,
so the VPU does B-wide work per step.

Filter kinds and parameter ranges mirror audioAug.py's registry
(REGISTERED_SecFilter / REGISTERED_SecFilter_freq, audioAug.py:132-147).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

FILTER_KINDS = ("high_shelf", "high_pass", "low_shelf", "low_pass", "peaking_eq", "notch")

# log-uniform center-frequency ranges per kind (audioAug.py:140-147)
FILTER_FREQ_RANGES = {
    "high_shelf": (1000.0, 4000.0),
    "high_pass": (40.0, 400.0),
    "low_shelf": (40.0, 1000.0),
    "low_pass": (3000.0, 8000.0),
    "peaking_eq": (40.0, 4000.0),
    "notch": (40.0, 4000.0),
}


def _shelf(center_freq, gain_db, q, sr, high: bool):
    w0 = 2.0 * jnp.pi * center_freq / sr
    amp = 10.0 ** (gain_db / 40.0)
    alpha = jnp.sin(w0) / 2.0 / q
    cosw = jnp.cos(w0)
    sq = 2.0 * jnp.sqrt(amp) * alpha
    sgn = 1.0 if high else -1.0
    b0 = amp * ((amp + 1) + sgn * (amp - 1) * cosw + sq)
    b1 = -2.0 * sgn * amp * ((amp - 1) + sgn * (amp + 1) * cosw)
    b2 = amp * ((amp + 1) + sgn * (amp - 1) * cosw - sq)
    a0 = (amp + 1) - sgn * (amp - 1) * cosw + sq
    a1 = -2.0 * sgn * ((amp - 1) - sgn * (amp + 1) * cosw)
    a2 = (amp + 1) - sgn * (amp - 1) * cosw - sq
    return jnp.stack([b0, b1, b2]), jnp.stack([a0, a1, a2])


def _pass(center_freq, gain_db, q, sr, high: bool):
    w0 = 2.0 * jnp.pi * center_freq / sr
    alpha = jnp.sin(w0) / 2.0 / q
    cosw = jnp.cos(w0)
    if high:
        b0 = (1 + cosw) / 2.0
        b1 = -(1 + cosw)
    else:
        b0 = (1 - cosw) / 2.0
        b1 = 1 - cosw
    b2 = b0
    a0 = 1 + alpha
    a1 = -2 * cosw
    a2 = 1 - alpha
    return jnp.stack([b0, b1, b2]), jnp.stack([a0, a1, a2])


def _peaking(center_freq, gain_db, q, sr):
    w0 = 2.0 * jnp.pi * center_freq / sr
    amp = 10.0 ** (gain_db / 40.0)
    alpha = jnp.sin(w0) / 2.0 / q
    cosw = jnp.cos(w0)
    b = jnp.stack([1 + alpha * amp, -2 * cosw, 1 - alpha * amp])
    a = jnp.stack([1 + alpha / amp, -2 * cosw, 1 - alpha / amp])
    return b, a


def _notch(center_freq, gain_db, q, sr):
    w0 = 2.0 * jnp.pi * center_freq / sr
    alpha = jnp.sin(w0) / 2.0 / q
    cosw = jnp.cos(w0)
    one = jnp.ones_like(w0)
    b = jnp.stack([one, -2 * cosw, one])
    a = jnp.stack([1 + alpha, -2 * cosw, 1 - alpha])
    return b, a


def biquad_coeffs(kind: str, center_freq, gain_db, q, sr):
    """Return (b[3], a[3]) normalized so a0 == 1 (traced, differentiable)."""
    center_freq = jnp.asarray(center_freq, jnp.float32)
    gain_db = jnp.asarray(gain_db, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    if kind == "high_shelf":
        b, a = _shelf(center_freq, gain_db, q, sr, high=True)
    elif kind == "low_shelf":
        b, a = _shelf(center_freq, gain_db, q, sr, high=False)
    elif kind == "high_pass":
        b, a = _pass(center_freq, gain_db, q, sr, high=True)
    elif kind == "low_pass":
        b, a = _pass(center_freq, gain_db, q, sr, high=False)
    elif kind == "peaking_eq":
        b, a = _peaking(center_freq, gain_db, q, sr)
    elif kind == "notch":
        b, a = _notch(center_freq, gain_db, q, sr)
    else:
        raise ValueError(f"unknown biquad kind {kind!r}")
    return b / a[0], a / a[0]


def all_biquad_coeffs(center_freq, gain_db, q, sr):
    """Coefficients for *all* kinds stacked [K, 3] -- enables traced selection
    of a random filter type without python-level control flow."""
    bs, as_ = [], []
    for kind in FILTER_KINDS:
        b, a = biquad_coeffs(kind, center_freq, gain_db, q, sr)
        bs.append(b)
        as_.append(a)
    return jnp.stack(bs), jnp.stack(as_)


def lfilter(x: jax.Array, b: jax.Array, a: jax.Array, method: str = "assoc") -> jax.Array:
    """IIR filter along the last axis, transposed direct-form II.

    x: [..., L]; b, a: [3] or [..., 3] broadcastable against x's batch dims.

    method="assoc" (default): the DF2T state recurrence
        z_t = M z_{t-1} + v x_t,   y_t = b0 x_t + z1_{t-1}
    with M = [[-a1, 1], [-a2, 0]], v = [b1 - a1 b0, b2 - a2 b0] is a linear
    recurrence, evaluated with `lax.associative_scan` over (M, v x_t) affine
    pairs -- log-depth instead of L sequential steps, which matters enormously
    on TPU where a 48k-sample sequential scan is latency-bound.
    method="scan": the sequential reference implementation.
    """
    b = jnp.broadcast_to(b, x.shape[:-1] + (3,)).astype(x.dtype)
    a = jnp.broadcast_to(a, x.shape[:-1] + (3,)).astype(x.dtype)
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    a1, a2 = a[..., 1], a[..., 2]

    if method == "scan":
        def step(carry, xt):
            z1, z2 = carry
            yt = b0 * xt + z1
            z1_new = b1 * xt - a1 * yt + z2
            z2_new = b2 * xt - a2 * yt
            return (z1_new, z2_new), yt

        zeros = jnp.zeros(x.shape[:-1], x.dtype)
        _, y = lax.scan(step, (zeros, zeros), jnp.moveaxis(x, -1, 0))
        return jnp.moveaxis(y, 0, -1)

    # ---- associative form ----
    length = x.shape[-1]
    # per-step affine map (A, u): z_t = A z_{t-1} + u_t
    m11 = jnp.broadcast_to((-a1)[..., None], x.shape)
    m12 = jnp.broadcast_to(jnp.ones_like(a1)[..., None], x.shape)
    m21 = jnp.broadcast_to((-a2)[..., None], x.shape)
    m22 = jnp.zeros_like(x)
    u1 = (b1 - a1 * b0)[..., None] * x
    u2 = (b2 - a2 * b0)[..., None] * x

    def combine(lhs, rhs):
        # rhs after lhs: A = A_r A_l, u = A_r u_l + u_r
        l11, l12, l21, l22, lu1, lu2 = lhs
        r11, r12, r21, r22, ru1, ru2 = rhs
        return (
            r11 * l11 + r12 * l21,
            r11 * l12 + r12 * l22,
            r21 * l11 + r22 * l21,
            r21 * l12 + r22 * l22,
            r11 * lu1 + r12 * lu2 + ru1,
            r21 * lu1 + r22 * lu2 + ru2,
        )

    _, _, _, _, z1, z2 = lax.associative_scan(
        combine, (m11, m12, m21, m22, u1, u2), axis=-1
    )
    # y_t needs z1_{t-1}: shift right with zero init
    z1_prev = jnp.pad(z1, [(0, 0)] * (x.ndim - 1) + [(1, 0)])[..., :length]
    return b0[..., None] * x + z1_prev


def sos_chain(x: jax.Array, b_stack: jax.Array, a_stack: jax.Array) -> jax.Array:
    """Apply S cascaded biquad sections in ONE scan over time.

    b_stack, a_stack: [S, ..., 3]. State [S, ..., 2]; each timestep applies the
    sections sequentially (unrolled, S is small/static).
    """
    num_sections = b_stack.shape[0]
    target = (num_sections,) + x.shape[:-1] + (3,)
    # insert singleton batch axes between the section and coeff dims
    while b_stack.ndim < len(target):
        b_stack = b_stack[:, None]
        a_stack = a_stack[:, None]
    b_stack = jnp.broadcast_to(b_stack, target).astype(x.dtype)
    a_stack = jnp.broadcast_to(a_stack, target).astype(x.dtype)
    # cascade of log-depth associative filters (each section is exact DF2T)
    y = x
    for s in range(num_sections):
        y = lfilter(y, b_stack[s], a_stack[s])
    return y


def random_eq_chain(key: jax.Array, x: jax.Array, num_filters: int = 3, sr: float = 16000.0) -> jax.Array:
    """Device-side equivalent of the reference `compositeSecFilt`
    (audioAug.py:149-165): a chain of `num_filters` randomly-chosen biquads
    with log-uniform center freq (per-kind range), gain ~ U(-15, 15) dB,
    Q ~ U(0.5, 1.5). Fully traced: usable inside the jitted mixing pipeline.

    x: [L] or [B, L] (the same chain is applied to the whole array; fold
    per-example randomness by vmapping over keys).
    """
    lo = jnp.log(jnp.asarray([FILTER_FREQ_RANGES[k][0] for k in FILTER_KINDS]))
    hi = jnp.log(jnp.asarray([FILTER_FREQ_RANGES[k][1] for k in FILTER_KINDS]))
    keys = jax.random.split(key, num_filters)
    b_secs, a_secs = [], []
    for i in range(num_filters):
        k_kind, k_freq, k_gain, k_q = jax.random.split(keys[i], 4)
        kind_idx = jax.random.randint(k_kind, (), 0, len(FILTER_KINDS))
        u = jax.random.uniform(k_freq, ())
        freq_per_kind = jnp.exp(lo + u * (hi - lo))  # [K] log-uniform per kind
        gain_db = jax.random.uniform(k_gain, (), minval=-15.0, maxval=15.0)
        q = jax.random.uniform(k_q, (), minval=0.5, maxval=1.5)
        b_kinds, a_kinds = [], []
        for ki, kind in enumerate(FILTER_KINDS):
            b, a = biquad_coeffs(kind, freq_per_kind[ki], gain_db, q, sr)
            b_kinds.append(b)
            a_kinds.append(a)
        b_secs.append(jnp.stack(b_kinds)[kind_idx])
        a_secs.append(jnp.stack(a_kinds)[kind_idx])
    return sos_chain(x, jnp.stack(b_secs), jnp.stack(a_secs))


def random_coef_filter(key: jax.Array, x: jax.Array, coef_range: float = 3.0 / 8.0) -> jax.Array:
    """Random-coefficient 2nd-order filter (testRandSecFilter.py:129-137
    `randFilt`): b, a ~ U(-r, r) with b0 = a0 = 1 -- a cheap spectral-tilt
    augmentation."""
    kb, ka = jax.random.split(key)
    b = jnp.concatenate([jnp.ones(1), jax.random.uniform(kb, (2,), minval=-coef_range, maxval=coef_range)])
    a = jnp.concatenate([jnp.ones(1), jax.random.uniform(ka, (2,), minval=-coef_range, maxval=coef_range)])
    return lfilter(x, b, a)


def hp_filter(x: jax.Array, key: jax.Array | None = None, sr: float = 16000.0, center_freq: float = 150.0) -> jax.Array:
    """Fixed-frequency highpass with random Q (audioAug.py:168-178)."""
    q = 1.0 if key is None else jax.random.uniform(key, (), minval=0.5, maxval=1.5)
    b, a = biquad_coeffs("high_pass", center_freq, 0.0, q, sr)
    return lfilter(x, b, a)


# ---- air absorption (audioAug.py:180-216, repaired: interpolates the
#      attenuation table before use; analysis/synthesis hops match) ----

_AIR_CENTER_FREQS = (125.0, 250.0, 500.0, 1000.0, 2000.0, 4000.0, 8000.0, 16000.0, 24000.0)
_AIR_ABSORPTION = (0.1e-3, 0.2e-3, 0.5e-3, 1.1e-3, 2.7e-3, 9.4e-3, 29.0e-3, 91.5e-3, 289.0e-3)


def air_absorption_gains(key: jax.Array, n_freqs: int, sr: float = 16000.0,
                         distance_range=(1.0, 20.0)) -> jax.Array:
    """Per-bin linear gains for a random source distance (traced)."""
    d = jax.random.uniform(key, (), minval=distance_range[0], maxval=distance_range[1])
    table = jnp.asarray(_AIR_ABSORPTION)
    att_db = 20.0 * jnp.log10(jnp.exp(-d * table))
    centers = jnp.asarray((0.0,) + _AIR_CENTER_FREQS + (sr / 2.0,))
    att_db = jnp.concatenate([att_db[:1], att_db, att_db[-1:]])
    freqs = jnp.linspace(0.0, sr / 2.0, n_freqs)
    att_interp_db = jnp.interp(freqs, centers, att_db)
    return 10.0 ** (att_interp_db / 20.0)


def air_absorption(key: jax.Array, y: jax.Array, sr: float = 16000.0,
                   n_fft: int = 320, hop: int = 160) -> jax.Array:
    """Apply distance-dependent air absorption as a spectral mask."""
    from cruse_tpu.dsp.stft import StftConfig, stft, istft

    cfg = StftConfig(n_fft=n_fft, hop_length=hop, win_length=n_fft)
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    spec = stft(y, cfg)  # [B, T, F]
    gains = air_absorption_gains(key, cfg.num_bins, sr)
    masked = spec * gains[None, None, :]
    out = istft(masked, cfg, length=y.shape[-1])
    return out[0] if squeeze else out
