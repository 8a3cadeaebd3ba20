"""Decompose ONE TFCM block's training cost on-chip: which primitive bills?

The whole-step measurements (scripts/profile_mtfaa.py) show the 6 TFCM
stacks at ~46% of the MTFAA train step while back-of-envelope VPU/HBM math
says they should be ~10x cheaper -- so per-op structure, not throughput, is
the suspect. This script times fwd+bwd of a stage-0-shaped block
([B=16, K=64, C=24, T=626], T-minor) and subtractive variants:

  full        the real math: 1x1 -> PReLU -> dw(3,3) d-dilated -> PReLU -> 1x1
  no_dw       both 1x1 einsums, depthwise conv removed
  dw_only     the 9-tap shifted-MAC depthwise conv alone
  t_taps      3 time taps only (slices along the LANE axis in T-minor)
  f_taps      3 freq taps only (slices along a major axis)
  dw_conv     depthwise conv via lax.conv_general_dilated (feature groups)

If t_taps >> f_taps the lane-axis shifts are the structural cost of the
T-minor layout; if no_dw dominates, the C=24 contraction einsums are
MXU-latency-bound and the dw conv is a bystander.

Timing rules as in profile_mtfaa.py: fresh inputs per rep, sequential
data dependence inside the on-device loop, float() round trip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_cache = os.environ.get("CRUSE_TPU_TEST_CACHE", "/root/.cache/cruse_tpu_jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B, K, C, T = 16, 64, 24, 626
DIL = 4
# ITERS must amortize the tunneled dispatch RTT (~10-20 ms/call): at 8
# iters a trivial variant reads ~4 ms/iter of pure RTT. 100 iters puts the
# floor at ~0.2 ms/iter.
ITERS = int(os.environ.get("TFCM_ITERS", "100"))
DTYPE = jnp.bfloat16


def _time3(loop, *args):
    float(loop(*args))
    times = []
    for rep in range(3):
        fresh = (args[0] * (1.0 + 1e-3 * (rep + 1)),) + args[1:]
        float(jnp.asarray(fresh[0]).ravel()[0])
        t0 = time.perf_counter()
        float(loop(*fresh))
        times.append(time.perf_counter() - t0)
    return min(times)


def dw_taps(x, wd, d, use_t=True, use_f=True):
    """The production 9-tap shifted-MAC depthwise conv (mtfaa.py TFCMBlock),
    optionally restricted to one axis's taps."""
    xe = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (2 * d, 0)))  # causal T ext
    xp = jnp.pad(xe, ((0, 0), (1, 1), (0, 0), (0, 0)))  # sym freq
    acc = None
    t_range = range(3) if use_t else (2,)
    f_range = range(3) if use_f else (1,)
    for it in t_range:
        for jf in f_range:
            sl = xp[:, jf : jf + K, :, it * d : it * d + T] * wd[it, jf][:, None]
            acc = sl if acc is None else acc + sl
    return acc


def block(x, params, mode):
    w1, b1, wd, w2, b2 = params
    if mode in ("full", "no_dw"):
        x = jnp.einsum("bkct,co->bkot", x, w1) + b1[:, None]
        x = jax.nn.leaky_relu(x, 0.25)
    if mode == "full":
        x = dw_taps(x, wd, DIL)
        x = jax.nn.leaky_relu(x, 0.25)
    if mode in ("full", "no_dw"):
        x = jnp.einsum("bkct,co->bkot", x, w2) + b2[:, None]
        return x
    if mode == "dw_only":
        return dw_taps(x, wd, DIL)
    if mode == "t_taps":
        return dw_taps(x, wd, DIL, use_f=False)
    if mode == "f_taps":
        return dw_taps(x, wd, DIL, use_t=False)
    if mode == "dw_conv":
        # depthwise conv: NCHW with (freq, time) spatial, C feature groups
        xe = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (2 * DIL, 0)))
        lhs = jnp.transpose(xe, (0, 2, 1, 3))  # [B, C, K+2, T+2d]
        rhs = jnp.transpose(wd, (2, 0, 1))[:, None]  # [C, 1, 3, 3]
        out = lax.conv_general_dilated(
            lhs, rhs, window_strides=(1, 1), padding="VALID",
            rhs_dilation=(1, DIL), feature_group_count=C,
        )
        return jnp.transpose(out, (0, 2, 1, 3))
    raise ValueError(mode)


def measure_dw_kernel(name="dw_kernel"):
    """Fused Pallas dw stencil (ops/dw_kernel.py) fwd+bwd vs the XLA 9-tap
    formulation (`dw_only` mode) at the same shape. name='dw_kernel_bf16'
    selects bf16 in-kernel accumulation (tests whether the VPU packs bf16
    FMAs at 2x fp32 rate)."""
    from cruse_tpu.ops import dw_kernel as dwk
    dw_causal_tm = dwk.dw_causal_tm
    if name.endswith("bf16"):
        dwk.ACC_DTYPE = jnp.bfloat16

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K, C, T + 2 * DIL)), DTYPE) * 0.1
    wd = jnp.asarray(rng.standard_normal((3, 3, C)), DTYPE) * 0.1

    def fwd_bwd(x, wd):
        def loss(x):
            return jnp.sum(dw_causal_tm(x, wd, DIL).astype(jnp.float32) ** 2)

        return jax.value_and_grad(loss)(x)

    @jax.jit
    def loop(x, wd):
        def body(i, carry):
            acc, xx = carry
            v, g = fwd_bwd(xx, wd)
            return acc + v, xx + 1e-6 * g.astype(DTYPE)

        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), x))
        return acc

    dt = _time3(loop, x, wd) / ITERS
    print(f"{name:14s} {dt * 1e3:8.3f} ms/iter (fwd+bwd)", flush=True)
    return dt


def anat_block(x, params, bn: str, prelu: str, hist: bool):
    """Production TFCMBlock math in plain form with toggles, to bisect the
    flax-vs-mock gap: bn in {train, eval, none}, prelu in {param, leaky},
    hist=True also emits the streaming history slice as an output."""
    w1, b1, wd, w2, b2, g1, be1, g2, be2, al1, al2, mu, var = params
    inp = x

    def norm(x, train_stats):
        if bn == "none":
            return x, None
        if bn == "train" and train_stats:
            xf = x.astype(jnp.float32)
            m = jnp.mean(xf, axis=(0, 1, 3))
            v = jnp.mean(jnp.square(xf), axis=(0, 1, 3)) - jnp.square(m)
        else:
            m, v = mu, var
        inv = (jax.lax.rsqrt(v + 1e-5) * g1.astype(jnp.float32)).astype(x.dtype)
        return (x - m.astype(x.dtype)[:, None]) * inv[:, None] + be1[:, None], (m, v)

    def act(x, a):
        if prelu == "param":
            return jnp.where(x >= 0, x, a.astype(x.dtype) * x)
        return jax.nn.leaky_relu(x, 0.25)

    x = jnp.einsum("bkct,co->bkot", x, w1) + b1[:, None]
    x, _ = norm(x, True)
    x = act(x, al1)
    d = DIL
    if hist:
        x_ext = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (2 * d, 0)))
        new_hist = x_ext[..., x_ext.shape[-1] - 2 * d:]
    else:
        x_ext = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (2 * d, 0)))
        new_hist = None
    xp = jnp.pad(x_ext, ((0, 0), (1, 1), (0, 0), (0, 0)))
    acc = None
    for it in range(3):
        for jf in range(3):
            sl = xp[:, jf : jf + K, :, it * d : it * d + T] * wd[it, jf][:, None]
            acc = sl if acc is None else acc + sl
    x = acc + b2[:, None] * 0  # dw bias folded below
    x, _ = norm(x, True)
    x = act(x, al2)
    x = jnp.einsum("bkct,co->bkot", x, w2) + b2[:, None]
    return x + inp, new_hist


def measure_anat(bn: str, prelu: str, hist: bool, wrt_params: bool):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K, C, T)), DTYPE) * 0.1
    shapes = ((C, C), (C,), (3, 3, C), (C, C), (C,),
              (C,), (C,), (C,), (C,), (), ())
    params = tuple(jnp.asarray(rng.standard_normal(s), DTYPE) * 0.1 for s in shapes)
    params = params + (jnp.zeros((C,), jnp.float32), jnp.ones((C,), jnp.float32))

    def fwd_bwd(x, params):
        def loss(x, p):
            y, _ = anat_block(x, p, bn, prelu, hist)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        if wrt_params:
            v, (gx, gp) = jax.value_and_grad(loss, argnums=(0, 1))(x, params)
            g = gx + 1e-3 * jnp.sum(gp[0]).astype(DTYPE)
        else:
            v, g = jax.value_and_grad(loss)(x, params)
        return v, g

    @jax.jit
    def loop(x, params):
        def body(i, carry):
            acc, xx = carry
            v, g = fwd_bwd(xx, params)
            return acc + v, xx + 1e-6 * g.astype(DTYPE)

        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), x))
        return acc

    dt = _time3(loop, x, params) / ITERS
    name = f"anat:{bn},{prelu}{',hist' if hist else ''}{',pgrads' if wrt_params else ''}"
    print(f"{name:34s} {dt * 1e3:8.3f} ms/iter (fwd+bwd)", flush=True)
    return dt


def measure_flax(train: bool):
    """The production TFCMBlock (flax, BatchNormC included) fwd+bwd."""
    from cruse_tpu.models.mtfaa import TFCMBlock

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K, C, T)), DTYPE) * 0.1
    blk = TFCMBlock(C, DIL)
    variables = blk.init(jax.random.PRNGKey(0), x, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    def fwd_bwd(x, params):
        def loss(x, p):
            if train:
                (y, _), _ = blk.apply(
                    {"params": p, "batch_stats": stats}, x, train=True,
                    mutable=["batch_stats"])
            else:
                y, _ = blk.apply({"params": p, "batch_stats": stats}, x, train=False)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        v, g = jax.value_and_grad(loss)(x, params)
        return v, g

    @jax.jit
    def loop(x, params):
        def body(i, carry):
            acc, xx = carry
            v, g = fwd_bwd(xx, params)
            return acc + v, xx + 1e-6 * g.astype(DTYPE)

        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), x))
        return acc

    dt = _time3(loop, x, params) / ITERS
    name = f"flax_{'train' if train else 'eval'}"
    print(f"{name:10s} {dt * 1e3:8.3f} ms/iter (fwd+bwd)", flush=True)
    return dt


def measure(mode):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K, C, T)), DTYPE) * 0.1
    params = tuple(
        jnp.asarray(rng.standard_normal(s), DTYPE) * 0.1
        for s in ((C, C), (C,), (3, 3, C), (C, C), (C,))
    )

    def fwd_bwd(x, params):
        def loss(x):
            return jnp.sum(block(x, params, mode).astype(jnp.float32) ** 2)

        v, g = jax.value_and_grad(loss)(x)
        return v, g

    @jax.jit
    def loop(x, params):
        def body(i, carry):
            acc, xx = carry
            v, g = fwd_bwd(xx, params)
            return acc + v, xx + 1e-6 * g.astype(DTYPE)

        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), x))
        return acc

    dt = _time3(loop, x, params) / ITERS
    print(f"{mode:10s} {dt * 1e3:8.3f} ms/iter (fwd+bwd)", flush=True)
    return dt


if __name__ == "__main__":
    modes = sys.argv[1:] or ["full", "no_dw", "dw_only", "t_taps", "f_taps", "dw_conv",
                             "flax_train", "flax_eval"]
    for m in modes:
        if m == "flax_train":
            measure_flax(True)
        elif m == "flax_eval":
            measure_flax(False)
        elif m.startswith("dw_kernel"):
            measure_dw_kernel(m)
        elif m.startswith("anat:"):
            # anat:bn,prelu[,hist][,pgrads] e.g. anat:train,param,hist,pgrads
            parts = m.split(":", 1)[1].split(",")
            measure_anat(parts[0], parts[1], "hist" in parts[2:],
                         "pgrads" in parts[2:])
        else:
            measure(m)
