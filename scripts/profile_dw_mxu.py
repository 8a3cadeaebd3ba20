"""Round-4 experiment: recast the TFCM 9-tap depthwise stencil as an
MXU matmul (VERDICT r3 item 1).

The round-3 floor analysis (scripts/profile_tfcm_block.py) showed the
depthwise (3,3) dilated stencil is VPU-compute-bound at ~1.3 ms fwd+bwd per
stage-0 block while the MXU idles at 1.5% utilization. The one unmeasured
structural lever: express the stencil as a tap-unfolded block-diagonal
contraction so the FMA work lands on the MXU --

    U[b, k, (tap, ci), t] = x_shifted_by_tap[b, k, ci, t]   (9 shifted views)
    W[(tap, ci), co]      = wd[tap, ci] * I[ci, co]         (block-diagonal)
    y = einsum('bkst,so->bkot', U, W)

This does 9*C MACs/element on the MXU instead of 9 on the VPU (C=24: 24x
the FLOPs, but the MXU has ~100x the FMA rate and is idle). Variants:

  dw_vpu        production 9-tap shifted-MAC formulation (baseline)
  dw_mxu_xla    unfold via stack+reshape in XLA, one einsum
  dw_mxu_seq    9 separate [.., C] x [C, C] diag-scaled einsums summed --
                tests whether XLA fuses better without the big unfold
  dw_mxu_fold   unfold WITHOUT materializing 9x activations: accumulate
                3 freq-shift einsums per time tap where the weight carries
                the tap scale (3 matmuls of contraction 3C)

All parity-checked against dw_vpu before timing. Timing protocol matches
profile_tfcm_block.py: on-device fori_loop with sequential data dependence,
ITERS=100 amortizes the tunneled dispatch RTT, min of 3 reps.
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
ITERS = int(os.environ.get("TFCM_ITERS", "100"))
DTYPE = jnp.bfloat16


def _pad(x, d):
    xe = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (2 * d, 0)))  # causal T
    return jnp.pad(xe, ((0, 0), (1, 1), (0, 0), (0, 0)))  # sym freq


def dw_vpu(x, wd, d):
    xp = _pad(x, d)
    acc = None
    for it in range(3):
        for jf in range(3):
            sl = xp[:, jf : jf + K, :, it * d : it * d + T] * wd[it, jf][:, None]
            acc = sl if acc is None else acc + sl
    return acc


def dw_mxu_xla(x, wd, d):
    xp = _pad(x, d)
    views = [
        xp[:, jf : jf + K, :, it * d : it * d + T]
        for it in range(3)
        for jf in range(3)
    ]
    u = jnp.stack(views, axis=2)  # [B, K, 9, C, T]
    u = u.reshape(B, K, 9 * C, T)
    eye = jnp.eye(C, dtype=wd.dtype)
    w = jnp.einsum("sc,co->sco", wd.reshape(9, C), eye).reshape(9 * C, C)
    return jnp.einsum("bkst,so->bkot", u, w)


def dw_mxu_seq(x, wd, d):
    xp = _pad(x, d)
    eye = jnp.eye(C, dtype=wd.dtype)
    acc = None
    for it in range(3):
        for jf in range(3):
            sl = xp[:, jf : jf + K, :, it * d : it * d + T]
            w = eye * wd[it, jf][:, None]  # [C, C] diagonal
            term = jnp.einsum("bkct,co->bkot", sl, w)
            acc = term if acc is None else acc + term
    return acc


def dw_mxu_fold(x, wd, d):
    # one contraction per time tap over (freq-shift, channel): the three
    # freq views are adjacent K rows, gathered as [B, K, 3C, T] per tap
    xp = _pad(x, d)
    eye = jnp.eye(C, dtype=wd.dtype)
    acc = None
    for it in range(3):
        sl = xp[:, :, :, it * d : it * d + T]  # [B, K+2, C, T]
        u = jnp.stack([sl[:, jf : jf + K] for jf in range(3)], axis=2)
        u = u.reshape(B, K, 3 * C, T)
        w = jnp.einsum("fc,co->fco", wd[it], eye).reshape(3 * C, C)
        term = jnp.einsum("bkst,so->bkot", u, w)
        acc = term if acc is None else acc + term
    return acc


VARIANTS = {
    "dw_vpu": dw_vpu,
    "dw_mxu_xla": dw_mxu_xla,
    "dw_mxu_seq": dw_mxu_seq,
    "dw_mxu_fold": dw_mxu_fold,
}


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


def check_parity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K, C, T)), jnp.float32) * 0.1
    wd = jnp.asarray(rng.standard_normal((3, 3, C)), jnp.float32) * 0.1
    ref = np.asarray(jax.jit(lambda a, b: dw_vpu(a, b, DIL))(x, wd))
    for name, fn in VARIANTS.items():
        if name == "dw_vpu":
            continue
        # parity at HIGHEST matmul precision: the check validates the
        # FORMULATION; the production path runs bf16 either way
        with jax.default_matmul_precision("highest"):
            got = np.asarray(jax.jit(lambda a, b, f=fn: f(a, b, DIL))(x, wd))
        err = np.abs(got - ref).max()
        status = "OK" if err < 1e-4 else "FAIL"
        print(f"parity {name:14s} max|err|={err:.2e} {status}", flush=True)
        assert err < 1e-4, name


def measure(name, fn, grad=True):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K, C, T)), DTYPE) * 0.1
    wd = jnp.asarray(rng.standard_normal((3, 3, C)), DTYPE) * 0.1

    if grad:
        def fwd_bwd(x, wd):
            def loss(x):
                return jnp.sum(fn(x, wd, DIL).astype(jnp.float32) ** 2)

            return jax.value_and_grad(loss)(x)
    else:
        def fwd_bwd(x, wd):
            y = fn(x, wd, DIL)
            return jnp.sum(y.astype(jnp.float32) ** 2), y[..., :1] * 0

    @jax.jit
    def loop(x, wd):
        def body(i, carry):
            acc, xx = carry
            v, g = fwd_bwd(xx, wd)
            return acc + v, xx + 1e-6 * g[..., : xx.shape[-1]].astype(DTYPE)

        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), x))
        return acc

    dt = _time3(loop, x, wd) / ITERS
    tag = "fwd+bwd" if grad else "fwd"
    print(f"{name:14s} {dt * 1e3:8.3f} ms/iter ({tag})", flush=True)
    return dt


if __name__ == "__main__":
    which = sys.argv[1:] or ["parity"] + list(VARIANTS)
    for w in which:
        if w == "parity":
            check_parity()
        elif w.endswith(":fwd"):
            n = w[:-4]
            measure(n + " (fwd)", VARIANTS[n], grad=False)
        else:
            measure(w, VARIANTS[w])
