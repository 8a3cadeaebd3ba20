"""Bisect the TFCM hand-scheduled backward (ops/tfcm_train.py) into its
param-grad groups, timed on-chip at every production stack shape.

The chain harness (profile_tfcm_chain.py, fused_fold) measures fwd 3.4 ms,
fwd+bwd 27.2 ms, x-grads-only 8.3 ms -> ~19 ms of param-grad passes in
ISOLATION (in-graph the TFCM share is 42.6 ms/step, trace_lines). This
script answers: which reductions? Variants (each a doctored copy of
_vjp_bwd_xla with one group replaced by zeros so XLA DCEs its passes):

  full        the production backward
  no_dwd      9-tap stencil weight grads zeroed
  no_dw       dW1/dW2 1x1 kernel grads zeroed
  no_chan     per-channel BN/PReLU/bias reductions zeroed
  x_only      all param grads zeroed (lower bound)

Usage: python scripts/profile_bwd_pieces.py [variant ...]
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

from cruse_tpu.ops import tfcm_train as tt

B, T = 16, 626
ITERS = int(os.environ.get("TFCM_ITERS", "20"))
DTYPE = jnp.bfloat16
STAGES = [(64, 24), (32, 32), (16, 48), (32, 32), (64, 24), (128, 4)]
DILS = [1, 2, 4, 8]


def make_params(c, rng):
    def r(*shape):
        return jnp.asarray(rng.standard_normal(shape), DTYPE) * 0.2
    w1, b1 = r(c, c), r(c)
    g1, be1 = jnp.ones((c,), DTYPE), jnp.zeros((c,), DTYPE)
    a1 = jnp.full((1,), 0.25, DTYPE)
    wd, bd = r(3, 3, c), r(c)
    g2, be2 = jnp.ones((c,), DTYPE), jnp.zeros((c,), DTYPE)
    a2 = jnp.full((1,), 0.25, DTYPE)
    w2, b2 = r(c, c), r(c)
    return (w1, b1, g1, be1, a1, wd, bd, g2, be2, a2, w2, b2)


ZERO_GROUPS = {
    "full": (),
    "no_dwd": ("dwd",),
    "no_dw": ("dw1", "dw2"),
    "no_chan": ("chan",),
    "x_only": ("dwd", "dw1", "dw2", "chan"),
}


def _prelu_neg(h, dh, a):
    return jnp.where(h < 0, dh * h, jnp.zeros_like(h))


def bwd_dotred(d, eps, res, cots):
    """All per-channel/scalar reductions AND the 9 dwd tap correlations as
    ones-contraction MXU dots over channel-concatenated integrands (the
    no_dw bisect shows dW-style dots are ~free; VPU reduce passes are not)."""
    x, h1, h2, m1, v1, m2, v2, params = res
    w1, b1, g1, be1, a1, wd, bd, g2, be2, a2, w2, b2 = params
    g, g_hist = cots[0], cots[1]
    dt = x.dtype
    b, k_len, c, t_len = x.shape
    n = b * k_len * t_len
    f32 = jnp.float32
    ones1 = jnp.ones((b, k_len, 1, t_len), dt)

    # ---- phase A ----
    inv2r = jax.lax.rsqrt(v2 + eps)
    xh2 = ((h2.astype(f32) - m2[:, None]) * inv2r[:, None]).astype(dt)
    h2n = xh2 * g2.astype(dt)[:, None] + be2.astype(dt)[:, None]
    h2a = tt._prelu(h2n, a2)
    dh2a = jnp.einsum("bkot,co->bkct", g, w2)
    neg2 = h2n < 0
    dh2n = jnp.where(neg2, a2.astype(dt) * dh2a, dh2a)
    catA = jnp.concatenate(
        [dh2n * xh2, dh2n, jnp.where(neg2, dh2a * h2n, jnp.zeros_like(h2n)), g],
        axis=2)
    redA = jnp.einsum("bkct,bkot->co", catA, ones1,
                      preferred_element_type=f32)[:, 0]
    dg2, dbe2, da2v, db2 = redA[:c], redA[c:2*c], redA[2*c:3*c], redA[3*c:]
    da2 = jnp.sum(da2v).reshape(a2.shape)
    dw2 = jnp.einsum("bkct,bkot->co", h2a, g, preferred_element_type=f32)

    # ---- phase B ----
    s2 = (inv2r * g2.astype(f32)).astype(dt)
    dh2 = s2[:, None] * (
        dh2n - (dbe2 / n).astype(dt)[:, None] - xh2 * (dg2 / n).astype(dt)[:, None])
    gp = jnp.pad(dh2, ((0, 0), (1, 1), (0, 0), (2 * d, 2 * d)))
    t_ext = t_len + 2 * d
    wf = wd[::-1, ::-1]
    acc = None
    for it in range(3):
        for jf in range(3):
            sl = gp[:, jf : jf + k_len, :, it * d : it * d + t_ext] * wf[it, jf][:, None]
            acc = sl if acc is None else acc + sl
    dxe = acc
    if g_hist is not None:
        dxe = dxe.at[..., t_len:].add(g_hist.astype(dxe.dtype))
    inv1r = jax.lax.rsqrt(v1 + eps)
    xh1 = h1  # fold=True: saved residual IS the normalized activation
    h1n = xh1 * g1.astype(dt)[:, None] + be1.astype(dt)[:, None]
    h1a = tt._prelu(h1n, a1)
    xe = jnp.pad(h1a, ((0, 0), (0, 0), (0, 0), (2 * d, 0)))
    xp = jnp.pad(xe, ((0, 0), (1, 1), (0, 0), (0, 0)))
    dh1a = dxe[..., 2 * d :]
    neg1 = h1n < 0
    dh1n = jnp.where(neg1, a1.astype(dt) * dh1a, dh1a)
    taps = [xp[:, jf : jf + k_len, :, it * d : it * d + t_len]
            for it in range(3) for jf in range(3)]
    catB = jnp.concatenate(
        taps + [dh1n * xh1, dh1n,
                jnp.where(neg1, dh1a * h1n, jnp.zeros_like(h1n)), dh2], axis=2)
    # taps correlate against dh2 (block diagonals); the rest against ones --
    # ONE dot contracts every integrand in a single operand pass
    rhsB = jnp.concatenate([dh2, ones1], axis=2)
    redB = jnp.einsum("bkct,bkot->co", catB, rhsB, preferred_element_type=f32)
    dwd = jnp.stack([jnp.diagonal(redB[i * c:(i + 1) * c, :c])
                     for i in range(9)]).reshape(3, 3, c)
    dg1 = redB[9 * c:10 * c, c]
    dbe1 = redB[10 * c:11 * c, c]
    da1 = jnp.sum(redB[11 * c:12 * c, c]).reshape(a1.shape)
    dbd = redB[12 * c:13 * c, c]

    # ---- phase C ----
    s1 = (inv1r * g1.astype(f32)).astype(dt)
    dh1 = s1[:, None] * (
        dh1n - (dbe1 / n).astype(dt)[:, None] - xh1 * (dg1 / n).astype(dt)[:, None])
    xa = jnp.concatenate([x, ones1], axis=2)
    dw1b = jnp.einsum("bkct,bkot->co", xa, dh1, preferred_element_type=f32)
    dw1, db1 = dw1b[:c], dw1b[c]
    dx = jnp.einsum("bkot,co->bkct", dh1, w1) + g

    dparams = (
        dw1.astype(w1.dtype), db1.astype(b1.dtype),
        dg1.astype(g1.dtype), dbe1.astype(be1.dtype), da1.astype(a1.dtype),
        dwd.astype(wd.dtype), dbd.astype(bd.dtype),
        dg2.astype(g2.dtype), dbe2.astype(be2.dtype), da2.astype(a2.dtype),
        dw2.astype(w2.dtype), db2.astype(b2.dtype),
    )
    return dx, dparams


def bwd_variant(zeros):
    """_vjp_bwd_xla with selected grad groups replaced by zeros.

    Implemented by zeroing the returned leaves: XLA dead-code-eliminates
    the passes that fed them (verified: x_only matches the chain_xgrad
    timing)."""
    def bwd(d, eps, res, cots):
        dx, dp = tt._vjp_bwd_xla(d, eps, res, cots, fold=True)
        (dw1, db1, dg1, dbe1, da1, dwd, dbd, dg2, dbe2, da2, dw2, db2) = dp
        z = jnp.zeros_like
        if "dwd" in zeros:
            dwd = z(dwd)
        if "dw1" in zeros:
            dw1 = z(dw1)
        if "dw2" in zeros:
            dw2 = z(dw2)
        if "chan" in zeros:
            db1, dg1, dbe1, da1 = z(db1), z(dg1), z(dbe1), z(da1)
            dbd, dg2, dbe2, da2, db2 = z(dbd), z(dg2), z(dbe2), z(da2), z(db2)
        return dx, (dw1, db1, dg1, dbe1, da1, dwd, dbd, dg2, dbe2, da2, dw2, db2)
    return bwd


def check_variant(fn):
    """Numeric parity of a variant backward vs the production _vjp_bwd_xla."""
    rng = np.random.default_rng(1)
    k, c, d, t = 8, 6, 2, 40
    x = jnp.asarray(rng.standard_normal((2, k, c, t)), jnp.float32) * 0.3
    params = tuple(a.astype(jnp.float32) for a in make_params(c, rng))
    out, res = tt._fwd(x, params, d, 1e-5, fold=True)
    cots = tuple(jnp.asarray(rng.standard_normal(o.shape), jnp.float32) for o in out)
    dx_a, dp_a = tt._vjp_bwd_xla(d, 1e-5, res, cots, fold=True)
    dx_b, dp_b = fn(d, 1e-5, res, cots)
    # normalize by max(1, scale): tiny sums (db*, dbd) are cancellation-
    # dominated and differ by reduction order between VPU and MXU routes
    err = max(float(jnp.max(jnp.abs(a - b)) / jnp.maximum(1.0, jnp.max(jnp.abs(a))))
              for a, b in zip((dx_a,) + dp_a, (dx_b,) + dp_b))
    print(f"dotred parity: max scaled err {err:.2e}")
    assert err < 1e-3, err


def _multi_sum(operands, ndim_out_axis=2):
    """ONE variadic lax.reduce over axes (0,1,3): a single HLO reduce the
    simplifier cannot split into per-output passes. Operands are cast to
    f32 in the generator (fuses with their elementwise producers)."""
    ops = tuple(o.astype(jnp.float32) for o in operands)
    inits = tuple(jnp.float32(0) for _ in ops)

    def comp(accs, vals):
        return tuple(a + v for a, v in zip(accs, vals))

    return jax.lax.reduce(ops, inits, comp, (0, 1, 3))


def bwd_varred(d, eps, res, cots):
    """Per-channel/scalar reductions grouped into ONE variadic reduce per
    phase; dwd taps ride the phase-B reduce. dW/db via augmented dots."""
    x, h1, h2, m1, v1, m2, v2, params = res
    w1, b1, g1, be1, a1, wd, bd, g2, be2, a2, w2, b2 = params
    g, g_hist = cots[0], cots[1]
    dt = x.dtype
    b, k_len, c, t_len = x.shape
    n = b * k_len * t_len
    f32 = jnp.float32

    # ---- phase A ----
    inv2r = jax.lax.rsqrt(v2 + eps)
    xh2 = ((h2.astype(f32) - m2[:, None]) * inv2r[:, None]).astype(dt)
    h2n = xh2 * g2.astype(dt)[:, None] + be2.astype(dt)[:, None]
    h2a = tt._prelu(h2n, a2)
    dh2a = jnp.einsum("bkot,co->bkct", g, w2)
    neg2 = h2n < 0
    dh2n = jnp.where(neg2, a2.astype(dt) * dh2a, dh2a)
    dg2, dbe2, da2v, db2 = _multi_sum(
        (dh2n * xh2, dh2n,
         jnp.where(neg2, dh2a * h2n, jnp.zeros_like(h2n)), g))
    da2 = jnp.sum(da2v).reshape(a2.shape)
    dw2 = jnp.einsum("bkct,bkot->co", h2a, g, preferred_element_type=f32)

    # ---- phase B ----
    s2 = (inv2r * g2.astype(f32)).astype(dt)
    dh2 = s2[:, None] * (
        dh2n - (dbe2 / n).astype(dt)[:, None] - xh2 * (dg2 / n).astype(dt)[:, None])
    gp = jnp.pad(dh2, ((0, 0), (1, 1), (0, 0), (2 * d, 2 * d)))
    t_ext = t_len + 2 * d
    wf = wd[::-1, ::-1]
    acc = None
    for it in range(3):
        for jf in range(3):
            sl = gp[:, jf : jf + k_len, :, it * d : it * d + t_ext] * wf[it, jf][:, None]
            acc = sl if acc is None else acc + sl
    dxe = acc
    if g_hist is not None:
        dxe = dxe.at[..., t_len:].add(g_hist.astype(dxe.dtype))
    inv1r = jax.lax.rsqrt(v1 + eps)
    xh1 = h1  # fold=True residual
    h1n = xh1 * g1.astype(dt)[:, None] + be1.astype(dt)[:, None]
    h1a = tt._prelu(h1n, a1)
    xe = jnp.pad(h1a, ((0, 0), (0, 0), (0, 0), (2 * d, 0)))
    xp = jnp.pad(xe, ((0, 0), (1, 1), (0, 0), (0, 0)))
    dh1a = dxe[..., 2 * d :]
    neg1 = h1n < 0
    dh1n = jnp.where(neg1, a1.astype(dt) * dh1a, dh1a)
    taps = tuple(xp[:, jf : jf + k_len, :, it * d : it * d + t_len] * dh2
                 for it in range(3) for jf in range(3))
    outs = _multi_sum(taps + (
        dh1n * xh1, dh1n,
        jnp.where(neg1, dh1a * h1n, jnp.zeros_like(h1n)), dh2))
    dwd = jnp.stack(outs[:9]).reshape(3, 3, c)
    dg1, dbe1, da1v, dbd = outs[9], outs[10], outs[11], outs[12]
    da1 = jnp.sum(da1v).reshape(a1.shape)

    # ---- phase C ----
    s1 = (inv1r * g1.astype(f32)).astype(dt)
    dh1 = s1[:, None] * (
        dh1n - (dbe1 / n).astype(dt)[:, None] - xh1 * (dg1 / n).astype(dt)[:, None])
    ones1 = jnp.ones((b, k_len, 1, t_len), dt)
    xa = jnp.concatenate([x, ones1], axis=2)
    dw1b = jnp.einsum("bkct,bkot->co", xa, dh1, preferred_element_type=f32)
    dw1, db1 = dw1b[:c], dw1b[c]
    dx = jnp.einsum("bkot,co->bkct", dh1, w1) + g

    dparams = (
        dw1.astype(w1.dtype), db1.astype(b1.dtype),
        dg1.astype(g1.dtype), dbe1.astype(be1.dtype), da1.astype(a1.dtype),
        dwd.astype(wd.dtype), dbd.astype(bd.dtype),
        dg2.astype(g2.dtype), dbe2.astype(be2.dtype), da2.astype(a2.dtype),
        dw2.astype(w2.dtype), db2.astype(b2.dtype),
    )
    return dx, dparams


VARIANT_BWD = {"dotred": bwd_dotred, "varred": bwd_varred}


def measure(name):
    import functools
    if name in VARIANT_BWD:
        zeros = ()
    else:
        zeros = ZERO_GROUPS[name]

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
    def block(x, params, d, eps):
        out, _ = tt._fwd(x, params, d, eps, fold=True)
        return out

    bwd_fn = VARIANT_BWD.get(name) or bwd_variant(zeros)
    block.defvjp(lambda x, p, d, eps: tt._fwd(x, p, d, eps, fold=True),
                 lambda d, eps, res, cots: bwd_fn(d, eps, res, cots))

    rng = np.random.default_rng(0)
    xs, ps = [], []
    for k, c in STAGES:
        xs.append(jnp.asarray(rng.standard_normal((B, k, c, T)), DTYPE) * 0.1)
        ps.append([make_params(c, rng) for _ in DILS])

    def loss(ps, xs):
        tot = jnp.float32(0.0)
        for x, pstack in zip(xs, ps):
            y = x
            for d_, p in zip(DILS, pstack):
                y, hist, m1, v1, m2, v2 = block(y, tuple(p), d_, 1e-5)
                y = y + 1e-9 * jax.lax.stop_gradient(
                    m1.sum() + v1.sum() + m2.sum() + v2.sum()).astype(y.dtype)
            tot = tot + jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6
        return tot

    def f(ps, xs):
        v, g = jax.value_and_grad(loss)(ps, xs)
        gn = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))
        return v + 1e-9 * gn

    @jax.jit
    def loop(x0, ps, rest):
        def body(i, carry):
            acc, x0 = carry
            v = f(ps, [x0] + list(rest))
            return acc + v, (x0 * (1 + 1e-9 * v)).astype(DTYPE)
        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), x0))
        return acc

    float(loop(xs[0], ps, xs[1:]))
    times = []
    for rep in range(3):
        fresh = xs[0] * (1.0 + 1e-3 * (rep + 1))
        float(fresh.ravel()[0])
        t0 = time.perf_counter()
        float(loop(fresh, ps, xs[1:]))
        times.append(time.perf_counter() - t0)
    dt = min(times) / ITERS
    print(f"{name:10s} {dt * 1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    for w in sys.argv[1:] or list(ZERO_GROUPS):
        if w == "check":
            for nm, fn in VARIANT_BWD.items():
                print(nm, end=" ", flush=True)
                check_variant(fn)
        else:
            measure(w)
