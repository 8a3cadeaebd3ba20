"""Round-4: reproduce the in-graph TFCM backward anomaly in isolation.

profile_step_anatomy.py measured the windowed MTFAA step's TFCM share at
12.8 ms fwd + 60.6 ms bwd -- a 4.7x bwd/fwd ratio where isolated-block
scaling predicts ~25 ms bwd. This harness rebuilds the production TFCM
topology exactly -- the real flax TFCM stacks at every stage's shape,
params cast to bf16 like cast_forward does, value_and_grad w.r.t. ALL
params with every leaf consumed -- and then bisects with variants:

  chain         the 6 production stacks (enc 24/32/48, dec 32/24/4), dil 1..8
  chain_eval    same, train=False (BN running stats; no stat reductions)
  chain_nostate same, streaming hist outputs discarded (state=None anyway)
  stack0x6      6x the stage-0 stack only (controls for shape mix)

Usage: python scripts/profile_tfcm_chain.py [variant ...]
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

from cruse_tpu.models.mtfaa import TFCM

B, T = 16, 626
ITERS = int(os.environ.get("TFCM_ITERS", "20"))
DTYPE = jnp.bfloat16

# (K, C) per production stack position: enc 0..2 then dec 2..0
STAGES = [(64, 24), (32, 32), (16, 48), (32, 32), (64, 24), (128, 4)]
LAYERS = 4


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


DW_IMPL = os.environ.get("TFCM_DW_IMPL", "xla")


def build(stages, train):
    mods, varss, xs = [], [], []
    rng = np.random.default_rng(0)
    for i, (k, c) in enumerate(stages):
        m = TFCM(c, LAYERS, dw_impl=DW_IMPL)
        x = jnp.asarray(rng.standard_normal((B, k, c, T)), DTYPE) * 0.1
        v = m.init(jax.random.PRNGKey(i), x, train=True)
        mods.append(m)
        varss.append(v)
        xs.append(x)
    params = [jax.tree_util.tree_map(lambda a: a.astype(DTYPE), v["params"]) for v in varss]
    stats = [jax.tree_util.tree_map(lambda a: a.astype(DTYPE), v.get("batch_stats", {})) for v in varss]
    return mods, params, stats, xs


def measure(name, train=True, stages=STAGES, grad=True):
    mods, params, stats, xs = build(stages, train)

    def loss(params, xs):
        tot = jnp.float32(0.0)
        for m, p, s, x in zip(mods, params, stats, xs):
            if train:
                (y, _), _ = m.apply({"params": p, "batch_stats": s}, x,
                                    train=True, mutable=["batch_stats"])
            else:
                y, _ = m.apply({"params": p, "batch_stats": s}, x, train=False)
            tot = tot + jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6
        return tot

    if grad == "params" or grad is True:
        def f(params, xs):
            v, g = jax.value_and_grad(loss)(params, xs)
            gn = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))
            return v + 1e-9 * gn
    elif grad == "dw":
        def f(params, xs):
            def loss_dw(params, xs):
                # grads w.r.t. dw_kernel leaves only: freeze the rest
                def sel(path, leaf):
                    name = jax.tree_util.keystr(path)
                    return leaf if "dw_kernel" in name else jax.lax.stop_gradient(leaf)

                p = [jax.tree_util.tree_map_with_path(sel, pp) for pp in params]
                return loss(p, xs)

            v, g = jax.value_and_grad(loss_dw)(params, xs)
            gn = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))
            return v + 1e-9 * gn
    elif grad in ("pconv", "small"):
        keys = ("pconv1_kernel", "pconv2_kernel")
        def f(params, xs, _keys=keys, _mode=grad):
            def loss_sel(params, xs):
                def sel(path, leaf):
                    name = jax.tree_util.keystr(path)
                    is_pconv = any(k in name for k in _keys)
                    keep = is_pconv if _mode == "pconv" else (not is_pconv and "dw_kernel" not in name)
                    return leaf if keep else jax.lax.stop_gradient(leaf)

                p = [jax.tree_util.tree_map_with_path(sel, pp) for pp in params]
                return loss(p, xs)

            v, g = jax.value_and_grad(loss_sel)(params, xs)
            gn = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))
            return v + 1e-9 * gn
    elif grad == "x":
        def f(params, xs):
            frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
            v, g = jax.value_and_grad(lambda xs: loss(frozen, xs))(xs)
            gn = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))
            return v + 1e-9 * gn
    else:
        f = loss

    @jax.jit
    def loop(x0, params, rest):
        def body(i, carry):
            acc, x0 = carry
            xs = [x0] + list(rest)
            v = f(params, xs)
            return acc + v, (x0 * (1 + 1e-9 * v)).astype(DTYPE)

        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), x0))
        return acc

    dt = _time3(loop, xs[0], params, xs[1:]) / ITERS
    tag = "fwd+bwd" if grad else "fwd"
    print(f"{name:16s} {dt * 1e3:8.2f} ms/iter ({tag})", flush=True)
    return dt


if __name__ == "__main__":
    which = sys.argv[1:] or ["chain_fwd", "chain", "chain_eval", "stack0x6"]
    for w in which:
        if w == "chain":
            measure("chain", train=True)
        elif w == "chain_fwd":
            measure("chain_fwd", train=True, grad=False)
        elif w == "chain_eval":
            measure("chain_eval", train=False)
        elif w == "chain_eval_fwd":
            measure("chain_eval_fwd", train=False, grad=False)
        elif w == "stack0x6":
            measure("stack0x6", train=True, stages=[(64, 24)] * 6)
        elif w == "chain_pconvgrad":
            measure("chain_pconvgrad", train=True, grad="pconv")
        elif w == "chain_smallgrad":
            measure("chain_smallgrad", train=True, grad="small")
        elif w == "chain_dwgrad":
            measure("chain_dwgrad", train=True, grad="dw")
        elif w == "chain_xgrad":
            measure("chain_xgrad", train=True, grad="x")
        elif w == "chain_eval_xgrad":
            measure("chain_eval_xgrad", train=False, grad="x")
