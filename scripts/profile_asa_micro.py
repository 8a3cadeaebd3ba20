"""Micro: the windowed-ASA time-attention at production shapes, einsum vs
explicit broadcast-multiply-reduce (VPU route) for the tiny-K products.

The two big-output/tiny-contraction products are where the MXU occupancy
model collapses (K=c_att=6..12 -> eff(K)<=9%):
  fwd logits:  qb[b,f,c,n,w] x k2[b,f,c,n,s] -> [b,f,n,w,s]
  bwd d_attn:  dxt[b,f,c,n,w] x v2[b,f,c,n,s] -> [b,f,n,w,s]
VPU slot count for each is only els*c_att (0.9-1.3 ms across sites), so if
XLA is putting them on the MXU, forcing the elementwise route should win.

Usage: python scripts/profile_asa_micro.py [einsum|vpu|attn_einsum|attn_vpu]
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

B, W, NB = 16, 126, 5
S = 2 * W
ITERS = 20
DT = jnp.bfloat16
SITES = [(64, 24), (32, 32), (16, 48)]  # (F, C) per encoder stage


def logits_einsum(qb, k2):
    return jnp.einsum("bfcnw,bfcns->bfnws", qb, k2)


def logits_vpu(qb, k2):
    return jnp.sum(qb[:, :, :, :, :, None] * k2[:, :, :, :, None, :], axis=2)


def attn_einsum(a, v2):
    return jnp.einsum("bfnws,bfcns->bfcnw", a, v2)


def attn_vpu(a, v2):
    # contraction over s is LARGE (252): keep it a dot, this variant exists
    # only to confirm the MXU is right for AV
    return jnp.sum(a[:, :, None] * v2[:, :, :, :, None, :], axis=-1)


FNS = {"einsum": logits_einsum, "vpu": logits_vpu,
       "attn_einsum": attn_einsum, "attn_vpu": attn_vpu}


def measure(name):
    fn = FNS[name]
    rng = np.random.default_rng(0)
    args_per_site = []
    for f, c in SITES:
        ca = max(c // 4, 1)
        if name.startswith("attn"):
            a = jnp.asarray(rng.standard_normal((B, f, NB, W, S)), DT) * 0.1
            v2 = jnp.asarray(rng.standard_normal((B, f, c, NB, S)), DT) * 0.1
            args_per_site.append((a, v2))
        else:
            qb = jnp.asarray(rng.standard_normal((B, f, ca, NB, W)), DT) * 0.1
            k2 = jnp.asarray(rng.standard_normal((B, f, ca, NB, S)), DT) * 0.1
            args_per_site.append((qb, k2))

    def one_pass(args, seed):
        tot = jnp.float32(0.0)
        for a, b_ in args:
            out, vjp = jax.vjp(fn, a * (1 + 1e-9 * seed), b_)
            da, db = vjp(out)  # cotangent = out itself (shape-right)
            tot = tot + jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9 \
                + jnp.sum(da.astype(jnp.float32)) * 1e-12 \
                + jnp.sum(db.astype(jnp.float32)) * 1e-12
        return tot

    @jax.jit
    def loop(args):
        def body(i, acc):
            return acc + one_pass(args, acc)
        return lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(args_per_site))
    times = []
    for rep in range(3):
        fresh = [(a * (1 + 1e-4 * (rep + 1)), b_) for a, b_ in args_per_site]
        float(fresh[0][0].ravel()[0])
        t0 = time.perf_counter()
        float(loop(fresh))
        times.append(time.perf_counter() - t0)
    dt = min(times) / ITERS
    print(f"{name:12s} {dt * 1e3:7.2f} ms (fwd+bwd, all 3 sites)", flush=True)


if __name__ == "__main__":
    for w in sys.argv[1:] or ["einsum", "vpu"]:
        measure(w)
