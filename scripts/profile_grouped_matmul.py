"""Microbenchmark: band-folded (block-diagonal) 1x1 convs vs plain.

Hypothesis: MTFAA's T-minor 1x1 contractions (einsum bkct,co->bkot at
C=24..48) are MXU *row-streaming* bound -- cost scales with M = B*K*T rows
regardless of the 24/128 K/N fill. Folding g adjacent bands into the
channel dim (x: [B,K,C,T] -> [B,K/g,g*C,T], weights -> kron(I_g, W)) is
mathematically identical but cuts M by g while raising the contraction
width toward 128. If the hypothesis holds this is ~g x faster.

Usage: python scripts/profile_grouped_matmul.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B, T = 16, 626
ITERS = 20


def best3(fn, *args):
    float(fn(*args))
    times = []
    for rep in range(3):
        fresh = tuple(a * (1.0 + 1e-3 * (rep + 1)) for a in args)
        for a in fresh:
            jax.block_until_ready(a)
        t0 = time.perf_counter()
        float(fn(*fresh))
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS


def run(k, c, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, k, c, T)), dtype)
    w = jnp.asarray(rng.standard_normal((c, c)) * 0.1, dtype)

    def plain(x, w):
        @jax.jit
        def f(x, w):
            def body(i, carry):
                acc, xx = carry
                out = jnp.einsum("bkct,co->bkot", xx, w)
                return acc + out[0, 0, 0, 0].astype(jnp.float32), xx + 1e-6 * out
            acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), x))
            return acc
        return f

    # grouped impl (block-diag kron)
    def make_grouped(g):
        @jax.jit
        def f(x, w):
            eye = jnp.eye(g, dtype=w.dtype)
            wg = jnp.einsum("gh,co->gcho", eye, w).reshape(g * c, g * c)

            def body(i, carry):
                acc, xx = carry
                xg = xx.reshape(B, k // g, g * c, T)
                out = jnp.einsum("bkct,co->bkot", xg, wg).reshape(B, k, c, T)
                return acc + out[0, 0, 0, 0].astype(jnp.float32), xx + 1e-6 * out

            acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), x))
            return acc
        return f

    t_plain = best3(plain(x, w), x, w)
    line = f"K={k:3d} C={c:2d} {np.dtype(dtype).name:8s}: plain {t_plain*1e3:6.3f} ms"
    for g in (2, 4, 8):
        if k % g or g * c > 256:
            continue
        tg = best3(make_grouped(g), x, w)
        line += f" | g={g} ({g*c:3d}w) {tg*1e3:6.3f} ms ({t_plain/tg:4.2f}x)"
    print(line, flush=True)


if __name__ == "__main__":
    for dtype in (jnp.bfloat16,):
        for (k, c) in [(64, 24), (32, 32), (16, 48), (128, 4)]:
            run(k, c, dtype)
