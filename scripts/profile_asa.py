"""Measure: flash ASA kernel vs XLA einsum+mask temporal attention, on the
real chip at MTFAA bench shapes (B=16, 10 s -> T=626; encoder stages
(F, C, c_att) = (64,24,6), (32,32,8), (16,48,12); bf16 activations).

For each stage: forward-only and forward+backward wall time, best of 3,
whole workload looped on device (outputs feed back; see bench.py
methodology notes on the tunneled runtime).

Usage: python scripts/profile_asa.py [fp32|bf16] [T]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from cruse_tpu.ops.asa_kernel import flash_tattn_tm, xla_tattn_tm

DTYPE = jnp.bfloat16 if (len(sys.argv) < 2 or sys.argv[1] == "bf16") else jnp.float32
T = int(sys.argv[2]) if len(sys.argv) > 2 else 626
B = 16
STAGES = [(64, 24, 6), (32, 32, 8), (16, 48, 12)]
ITERS = 100  # amortize the tunnel dispatch RTT (>= 100 on-device iters)


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


def loop(fn):
    @jax.jit
    def run(q, k, v):
        def body(i, carry):
            acc, qq = carry
            out = fn(qq, k, v)
            return acc + out[0, 0, 0].astype(jnp.float32), qq + 1e-6 * out[:, : qq.shape[1]]

        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), q))
        return acc

    return run


def loop_grad(fn):
    def lossf(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    g = jax.grad(lossf, argnums=(0, 1, 2))

    @jax.jit
    def run(q, k, v):
        def body(i, carry):
            acc, qq = carry
            dq, dk, dv = g(qq, k, v)
            return acc + dq[0, 0, 0].astype(jnp.float32), qq + 1e-6 * dq

        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), q))
        return acc

    return run


def main():
    rng = np.random.default_rng(0)
    print(f"dtype={DTYPE.__name__} T={T} B={B} iters={ITERS}")
    for window in (None, 126):
        tot_x = tot_f = tot_xg = tot_fg = 0.0
        for (f, cv, c) in STAGES:
            bf = B * f
            q = jnp.asarray(rng.standard_normal((bf, c, T)), DTYPE)
            k = jnp.asarray(rng.standard_normal((bf, c, T)), DTYPE)
            v = jnp.asarray(rng.standard_normal((bf, cv, T)), DTYPE)
            fl = lambda q, k, v: flash_tattn_tm(q, k, v, window, False)
            xl = lambda q, k, v: xla_tattn_tm(q, k, v, window)
            tx = best3(loop(xl), q, k, v)
            tf = best3(loop(fl), q, k, v)
            txg = best3(loop_grad(xl), q, k, v)
            tfg = best3(loop_grad(fl), q, k, v)
            tot_x += tx; tot_f += tf; tot_xg += txg; tot_fg += tfg
            print(
                f"w={window} stage F={f:3d} C={cv:2d} c={c:2d}: "
                f"fwd xla {tx*1e3:7.2f} ms  flash {tf*1e3:7.2f} ms ({tx/tf:4.2f}x) | "
                f"fwd+bwd xla {txg*1e3:7.2f} ms  flash {tfg*1e3:7.2f} ms ({txg/tfg:4.2f}x)"
            )
        print(
            f"w={window} TOTAL: fwd xla {tot_x*1e3:7.2f} flash {tot_f*1e3:7.2f} "
            f"({tot_x/tot_f:4.2f}x) | fwd+bwd xla {tot_xg*1e3:7.2f} flash "
            f"{tot_fg*1e3:7.2f} ({tot_xg/tot_fg:4.2f}x)"
        )


if __name__ == "__main__":
    main()
