"""Deep filter: Pallas kernel vs XLA shift-MAC, timed on the real chip.

VERDICT round-1 item 7: build the advertised Pallas deep-filter op and keep
whichever wins. Run: python scripts/profile_deep_filter.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cruse_tpu.models.deep_filter import deep_filter_apply, tap_offsets
from cruse_tpu.ops.deep_filter_kernel import deep_filter_pallas

B, T, F = 64, 1000, 96  # config-3 shapes: 10 s at hop 160, df_bins=96
T_DIM, F_DIM = 2, 1
ITERS = 50


def time_fn(fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, carry):
            acc, sr = carry
            o_r, o_i = fn(sr, *a[1:])
            return acc + o_r[0, 0, 0], sr + 1e-6 * o_r
        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), a[0]))
        return acc

    # float() forces a real round trip (block_until_ready can return early
    # on the tunneled runtime) and fresh inputs defeat execution caching
    float(loop(*args))
    times = []
    for rep in range(3):
        fresh = (args[0] * (1.0 + 1e-4 * (rep + 1)),) + args[1:]
        float(fresh[0].ravel()[0])
        t0 = time.perf_counter()
        float(loop(*fresh))
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS


def main():
    k = len(tap_offsets(T_DIM, F_DIM, causal=True))
    rng = np.random.default_rng(0)
    spec_r = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    spec_i = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    coef_r = jnp.asarray(rng.standard_normal((B, T, F, k)).astype(np.float32) * 0.2)
    coef_i = jnp.asarray(rng.standard_normal((B, T, F, k)).astype(np.float32) * 0.2)

    t_xla = time_fn(
        lambda sr, si, cr, ci: deep_filter_apply(sr, si, cr, ci, T_DIM, F_DIM, causal=True),
        spec_r, spec_i, coef_r, coef_i,
    )
    t_pl = time_fn(
        lambda sr, si, cr, ci: deep_filter_pallas(sr, si, cr, ci, T_DIM, F_DIM),
        spec_r, spec_i, coef_r, coef_i,
    )
    # kernel ceiling: coefs produced tap-major, no entry transpose
    coef_r_k = jnp.transpose(coef_r, (0, 3, 1, 2)).copy()
    coef_i_k = jnp.transpose(coef_i, (0, 3, 1, 2)).copy()
    t_pl_native = time_fn(
        lambda sr, si, cr, ci: deep_filter_pallas(
            sr, si, cr, ci, T_DIM, F_DIM, coef_layout="bktf"),
        spec_r, spec_i, coef_r_k, coef_i_k,
    )
    print(f"shapes B={B} T={T} F={F} K={k}")
    print(f"XLA shift-MAC       : {t_xla * 1e3:8.3f} ms/call")
    print(f"Pallas (btfk entry) : {t_pl * 1e3:8.3f} ms/call   speedup {t_xla / t_pl:.2f}x")
    print(f"Pallas (bktf native): {t_pl_native * 1e3:8.3f} ms/call   speedup {t_xla / t_pl_native:.2f}x")


if __name__ == "__main__":
    main()
