"""Fused TFCM Pallas kernels: interpret-mode parity vs the XLA block.

The kernels are a measured experiment (they tie XLA on-chip -- the block
is MXU-latency-bound at MTFAA's channel counts, see the module docstring
in cruse_tpu/ops/tfcm_kernel.py); these tests pin their MATH so the
experiment stays trustworthy: eval-mode BN folding, causal zero-padding
of p1 across chunk boundaries (including chunks whose halo reaches before
the sequence start), and the whole-stack validity-propagation halo.
"""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.models.mtfaa import TFCM, TFCMBlock
from cruse_tpu.ops.tfcm_kernel import (
    fused_tfcm_block_eval,
    fused_tfcm_stack_eval,
    tfcm_stack_params,
)


def _rand_stats(rng, c):
    return {
        "mean": jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.2),
        "var": jnp.asarray(1.0 + 0.3 * rng.random(c).astype(np.float32)),
    }


def test_fused_block_matches_xla_eval(rng):
    for d, tc, t, c, k in [(1, 16, 37, 8, 16), (4, 16, 37, 8, 16), (8, 32, 100, 24, 64)]:
        x = jnp.asarray(rng.standard_normal((2, k, c, t)).astype(np.float32))
        blk = TFCMBlock(c, d)
        v = blk.init(jax.random.PRNGKey(0), x)
        p = v["params"]
        s = {"bn1": _rand_stats(rng, c), "bn2": _rand_stats(rng, c)}
        ref, _ = blk.apply({"params": p, "batch_stats": s}, x, None, False)
        got = fused_tfcm_block_eval(
            x, p["pconv1_kernel"], p["pconv1_bias"],
            p["bn1"]["scale"], p["bn1"]["bias"], s["bn1"]["mean"], s["bn1"]["var"],
            p["prelu1"]["negative_slope"],
            p["dw_kernel"], p["dw_bias"],
            p["bn2"]["scale"], p["bn2"]["bias"], s["bn2"]["mean"], s["bn2"]["var"],
            p["prelu2"]["negative_slope"],
            p["pconv2_kernel"], p["pconv2_bias"],
            dilation=d, t_chunk=tc, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_fused_stack_matches_xla_eval(rng):
    # T=19/tc=8 makes chunk 1's halo reach before the sequence start --
    # the global-position zero-mask case
    for t, c, k, tc in [(37, 8, 16, 16), (100, 24, 64, 48), (19, 8, 16, 8)]:
        x = jnp.asarray(rng.standard_normal((2, k, c, t)).astype(np.float32))
        stack = TFCM(c, 4)
        v = stack.init(jax.random.PRNGKey(0), x)
        params, stats = v["params"], v["batch_stats"]
        stats = jax.tree_util.tree_map(
            lambda a: a + 0.1 * jnp.asarray(rng.standard_normal(a.shape), a.dtype) ** 2,
            stats,
        )
        ref, _ = stack.apply({"params": params, "batch_stats": stats}, x)
        bp = tfcm_stack_params(params, stats, 4)
        got = fused_tfcm_stack_eval(x, bp, dilations=(1, 2, 4, 8), t_chunk=tc,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
