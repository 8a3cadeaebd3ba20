"""Parity: fused depthwise stencil kernel (ops/dw_kernel.py) vs the
TFCMBlock einsum formulation, fwd + both grads, interpret mode (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cruse_tpu.ops.dw_kernel import dw_causal_tm, dw_taps_reference


@pytest.mark.parametrize("d", [1, 2, 4])
@pytest.mark.parametrize("shape", [(2, 8, 6, 40), (1, 5, 3, 23)])
def test_dw_kernel_forward_parity(rng, d, shape):
    b, k, c, t = shape
    x_ext = jnp.asarray(rng.standard_normal((b, k, c, t + 2 * d)), jnp.float32)
    wd = jnp.asarray(rng.standard_normal((3, 3, c)), jnp.float32)
    ref = dw_taps_reference(x_ext, wd, d)
    out = dw_causal_tm(x_ext, wd, d, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("d", [1, 3])
def test_dw_kernel_grad_parity(rng, d):
    b, k, c, t = 2, 6, 4, 17
    x_ext = jnp.asarray(rng.standard_normal((b, k, c, t + 2 * d)), jnp.float32)
    wd = jnp.asarray(rng.standard_normal((3, 3, c)), jnp.float32)
    co = jnp.asarray(rng.standard_normal((b, k, c, t)), jnp.float32)

    def loss_ref(x, w):
        return jnp.sum(dw_taps_reference(x, w, d) * co)

    def loss_ker(x, w):
        return jnp.sum(dw_causal_tm(x, w, d, True) * co)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x_ext, wd)
    gx_k, gw_k = jax.grad(loss_ker, argnums=(0, 1))(x_ext, wd)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_r), atol=1e-4)


def test_dw_kernel_bf16(rng):
    d = 2
    b, k, c, t = 2, 8, 6, 30
    x_ext = jnp.asarray(rng.standard_normal((b, k, c, t + 2 * d)) * 0.1,
                        jnp.bfloat16)
    wd = jnp.asarray(rng.standard_normal((3, 3, c)) * 0.1, jnp.bfloat16)
    ref = dw_taps_reference(x_ext, wd, d)
    out = dw_causal_tm(x_ext, wd, d, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2)
