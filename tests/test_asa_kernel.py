"""Flash ASA kernel (ops/asa_kernel.py): parity vs the einsum+mask path.

Interpret-mode Pallas on CPU, at the MTFAA encoder-stage geometries
(c_att 6..12, C 24..48), forward AND backward, causal full + windowed —
same genre as tests/test_tfcm_kernel.py."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cruse_tpu.ops.asa_kernel import flash_tattn_tm, xla_tattn_tm


CASES = [
    (3, 6, 24, 200, None),   # stage-0 geometry, T not a block multiple
    (2, 8, 32, 130, None),   # stage-1
    (2, 12, 48, 257, 50),    # stage-2, windowed
    (1, 6, 24, 128, 16),     # exact single block, small window
    (1, 8, 32, 384, 128),    # window == block edge
]


@pytest.mark.parametrize("bf,c,cv,t,w", CASES)
def test_forward_parity(bf, c, cv, t, w):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((bf, c, t)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bf, c, t)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bf, cv, t)), jnp.float32)
    out = flash_tattn_tm(q, k, v, w, True)
    ref = xla_tattn_tm(q, k, v, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("bf,c,cv,t,w", [CASES[0], CASES[2]])
def test_grad_parity(bf, c, cv, t, w):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((bf, c, t)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bf, c, t)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bf, cv, t)), jnp.float32)

    def f(q, k, v):
        return jnp.sum(jnp.sin(flash_tattn_tm(q, k, v, w, True)))

    def g(q, k, v):
        return jnp.sum(jnp.sin(xla_tattn_tm(q, k, v, w)))

    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_bf16_runs_and_tracks_fp32():
    rng = np.random.default_rng(2)
    bf, c, cv, t = 2, 6, 24, 160
    q32 = jnp.asarray(rng.standard_normal((bf, c, t)), jnp.float32)
    k32 = jnp.asarray(rng.standard_normal((bf, c, t)), jnp.float32)
    v32 = jnp.asarray(rng.standard_normal((bf, cv, t)), jnp.float32)
    out16 = flash_tattn_tm(
        q32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16),
        v32.astype(jnp.bfloat16), None, True,
    )
    assert out16.dtype == jnp.bfloat16
    ref = xla_tattn_tm(q32, k32, v32, None)
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(ref), atol=0.05
    )


@pytest.mark.slow
def test_model_level_parity_full_and_windowed():
    """MtfaaNet forward with asa_impl=flash_interpret matches asa_impl=xla
    (whole network, both attention_window settings)."""
    from cruse_tpu.models import MtfaaNet
    from cruse_tpu.models.mtfaa import MtfaaConfig

    rng = np.random.default_rng(3)
    for window in (None, 20):
        kw = dict(n_fft=512, n_bands=32, channels=(4, 6, 8), tfcm_layers=1,
                  attention_window=window)
        m_x = MtfaaNet(MtfaaConfig(asa_impl="xla", **kw))
        m_f = MtfaaNet(MtfaaConfig(asa_impl="flash_interpret", **kw))
        cspec = jnp.asarray(rng.standard_normal((1, 40, 257, 2)), jnp.float32)
        variables = m_x.init(jax.random.PRNGKey(0), cspec)
        (out_x, mask_x), _ = m_x.apply(variables, cspec)
        (out_f, mask_f), _ = m_f.apply(variables, cspec)
        np.testing.assert_allclose(
            np.asarray(mask_f), np.asarray(mask_x), atol=1e-5,
            err_msg=f"window={window}",
        )
        np.testing.assert_allclose(
            np.asarray(jnp.abs(out_f - out_x)).max(), 0.0, atol=1e-4,
            err_msg=f"window={window}",
        )
