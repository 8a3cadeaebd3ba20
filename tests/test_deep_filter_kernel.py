"""Pallas deep-filter kernel: parity vs the XLA shift-MAC path.

Runs in interpret mode on the CPU test mesh; the compiled kernel is timed on
the real chip by scripts/profile_deep_filter.py."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cruse_tpu.models.deep_filter import deep_filter_apply, tap_offsets


def _pallas_interpret(spec_r, spec_i, coef_r, coef_i, t_dim, f_dim):
    from jax.experimental.pallas import tpu as pltpu
    import cruse_tpu.ops.deep_filter_kernel as dfk

    with pltpu.force_tpu_interpret_mode():
        return dfk.deep_filter_pallas(spec_r, spec_i, coef_r, coef_i, t_dim, f_dim)


@pytest.mark.parametrize("t_dim,f_dim,t,f", [(1, 1, 40, 64), (2, 1, 200, 96)])
def test_kernel_matches_shift_mac(rng, t_dim, f_dim, t, f):
    b = 2
    k = len(tap_offsets(t_dim, f_dim, causal=True))
    spec_r = jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32))
    spec_i = jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32))
    coef_r = jnp.asarray(rng.standard_normal((b, t, f, k)).astype(np.float32) * 0.2)
    coef_i = jnp.asarray(rng.standard_normal((b, t, f, k)).astype(np.float32) * 0.2)

    want_r, want_i = deep_filter_apply(
        spec_r, spec_i, coef_r, coef_i, t_dim, f_dim, causal=True
    )
    got_r, got_i = _pallas_interpret(spec_r, spec_i, coef_r, coef_i, t_dim, f_dim)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i), atol=1e-5)


def test_kernel_block_boundary(rng):
    """Time shifts must be correct ACROSS the 128-frame block boundary."""
    b, t, f, t_dim, f_dim = 1, 300, 32, 2, 0
    k = len(tap_offsets(t_dim, f_dim, causal=True))
    spec_r = jnp.zeros((b, t, f)).at[0, 127, :].set(1.0)  # impulse at block edge
    spec_i = jnp.zeros((b, t, f))
    coef_r = jnp.ones((b, t, f, k))
    coef_i = jnp.zeros((b, t, f, k))
    want_r, _ = deep_filter_apply(spec_r, spec_i, coef_r, coef_i, t_dim, f_dim, causal=True)
    got_r, _ = _pallas_interpret(spec_r, spec_i, coef_r, coef_i, t_dim, f_dim)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r), atol=1e-5)
    # the impulse must appear at frames 127..131 (taps dt=0..4)
    assert np.asarray(got_r)[0, 129, 0] == 1.0 and np.asarray(got_r)[0, 131, 0] == 1.0
