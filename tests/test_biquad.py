"""Biquad parity vs scipy.signal.lfilter + EQ-chain sanity under jit."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import signal as sps

from cruse_tpu.dsp.biquad import (
    FILTER_KINDS,
    biquad_coeffs,
    all_biquad_coeffs,
    lfilter,
    sos_chain,
    random_eq_chain,
    hp_filter,
    air_absorption_gains,
    air_absorption,
)


@pytest.mark.parametrize("kind", FILTER_KINDS)
def test_lfilter_matches_scipy(kind, rng):
    b, a = biquad_coeffs(kind, 1000.0, 6.0, 0.9, 16000.0)
    b, a = np.asarray(b, np.float64), np.asarray(a, np.float64)
    x = rng.standard_normal((2, 2000)).astype(np.float32)
    ours = np.asarray(lfilter(jnp.asarray(x), jnp.asarray(b), jnp.asarray(a)))
    ref = sps.lfilter(b, a, x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_coeffs_match_scipy_butter_like():
    # RBJ lowpass at Q=1/sqrt(2) equals 2nd-order Butterworth
    b, a = biquad_coeffs("low_pass", 2000.0, 0.0, 1.0 / np.sqrt(2.0), 16000.0)
    bb, ab = sps.butter(2, 2000.0, fs=16000.0, btype="low")
    np.testing.assert_allclose(np.asarray(b), bb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), ab, atol=1e-5)


def test_assoc_equals_sequential_scan(rng):
    """log-depth associative recurrence == the sequential DF2T scan."""
    x = jnp.asarray(rng.standard_normal((3, 4000)).astype(np.float32))
    for kind in ("low_pass", "peaking_eq", "high_shelf"):
        b, a = biquad_coeffs(kind, 700.0, 4.0, 0.9, 16000.0)
        y_scan = lfilter(x, b, a, method="scan")
        y_assoc = lfilter(x, b, a, method="assoc")
        np.testing.assert_allclose(np.asarray(y_assoc), np.asarray(y_scan), atol=1e-4)


def test_sos_chain_equals_sequential_lfilter(rng):
    x = jnp.asarray(rng.standard_normal((3, 1500)).astype(np.float32))
    b1, a1 = biquad_coeffs("peaking_eq", 500.0, -4.0, 1.2, 16000.0)
    b2, a2 = biquad_coeffs("high_pass", 120.0, 0.0, 0.7, 16000.0)
    chained = sos_chain(x, jnp.stack([b1, b2]), jnp.stack([a1, a2]))
    seq = lfilter(lfilter(x, b1, a1), b2, a2)
    np.testing.assert_allclose(np.asarray(chained), np.asarray(seq), atol=1e-4)


def test_random_eq_chain_jits_and_is_stable(rng):
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    out = jax.jit(random_eq_chain, static_argnums=2)(jax.random.PRNGKey(0), x, 3)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # filters are gentle EQs: output energy within a sane range of input
    ratio = out.std() / np.asarray(x).std()
    assert 0.05 < ratio < 20.0
    # different keys -> different filters
    out2 = np.asarray(jax.jit(random_eq_chain, static_argnums=2)(jax.random.PRNGKey(1), x, 3))
    assert np.abs(out - out2).max() > 1e-4


def test_hp_filter_kills_dc(rng):
    x = jnp.ones((1, 8000)) * 0.5  # pure DC
    y = np.asarray(hp_filter(x, jax.random.PRNGKey(0)))
    assert np.abs(y[0, -1000:]).max() < 1e-2


def test_all_coeffs_stack_consistent():
    b_all, a_all = all_biquad_coeffs(1000.0, 3.0, 1.0, 16000.0)
    for i, kind in enumerate(FILTER_KINDS):
        b, a = biquad_coeffs(kind, 1000.0, 3.0, 1.0, 16000.0)
        np.testing.assert_allclose(np.asarray(b_all[i]), np.asarray(b), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a_all[i]), np.asarray(a), rtol=1e-6)


def test_air_absorption_attenuates_high_freqs(rng):
    gains = np.asarray(air_absorption_gains(jax.random.PRNGKey(0), 161, 16000.0))
    assert gains.shape == (161,)
    assert gains[0] > gains[-1]  # more absorption at high freq
    assert (gains > 0).all() and (gains <= 1.0 + 1e-6).all()
    x = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
    y = np.asarray(air_absorption(jax.random.PRNGKey(0), x))
    assert y.shape == (1, 8000)
    assert np.isfinite(y).all()
