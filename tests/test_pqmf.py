"""PQMF invariants: prototype parity vs scipy.firwin, near-perfect reconstruction."""
import numpy as np
import jax.numpy as jnp
from scipy.signal import firwin

from cruse_tpu.dsp.pqmf import PQMF, design_prototype_filter


def test_prototype_matches_scipy_firwin():
    for taps, cutoff, beta in [(62, 0.15, 9.0), (62, 0.1, 9.0), (30, 0.2, 6.0)]:
        ours = design_prototype_filter(taps, cutoff, beta)
        ref = firwin(taps + 1, cutoff, window=("kaiser", beta))
        np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_analysis_shapes():
    pq = PQMF(subbands=4)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32))
    sub = pq.analysis(x)
    assert sub.shape == (2, 4, 4000)


def test_near_perfect_reconstruction():
    rng = np.random.default_rng(0)
    for subbands in (2, 4, 8):
        pq = PQMF(subbands=subbands)  # auto-optimized cutoff
        x = rng.standard_normal((1, 8000)).astype(np.float32)
        y = np.asarray(pq.synthesis(pq.analysis(jnp.asarray(x))))
        assert y.shape == x.shape
        # compensate group delay: find best alignment within one filter length
        best = min(
            np.mean((np.roll(y[0], -d)[100:-200] - x[0][100:-200]) ** 2)
            for d in range(-70, 70)
        )
        snr = 10 * np.log10(np.mean(x[0][100:-200] ** 2) / (best + 1e-12))
        assert snr > 25.0, f"subbands={subbands}: reconstruction SNR {snr:.1f} dB"
