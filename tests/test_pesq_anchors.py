"""P.862 anchor-behavior fixtures for the native PESQ (round-5 VERDICT #5).

Context: the in-repo PESQ (`metrics/pesq_native.py`) is P.862-structured
but has never been validated against the ITU binary in this image (the
`pesq` package is absent; `tools/validate_pesq.py` runs the gate the moment
it exists). The PMOS calibration (STATUS) correlates PMOS against this
native PESQ — internal consistency only. These tests break part of that
circle with EXTERNAL expectations: behaviors any P.862-conformant scorer
must show, taken from the public P.862/P.862.1/P.862.2 literature rather
than from this repo's own outputs.

Anchors asserted (with the public-literature basis):

1. Identity ceiling — P.862.2 WB MOS-LQO saturates near 4.64 and P.862.1
   NB near 4.55 for a transparent system (the logistic mapping endpoints
   published in the recommendations).
2. MNRU Q-ladder — the Modulated Noise Reference Unit (ITU-T P.810) is
   P.862's calibration degradation: MOS is monotonically increasing and
   roughly linear in Q across ~5..35 dB, saturating toward the ceiling
   above. Any conformant scorer must order Q = 5 < 15 < 25 < 35 < 45
   strictly, score Q=5 as severely degraded and Q=45 as near-transparent,
   and place Q=25 mid-scale.
3. Additive-noise SNR ladder — scores increase strictly with SNR; 0 dB
   white noise is severely degraded, 40 dB near-transparent (the SNR
   sweep every published PESQ evaluation includes).
4. Level alignment — P.862 normalizes both signals to a constant active
   level (79 dB SPL equivalent) before scoring, so a clean +/-10 dB gain
   must barely move the score.
5. Delay alignment — P.862's time-alignment stage must absorb a pure
   bulk delay (well inside its documented +/-?? ms search range), so
   50 ms of delay must barely move the score.

What these do NOT establish: bit-level ITU conformance (exact per-Q
MOS-LQO values need the licensed tables/binary — documented residual risk
in README; the one-command gate is tools/validate_pesq.py).

Ref: reference consumed the ITU binary via the `pesq` package
(/root/reference/train_base/metrics.py:89-108).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from cruse_tpu.metrics.pesq_native import nb_pesq_native, wb_pesq_native

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))
from validate_pesq import speechlike  # noqa: E402  (deterministic signal)

SR = 16000


@pytest.fixture(scope="module")
def ref():
    return speechlike(np.random.default_rng(7), seconds=6.0)


def mnru(x, q_db, rng):
    """ITU-T P.810 MNRU: y(t) = x(t) * (1 + 10^(-Q/20) * N(t)) —
    speech-correlated multiplicative noise at Q dB."""
    n = rng.standard_normal(len(x))
    n = n / np.std(n)
    return x * (1.0 + 10.0 ** (-q_db / 20.0) * n)


def test_identity_scores_at_ceiling(ref):
    wb = wb_pesq_native(ref, ref, SR)
    nb = nb_pesq_native(ref, ref, SR)
    assert wb > 4.55, wb  # P.862.2 logistic saturates at ~4.64
    assert nb > 4.40, nb  # P.862.1 logistic saturates at ~4.55


@pytest.mark.parametrize("scorer", [wb_pesq_native, nb_pesq_native],
                         ids=["wb", "nb"])
def test_mnru_q_ladder(ref, scorer):
    rng = np.random.default_rng(3)
    qs = [5, 15, 25, 35, 45]
    scores = [scorer(ref, mnru(ref, q, rng), SR) for q in qs]
    # strict monotonicity with non-trivial spacing below the saturation knee
    for lo, hi in zip(scores, scores[1:]):
        assert hi > lo, (qs, scores)
    for lo, hi in zip(scores[:3], scores[1:4]):
        assert hi - lo > 0.15, (qs, scores)
    assert scores[0] < 2.4, ("Q=5 dB must score severely degraded", scores)
    assert scores[-1] > 3.6, ("Q=45 dB must score near-transparent", scores)
    assert 1.8 < scores[2] < 4.0, ("Q=25 dB must sit mid-scale", scores)


def test_snr_ladder_white_noise(ref):
    rng = np.random.default_rng(4)
    noise = rng.standard_normal(len(ref))
    sig_rms = np.sqrt(np.mean(ref**2))
    scores = []
    for snr in [0, 10, 20, 30, 40]:
        n = noise * sig_rms / np.sqrt(np.mean(noise**2)) * 10 ** (-snr / 20)
        scores.append(wb_pesq_native(ref, ref + n, SR))
    for lo, hi in zip(scores, scores[1:]):
        assert hi > lo, scores
    assert scores[0] < 2.0, ("0 dB SNR must score severely degraded", scores)
    assert scores[-1] > 3.4, ("40 dB SNR must score near-transparent", scores)


def test_level_alignment_invariance(ref):
    rng = np.random.default_rng(5)
    deg = mnru(ref, 25, rng)
    base = wb_pesq_native(ref, deg, SR)
    up = wb_pesq_native(ref, deg * 10 ** (10 / 20), SR)
    down = wb_pesq_native(ref, deg * 10 ** (-10 / 20), SR)
    assert abs(up - base) < 0.25, (base, up)
    assert abs(down - base) < 0.25, (base, down)


def test_bulk_delay_alignment(ref):
    rng = np.random.default_rng(6)
    deg = mnru(ref, 25, rng)
    delayed = np.concatenate([np.zeros(int(0.05 * SR)), deg])[: len(deg)]
    base = wb_pesq_native(ref, deg, SR)
    shifted = wb_pesq_native(ref, delayed, SR)
    assert abs(shifted - base) < 0.25, (base, shifted)
