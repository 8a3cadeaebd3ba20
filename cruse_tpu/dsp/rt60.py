"""RT60 estimation from room impulse responses.

Octave-band linear-regression RT60 (utils/utils.py:270-342 behavior): filter
the RIR into octave bands, compute the Schroeder energy-decay curve, fit a
line on the [-5, -25] dB segment and extrapolate to -60 dB.
"""
from __future__ import annotations

import numpy as np
from scipy import signal as sps

OCTAVE_CENTERS = (125.0, 250.0, 500.0, 1000.0, 2000.0, 4000.0)


def _octave_band(rir: np.ndarray, center: float, sr: int) -> np.ndarray:
    lo = center / np.sqrt(2.0)
    hi = min(center * np.sqrt(2.0), 0.95 * sr / 2)
    sos = sps.butter(4, [lo, hi], btype="bandpass", fs=sr, output="sos")
    return sps.sosfiltfilt(sos, rir)


def schroeder_decay_db(rir: np.ndarray) -> np.ndarray:
    """Backward-integrated energy decay curve in dB (normalized to 0 dB)."""
    energy = np.cumsum(rir[::-1] ** 2)[::-1]
    energy = energy / (energy[0] + 1e-20)
    return 10.0 * np.log10(energy + 1e-20)


def estimate_rt60(rir: np.ndarray, sr: int = 16000, band: float | None = 1000.0,
                  fit_range=(-5.0, -25.0)) -> float:
    """RT60 seconds for one octave band (or broadband when band is None)."""
    x = _octave_band(np.asarray(rir, np.float64), band, sr) if band else np.asarray(rir, np.float64)
    edc = schroeder_decay_db(x)
    hi, lo = fit_range
    idx = np.where((edc <= hi) & (edc >= lo))[0]
    if len(idx) < 8:
        return float("nan")
    t = idx / sr
    slope, intercept = np.polyfit(t, edc[idx], 1)
    if slope >= 0:
        return float("nan")
    return float(-60.0 / slope)


def rt60_by_band(rir: np.ndarray, sr: int = 16000) -> dict:
    """Per-octave-band RT60s (cal_rt60 behavior)."""
    return {c: estimate_rt60(rir, sr, c) for c in OCTAVE_CENTERS}


def corpus_rt60_statistics(rir_paths, sr: int = 16000, band: float = 1000.0):
    """RT60 stats across a RIR corpus (statist_rt60, utils/utils.py:323-342).
    Returns (values ndarray, summary dict)."""
    from cruse_tpu.data.wavio import read_wav

    values = []
    for p in rir_paths:
        try:
            wav, _ = read_wav(p, sr=sr)
            if wav.ndim == 2:
                wav = wav[0]
            v = estimate_rt60(wav, sr, band)
            if np.isfinite(v):
                values.append(v)
        except Exception:
            continue
    values = np.asarray(values)
    summary = {
        "count": int(len(values)),
        "mean": float(values.mean()) if len(values) else float("nan"),
        "median": float(np.median(values)) if len(values) else float("nan"),
        "p90": float(np.percentile(values, 90)) if len(values) else float("nan"),
    }
    return values, summary


def suppress_late_reflections(rir: np.ndarray, sr: int, rt60: float, offset_ms: float = 5.0):
    """Impose an exponential decay envelope after the direct path
    (testRandSecFilter.py:144-156 `suppress_late` intent)."""
    direct = int(np.argmax(np.abs(rir)))
    start = direct + int(offset_ms * sr / 1000.0)
    n = len(rir)
    decay_rate = 3.0 * np.log(10.0) / max(rt60, 1e-3)  # -60 dB over rt60 s
    t = np.arange(n)
    env = np.where(t <= start, 1.0, np.exp(-decay_rate * (t - start) / sr))
    return rir * env
