#!/usr/bin/env python
"""Validate the native P.862 pipelines against the ITU `pesq` binary.

Runs a deterministic degradation sweep — SNRs x noise colors x delays x
clipping x mu-law — scores every condition with the native WB/NB pipelines
(metrics/pesq_native.py) and, when the external `pesq` package is importable,
with the ITU binary, then prints per-condition MOS-LQO deltas and the
Spearman rank correlation between the two scorers.

The package is absent from the build image by design (reference dependency,
train_base/metrics.py:89-108), so in-image runs print the native-only table;
run this ANYWHERE the package exists (`pip install pesq`) to produce the
validation table the native scores' calibration claims rest on:

    python tools/validate_pesq.py            # both modes
    python tools/validate_pesq.py --mode wb  # wideband only
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 16000


def speechlike(rng, seconds=4.0, sr=SR):
    """Deterministic speech-shaped test signal: pitch-harmonic carrier with
    syllabic (4 Hz) + phonetic (20 Hz) amplitude modulation and formant-ish
    spectral tilt, plus silence gaps (PESQ needs inactive frames too)."""
    t = np.arange(int(seconds * sr)) / sr
    f0 = 120.0 + 15.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    x = np.zeros_like(t)
    for h, a in ((1, 1.0), (2, 0.6), (3, 0.45), (4, 0.3), (6, 0.15), (8, 0.08)):
        x += a * np.sin(h * phase + rng.uniform(0, 6))
    syllabic = 0.55 * (1 + np.sin(2 * np.pi * 4.0 * t + rng.uniform(0, 6)))
    phonetic = 0.75 + 0.25 * np.sin(2 * np.pi * 20.0 * t + rng.uniform(0, 6))
    x = x * syllabic * phonetic
    # silence gaps every ~1.3 s
    gap = (np.sin(2 * np.pi * t / 1.3) > 0.92)
    x[gap] *= 0.02
    return (0.25 * x / np.max(np.abs(x))).astype(np.float64)


def colored_noise(rng, n, color):
    w = rng.standard_normal(n)
    if color == "white":
        return w
    spec = np.fft.rfft(w)
    f = np.maximum(np.fft.rfftfreq(n, 1 / SR), 1.0)
    if color == "pink":
        spec = spec / np.sqrt(f)
    elif color == "brown":
        spec = spec / f
    elif color == "babble":  # speech-band-weighted noise
        spec = spec * np.exp(-((np.log(f / 500.0)) ** 2))
    return np.fft.irfft(spec, n)


def degrade(ref, rng):
    """Yield (condition_name, degraded) pairs, mildest to harshest per axis."""
    n = len(ref)
    rms = np.sqrt(np.mean(ref**2))
    for color in ("white", "pink", "babble"):
        noise = colored_noise(rng, n, color)
        noise = noise / np.sqrt(np.mean(noise**2))
        for snr in (40, 30, 20, 10, 5, 0):
            yield f"{color}+{snr:02d}dB", ref + noise * rms * 10 ** (-snr / 20)
    for ms in (8, 32):
        d = int(SR * ms / 1000)
        yield f"delay+{ms}ms", np.concatenate([np.zeros(d), ref[:-d]])
    for frac in (0.5, 0.25, 0.1):
        thr = frac * np.max(np.abs(ref))
        yield f"clip@{frac}", np.clip(ref, -thr, thr)
    # mu-law codec roundtrip (quantization distortion)
    for mu in (255, 63, 15):
        comp = np.sign(ref) * np.log1p(mu * np.abs(ref) / 0.5) / np.log1p(mu)
        q = np.round(comp * 64) / 64
        yield f"mulaw{mu}", np.sign(q) * 0.5 * (np.expm1(np.abs(q) * np.log1p(mu))) / mu
    # lowpass filtering (bandwidth loss)
    from scipy.signal import butter, sosfilt

    for fc in (5000, 3000, 1500):
        yield f"lp{fc}", sosfilt(butter(6, fc, fs=SR, output="sos"), ref)


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean(); rb -= rb.mean()
    return float(np.dot(ra, rb) / np.sqrt(np.dot(ra, ra) * np.dot(rb, rb) + 1e-12))


def pmos_table(seconds: float) -> None:
    """PMOS calibration table (round-4 VERDICT item 5): score the SAME
    degradation sweep with PMOS, the native WB/NB PESQ pipelines, and
    native STOI, and print rank/linear correlations. PMOS drives no model
    selection (the validator scores WB_PESQ directly), but its weight in
    quick-look workflows should rest on published evidence, not vibes."""
    from cruse_tpu.metrics.pmos import pmos
    from cruse_tpu.metrics.pesq_native import nb_pesq_native, wb_pesq_native
    from cruse_tpu.metrics.stoi import stoi

    rng = np.random.default_rng(2026)
    ref = speechlike(rng, seconds)
    conds = [("identity", ref.copy())] + list(degrade(ref, np.random.default_rng(7)))
    names, p_list, wb_list, nb_list, st_list = [], [], [], [], []
    print("== PMOS calibration vs native WB/NB PESQ + STOI ==")
    print(f"  {'condition':14s} {'PMOS':>6s} {'WB':>6s} {'NB':>6s} {'STOI':>6s}")
    for name, deg in conds:
        s_p = pmos(ref, deg, sr=SR)
        s_wb = wb_pesq_native(ref, deg, sr=SR)
        s_nb = nb_pesq_native(ref, deg, sr=SR)
        s_st = stoi(ref, deg, sr=SR)
        names.append(name)
        p_list.append(s_p); wb_list.append(s_wb)
        nb_list.append(s_nb); st_list.append(s_st)
        print(f"  {name:14s} {s_p:6.3f} {s_wb:6.3f} {s_nb:6.3f} {s_st:6.3f}",
              flush=True)
    p = np.array(p_list)
    for label, other in (("WB_PESQ", np.array(wb_list)),
                         ("NB_PESQ", np.array(nb_list)),
                         ("STOI", np.array(st_list))):
        rho = spearman(p, other)
        pc = float(np.corrcoef(p, other)[0, 1])
        print(f"  -> PMOS vs {label:8s}: Spearman {rho:.3f}, Pearson {pc:.3f}")
    # per-axis monotonicity: within each SNR ladder PMOS must order
    # conditions like WB_PESQ does (the quick-look use case)
    for color in ("white", "pink", "babble"):
        idx = [i for i, n in enumerate(names) if n.startswith(color)]
        sub_p, sub_wb = p[idx], np.array(wb_list)[idx]
        rho = spearman(sub_p, sub_wb)
        print(f"  -> {color} SNR ladder: PMOS-vs-WB Spearman {rho:.3f}")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--mode", choices=("wb", "nb", "both"), default="both")
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--pmos", action="store_true",
                    help="print the PMOS-vs-native-PESQ/STOI calibration "
                         "table instead of the ITU validation sweep")
    args = ap.parse_args()
    if args.pmos:
        pmos_table(args.seconds)
        return

    from cruse_tpu.metrics.pesq_native import nb_pesq_native, wb_pesq_native

    try:
        from pesq import pesq as itu_pesq

        have_itu = True
    except ImportError:
        have_itu = False

    rng = np.random.default_rng(2026)
    ref = speechlike(rng, args.seconds)
    modes = ("wb", "nb") if args.mode == "both" else (args.mode,)
    overall_ok = True
    for mode in modes:
        native = wb_pesq_native if mode == "wb" else nb_pesq_native
        print(f"\n== {mode.upper()} ==  (native pipeline"
              + (", ITU binary" if have_itu else "; ITU `pesq` package ABSENT — "
                 "install it to produce the validation columns") + ")")
        rows, nat, itu = [], [], []
        conds = [("identity", ref.copy())] + list(degrade(ref, np.random.default_rng(7)))
        for name, deg in conds:
            s_nat = native(ref, deg, sr=SR)
            row = f"  {name:14s} native {s_nat:5.3f}"
            if have_itu:
                s_itu = float(itu_pesq(SR if mode == "wb" else 8000,
                                       _maybe_resample(ref, mode),
                                       _maybe_resample(deg, mode), mode))
                row += f"  itu {s_itu:5.3f}  delta {s_nat - s_itu:+6.3f}"
                nat.append(s_nat); itu.append(s_itu)
            rows.append(row)
            print(row, flush=True)
        if have_itu:
            rho = spearman(np.array(nat), np.array(itu))
            mad = float(np.mean(np.abs(np.array(nat) - np.array(itu))))
            print(f"  -> rank correlation (Spearman) {rho:.3f}, "
                  f"mean |delta| {mad:.3f} MOS-LQO over {len(nat)} conditions")
            overall_ok &= rho > 0.9
    if have_itu:
        print("\nVALIDATION " + ("PASSED (rho > 0.9 both modes)" if overall_ok
                                 else "FAILED: rank correlation below 0.9"))
        sys.exit(0 if overall_ok else 1)


def _maybe_resample(x, mode):
    if mode == "nb":
        from scipy.signal import resample_poly

        return resample_poly(x, 1, 2)
    return x


if __name__ == "__main__":
    main()
