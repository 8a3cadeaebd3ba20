#!/usr/bin/env python
"""Corpus curation: walk wav dirs / csv manifests, filter by clipping,
activity, duration (and optionally RT60 for RIRs), accumulate up to a target
number of hours, and write accept/reject manifests.

Implements the reference's preprocess_dataset.py:81-175 with the filters
actually wired up (they were hardcoded to 0 there -- SURVEY.md §2.7).
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def collect_candidates(sources):
    files = []
    for src in sources:
        p = Path(src).expanduser()
        if p.is_dir():
            files.extend(sorted(str(f) for f in p.rglob("*.wav")))
        elif p.suffix == ".csv":
            with open(p) as fh:
                for row in csv.reader(fh):
                    if row:
                        files.append(row[0])
        else:
            files.append(str(p))
    return files


def main():
    from cruse_tpu.data.wavio import read_wav
    from cruse_tpu.data.manifest import write_manifest
    from cruse_tpu.dsp.features import activity_detector, is_clipped

    parser = argparse.ArgumentParser(description="corpus curation")
    parser.add_argument("sources", nargs="+", help="wav dirs / csv manifests / wav files")
    parser.add_argument("--out", required=True, help="output manifest txt")
    parser.add_argument("--reject-out", default=None, help="rejected-files manifest")
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--total-hrs", type=float, default=None, help="stop after this much audio")
    parser.add_argument("--min-seconds", type=float, default=1.0)
    parser.add_argument("--max-seconds", type=float, default=60.0)
    parser.add_argument("--min-activity", type=float, default=0.0, help="min active fraction [0,1]")
    parser.add_argument("--allow-clipped", action="store_true")
    parser.add_argument(
        "--max-rt60", type=float, default=None,
        help="for RIR corpora: reject impulse responses whose 1 kHz-band RT60 "
             "exceeds this many seconds (the reference's sketched-but-unwired "
             "RT60 filter, preprocess_dataset.py:130-148); unestimable RT60s "
             "(no decay segment) are rejected too")
    parser.add_argument(
        "--rt60-band", type=float, default=1000.0,
        help="octave band center (Hz) for --max-rt60; 0 = broadband")
    args = parser.parse_args()

    accepted, rejected = [], []
    total_sec = 0.0
    rt60s = []
    for f in collect_candidates(args.sources):
        try:
            wav, sr = read_wav(f, sr=args.sr)
        except Exception as e:
            rejected.append(f"{f}  # unreadable: {e}")
            continue
        dur = len(wav) / sr
        if not (args.min_seconds <= dur <= args.max_seconds):
            rejected.append(f"{f}  # duration {dur:.2f}s")
            continue
        if not args.allow_clipped and bool(is_clipped(wav)):
            rejected.append(f"{f}  # clipped")
            continue
        if args.min_activity > 0 and activity_detector(wav, fs=sr) < args.min_activity:
            rejected.append(f"{f}  # inactive")
            continue
        if args.max_rt60 is not None:
            from cruse_tpu.dsp.rt60 import estimate_rt60

            rt60 = estimate_rt60(wav if wav.ndim == 1 else wav[0], sr,
                                 band=args.rt60_band or None)
            if not np.isfinite(rt60):
                rejected.append(f"{f}  # rt60 unestimable")
                continue
            if rt60 > args.max_rt60:
                rejected.append(f"{f}  # rt60 {rt60:.2f}s")
                continue
            rt60s.append(rt60)
        accepted.append(f)
        total_sec += dur
        if args.total_hrs and total_sec / 3600.0 >= args.total_hrs:
            break

    write_manifest(accepted, args.out)
    if args.reject_out:
        write_manifest(rejected, args.reject_out)
    print(
        f"accepted {len(accepted)} files ({total_sec / 3600.0:.2f} h), "
        f"rejected {len(rejected)} -> {args.out}"
    )
    if rt60s:
        v = np.asarray(rt60s)
        print(
            f"accepted RT60 ({args.rt60_band or 'broadband'} Hz band): "
            f"mean {v.mean():.2f}s median {np.median(v):.2f}s "
            f"p90 {np.percentile(v, 90):.2f}s"
        )


if __name__ == "__main__":
    main()
