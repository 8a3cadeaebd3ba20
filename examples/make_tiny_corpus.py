#!/usr/bin/env python
"""Generate the tiny synthetic corpus used by configs/tiny_*.toml drives.

Writes speech-like clean clips + noise clips and manifests under
/tmp/corpus (or the directory given as argv[1]).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(root: str = "/tmp/corpus"):
    from cruse_tpu.data.wavio import write_wav
    from cruse_tpu.data.manifest import write_manifest

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(7)
    sr = 16000

    def speechish(n):
        t = np.arange(n) / sr
        env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t + rng.uniform(0, 6)))
        tones = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 6)) for f in (210, 430, 870))
        return (env * tones / 3 * 0.3).astype(np.float32)

    clean, noise = [], []
    for i in range(6):
        p = f"{root}/clean_{i}.wav"
        write_wav(p, speechish(2 * sr), sr)
        clean.append(p)
        p = f"{root}/noise_{i}.wav"
        write_wav(p, (rng.standard_normal(2 * sr) * 0.1).astype(np.float32), sr)
        noise.append(p)
    write_manifest(clean[:4], f"{root}/clean_train.txt")
    write_manifest(clean[4:], f"{root}/clean_valid.txt")
    write_manifest(noise[:4], f"{root}/noise_train.txt")
    write_manifest(noise[4:], f"{root}/noise_valid.txt")

    # "measured" 3-mic array RIRs (per-mic delay + decaying reflections) for
    # the mc_rir_manifest path (configs/tiny_mc_rir.toml)
    rirs = []
    for i in range(6):
        r = np.zeros((3, 2400), np.float32)
        base = 25 + int(rng.integers(30))
        for m in range(3):
            d = base + 3 * m
            r[m, d] = 0.95
            for j, (off, amp) in enumerate(((250, 0.4), (610, 0.22), (1300, 0.1))):
                r[m, d + off + 7 * m + 11 * j] = amp * (1 - 0.1 * m)
        p = f"{root}/mc_rir_{i}.wav"
        write_wav(p, r, sr)
        rirs.append(p)
    write_manifest(rirs[:4], f"{root}/mc_rir_train.txt")
    write_manifest(rirs[4:], f"{root}/mc_rir_valid.txt")
    print(f"tiny corpus + manifests written under {root}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus")
