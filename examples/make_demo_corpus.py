#!/usr/bin/env python
"""Generate the richer synthetic corpus used by configs/demo_bf16.toml
(/tmp/corpus2): harmonic speech-like clips with varied f0/modulation plus
white/pink/babble noise."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(root: str = "/tmp/corpus2"):
    from cruse_tpu.data.wavio import write_wav
    from cruse_tpu.data.manifest import write_manifest

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(11)
    sr = 16000

    def speechish(n, f0):
        t = np.arange(n) / sr
        env = np.clip(
            np.sin(2 * np.pi * rng.uniform(1.5, 4) * t + rng.uniform(0, 6))
            + 0.3 * np.sin(2 * np.pi * rng.uniform(0.2, 0.6) * t),
            0, None,
        )
        tones = sum(
            np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6)) / k**0.5
            for k in (1, 2, 3, 4, 6)
        )
        return (env * tones * 0.15).astype(np.float32)

    def noisy(n, kind):
        x = rng.standard_normal(n)
        if kind == "pink":
            spec = np.fft.rfft(x)
            f = np.maximum(np.fft.rfftfreq(n, 1 / sr), 1.0)
            x = np.fft.irfft(spec / np.sqrt(f), n)
        elif kind == "babble":
            x = sum(speechish(n, rng.uniform(100, 300)) for _ in range(4))
        return (x / (np.abs(x).max() + 1e-9) * 0.3).astype(np.float32)

    clean, noise = [], []
    for i in range(24):
        p = f"{root}/clean_{i}.wav"
        write_wav(p, speechish(4 * sr, rng.uniform(90, 320)), sr)
        clean.append(p)
    for i, kind in enumerate(["white", "pink", "babble"] * 6):
        p = f"{root}/noise_{i}.wav"
        write_wav(p, noisy(4 * sr, kind), sr)
        noise.append(p)
    write_manifest(clean[:20], f"{root}/clean_train.txt")
    write_manifest(clean[20:], f"{root}/clean_valid.txt")
    write_manifest(noise[:15], f"{root}/noise_train.txt")
    write_manifest(noise[15:], f"{root}/noise_valid.txt")
    print(f"demo corpus + manifests written under {root}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus2")
