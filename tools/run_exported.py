#!/usr/bin/env python
"""Enhance wavs from an exported artifact ALONE — no config, no checkpoint,
no model code. The consumer half of the deployment story (the reference
exports ONNX blobs its serving hosts run without the training stack,
reference test/test_model.py:348-379): `tools/export.py` writes the
container, this runner loads it and serves audio through it.

  offline artifact:   each wav is padded to the exported [B, L] window,
                      enhanced in groups of B, trimmed, written.
  streaming artifact: wavs stream hop-by-hop through the exported per-hop
                      step with the exported no-arg init graph supplying the
                      opaque carried state; B files ride per dispatch.
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _groups(seq, n):
    for i in range(0, len(seq), n):
        yield seq[i : i + n]


def main():
    parser = argparse.ArgumentParser(description="run an exported enhancement artifact")
    parser.add_argument("-A", "--artifact", required=True, help="*.jaxexport container from tools/export.py")
    parser.add_argument("-I", "--input", required=True, help="Dir of wavs or manifest txt.")
    parser.add_argument("-O", "--output_dir", required=True, help="Where to write enhanced wavs.")
    args = parser.parse_args()
    from cruse_tpu.utils.cache import maybe_enable_compile_cache

    maybe_enable_compile_cache()  # CRUSE_TPU_COMPILE_CACHE=1 opt-in

    import numpy as np
    import jax.numpy as jnp

    from cruse_tpu.data.manifest import load_manifest
    from cruse_tpu.data.wavio import read_wav, write_wav, to_int16_scaled
    from cruse_tpu.infer import artifact as artifact_lib
    from cruse_tpu.utils.logger import log

    art = artifact_lib.load(args.artifact)
    meta = art.meta
    sr = int(meta.get("sr", 16000))
    num_mics = meta.get("num_mics")
    log(f"loaded {meta.get('kind', 'offline')} artifact "
        f"({meta.get('model', 'unknown model')}, sr={sr}"
        + (f", mics={num_mics}" if num_mics else "") + ")")

    inp = Path(args.input)
    files = load_manifest(str(inp)) if inp.is_file() else sorted(str(p) for p in inp.glob("*.wav"))
    assert files, f"no wavs found under {inp}"
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    def _read(f):
        wav, _ = read_wav(f, sr=sr, mono=num_mics is None)
        if num_mics is not None:
            assert wav.ndim == 2 and wav.shape[0] == num_mics, (
                f"{f}: artifact expects {num_mics}-mic wavs, got shape {wav.shape}")
        return wav

    if art.kind == "offline":
        batch, length = art.input_shape
        for group in _groups(files, batch):
            wavs = [_read(f) for f in group]
            for f, w in zip(group, wavs):
                if w.shape[-1] > length:
                    raise SystemExit(
                        f"{f}: {w.shape[-1]} samples > exported window {length}; "
                        "re-export with a larger --seconds or use a --streaming "
                        "artifact for unbounded-length audio")
            x = np.zeros((batch, length), np.float32)
            for i, w in enumerate(wavs):
                x[i, : w.shape[-1]] = w
            t0 = time.time()
            out = np.asarray(art.enhance(jnp.asarray(x)))
            dt = time.time() - t0
            for f, w, y in zip(group, wavs, out):
                write_wav(str(out_dir / f"{Path(f).stem}.wav"),
                          to_int16_scaled(y[: w.shape[-1]]), sr)
            log(f"enhanced {len(group)} files, rtf: {dt / (batch * length / sr):.4f}")
    else:  # streaming
        hop_shape = art.hop_shape
        batch, hop = hop_shape[0], hop_shape[-1]
        # priming the analysis buffer with the first n_fft-hop samples makes
        # output sample j correspond to input sample j (same contract as
        # tools/infer.py --streaming); without it the stream is delayed by
        # n_fft-hop samples and the trimmed output loses its final hop
        prime_len = int(meta["n_fft"]) - hop if "n_fft" in meta else 0
        for group in _groups(files, batch):
            wavs = [_read(f) for f in group]
            max_len = max(w.shape[-1] for w in wavs)
            # ceil so the zero-padded feed covers every input sample
            n_hops = max(-(-(max_len - prime_len) // hop), 1)
            feed_len = prime_len + n_hops * hop
            feed_shape = ((batch, num_mics, feed_len) if num_mics
                          else (batch, feed_len))
            x = np.zeros(feed_shape, np.float32)
            for i, w in enumerate(wavs):
                n = min(w.shape[-1], feed_len)
                x[i, ..., :n] = w[..., :n]
            state = art.init_state()
            if prime_len:
                state = art.prime(state, jnp.asarray(x[..., :prime_len]))
            outs = []
            t0 = time.time()
            for h in range(n_hops):
                lo = prime_len + h * hop
                o, state = art.step(state, jnp.asarray(x[..., lo : lo + hop]))
                outs.append(np.asarray(o))
            dt = time.time() - t0
            out = np.concatenate(outs, axis=-1)  # [B, n_hops*hop]
            for f, w, y in zip(group, wavs, out):
                write_wav(str(out_dir / f"{Path(f).stem}.wav"),
                          to_int16_scaled(y[: min(w.shape[-1], out.shape[-1])]), sr)
            log(f"streamed {len(group)} files x {n_hops} hops, "
                f"per-stream rtf: {dt / (n_hops * hop / sr):.4f}")


if __name__ == "__main__":
    main()
