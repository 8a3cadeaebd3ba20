"""Benchmark: CRUSE enhancement throughput on one TPU chip.

Prints ONE JSON line: audio-seconds enhanced per wall-second per chip
(real-time factor at 16 kHz). Baseline target: 5000x (BASELINE.md).

Methodology: the host<->device tunnel costs ~1s per call, so the benchmark
runs ITERS full enhancement passes on-device inside one `lax.fori_loop`
(carrying a checksum so nothing is dead-code-eliminated) and divides total
enhanced audio by wall time. STFT -> CRUSE mask -> iSTFT, the same path as
`__graft_entry__.entry`.
"""
from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import os

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
SECONDS = 10
SR = 16000
ITERS = 20
BASELINE_X_REALTIME = 5000.0
MODEL = os.environ.get("BENCH_MODEL", "cruse")  # cruse | cruse_df | dfsmn
DTYPE = os.environ.get("BENCH_DTYPE", "bf16")  # bf16 model compute (fp32 DSP);
# set fp32 for the bit-parity configuration (tests/test_e2e_parity.py)


def _build(cfg):
    """Returns (label, enhance_fn(variables, wav), variables)."""
    from cruse_tpu.dsp.stft import stft, istft
    from cruse_tpu.models import CruseNet, CruseConfig, DfsmnNet

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((BATCH, SECONDS * SR)).astype(np.float32) * 0.1)
    if MODEL == "cruse_df":
        from cruse_tpu.models.cruse_df import CruseDfConfig, CruseDfNet, apply_cruse_df

        mcfg = CruseDfConfig()
        model = CruseDfNet(mcfg)
        feat = model.compress(jnp.abs(stft(wav, cfg)))
        variables = model.init(jax.random.PRNGKey(0), feat)

        def enhance(v, noisy):
            spec = stft(noisy, cfg)
            (mask, coefs), _ = model.apply(v, model.compress(jnp.abs(spec)))
            return istft(apply_cruse_df(spec, mask, coefs, mcfg), cfg, length=noisy.shape[-1])

        return "CRUSE+DF", enhance, variables, wav
    if MODEL == "dfsmn":
        model = DfsmnNet(in_freq=161, hidden_dim=256, num_blocks=6, right_frames=0)
        feat = model.compress(jnp.abs(stft(wav, cfg)))
        variables = model.init(jax.random.PRNGKey(0), feat)

        def enhance(v, noisy):
            spec = stft(noisy, cfg)
            mask, _ = model.apply(v, model.compress(jnp.abs(spec)))
            return istft(spec * mask, cfg, length=noisy.shape[-1])

        return "DFSMN", enhance, variables, wav
    model = CruseNet(CruseConfig(in_freq=161))
    feat = model.compress(jnp.abs(stft(wav, cfg)))
    variables = model.init(jax.random.PRNGKey(0), feat)
    if DTYPE == "bf16":
        variables = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), variables)

    def enhance(v, noisy):
        spec = stft(noisy, cfg)  # fp32 DSP
        feat = model.compress(jnp.abs(spec))
        if DTYPE == "bf16":
            feat = feat.astype(jnp.bfloat16)
        mask, _ = model.apply(v, feat)
        return istft(spec * mask.astype(jnp.float32), cfg, length=noisy.shape[-1])

    return f"CRUSE/{DTYPE}", enhance, variables, wav


def main():
    from cruse_tpu.dsp.stft import StftConfig

    cfg = StftConfig(n_fft=320, hop_length=160)
    label, enhance, variables, wav = _build(cfg)

    @jax.jit
    def bench_loop(v, noisy):
        def body(i, carry):
            acc, x = carry
            out = enhance(v, x)
            # feed the output back into the next iteration's input: creates a
            # sequential dependence so XLA cannot hoist the loop body
            return acc + out[0, 0], x + 1e-6 * out
        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), noisy))
        return acc

    # warmup/compile (float() forces a real device round trip -- on the
    # tunneled runtime block_until_ready alone can return early)
    float(bench_loop(variables, wav))

    # time on FRESH inputs each call (identical executions can be cached by
    # the remote runtime); take the best of 3 to shed host/tunnel jitter
    times = []
    for rep in range(3):
        wav_rep = wav * (1.0 + 1e-4 * (rep + 1))
        float(wav_rep[0, 0])
        t0 = time.perf_counter()
        float(bench_loop(variables, wav_rep))
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    audio_sec = BATCH * SECONDS * ITERS
    x_rt = audio_sec / elapsed
    print(
        json.dumps(
            {
                "metric": "audio_sec_enhanced_per_sec_per_chip",
                "value": round(x_rt, 1),
                "unit": f"x realtime @16kHz ({label} + STFT/iSTFT, B={BATCH})",
                "vs_baseline": round(x_rt / BASELINE_X_REALTIME, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
