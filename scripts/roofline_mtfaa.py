"""Quantified roofline for BASELINE config 5 (MTFAA end-to-end training).

Uses XLA's own compiled-cost model (jit(...).lower().compile().cost_analysis())
to count the step's FLOPs and HBM bytes, measures the wall time at bench
shapes, and reports achieved FLOP/s and bandwidth against v5e peaks — the
evidence for where the training-throughput floor actually is (VERDICT r2
item 1: replace hand-waving with numbers).

Usage: python scripts/roofline_mtfaa.py [window]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")

# v5e single-chip peaks (public spec: 197 bf16 TFLOP/s, 819 GB/s HBM)
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9
SR = 16000


def build(window=None):
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import MtfaaNet
    from cruse_tpu.models.mtfaa import MtfaaConfig
    from cruse_tpu.train.step import (
        StepConfig, init_train_state, make_train_step, forward_for_model,
    )

    scfg = StftConfig(n_fft=512, hop_length=256)
    b, seconds = 16, 10
    model = MtfaaNet(MtfaaConfig(attention_window=window))
    step_cfg = StepConfig(stft=scfg, compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.standard_normal((b, seconds * SR)).astype(np.float32) * 0.05)
    noisy = clean + jnp.asarray(
        rng.standard_normal((b, seconds * SR)).astype(np.float32) * 0.05
    )
    spec = stft(noisy, scfg)
    feat = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    state = init_train_state(model, step_cfg, jax.random.PRNGKey(0), feat)
    train_step = make_train_step(model, step_cfg, forward=forward_for_model(model))
    return train_step, state, noisy, clean, b * seconds


def main():
    # args: [window|none] [measured_ms_per_step]. When a measured time is
    # given (from scripts/profile_mtfaa.py, same shapes), skip the second
    # whole-loop compile -- a full AOT compile alone takes minutes on this
    # 1-core host.
    window = None
    if len(sys.argv) > 1 and sys.argv[1].lower() not in ("none", "-"):
        window = int(sys.argv[1])
    measured_ms = float(sys.argv[2]) if len(sys.argv) > 2 else None
    train_step, state, noisy, clean, audio_sec = build(window)

    step = jax.jit(train_step)
    lowered = step.lower(state, {"noisy": noisy, "clean": clean})
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = ca.get("flops", float("nan"))
    bytes_hbm = ca.get("bytes accessed", float("nan"))

    if measured_ms is not None:
        per_step = measured_ms / 1e3
    else:
        # measure: 4 steps on device, state threads through
        @jax.jit
        def loop(state, noisy, clean):
            def body(i, carry):
                st, acc = carry
                st, m = train_step(st, {"noisy": noisy + 1e-6 * acc, "clean": clean})
                return st, m["grad_norm"]
            _, acc = lax.fori_loop(0, 4, body, (state, jnp.float32(0.0)))
            return acc

        float(loop(state, noisy, clean))
        times = []
        for rep in range(3):
            n2 = noisy * (1.0 + 1e-4 * (rep + 1))
            jax.block_until_ready(n2)
            t0 = time.perf_counter()
            float(loop(state, n2, clean))
            times.append(time.perf_counter() - t0)
        per_step = min(times) / 4

    x_rt = audio_sec / per_step
    print(f"window={window}")
    print(f"XLA cost model: {flops/1e9:.2f} GFLOP/step, {bytes_hbm/1e9:.2f} GB HBM/step")
    print(f"measured: {per_step*1e3:.1f} ms/step -> {x_rt:.0f}x realtime "
          f"({audio_sec} audio-sec/step)")
    print(f"achieved: {flops/per_step/1e12:.2f} TFLOP/s "
          f"({100*flops/per_step/PEAK_BF16_FLOPS:.1f}% of bf16 peak), "
          f"{bytes_hbm/per_step/1e9:.0f} GB/s "
          f"({100*bytes_hbm/per_step/PEAK_HBM_BPS:.1f}% of HBM peak)")
    print(f"ceilings: compute-bound floor {flops/PEAK_BF16_FLOPS*1e3:.2f} ms "
          f"({audio_sec/(flops/PEAK_BF16_FLOPS):.0f}x RT), "
          f"bandwidth-bound floor {bytes_hbm/PEAK_HBM_BPS*1e3:.2f} ms "
          f"({audio_sec/(bytes_hbm/PEAK_HBM_BPS):.0f}x RT)")
    print(f"arithmetic intensity: {flops/bytes_hbm:.1f} FLOP/byte "
          f"(v5e ridge ~{PEAK_BF16_FLOPS/PEAK_HBM_BPS:.0f})")


if __name__ == "__main__":
    main()
