"""Capture a jax.profiler trace of the production windowed MTFAA train step
(N steps, fresh inputs each) for scripts/trace_lines.py attribution.

Usage: python scripts/trace_step.py [out_dir] [variant]
variant: base (default) | nodf | tfcm0 | noasa | fullcausal
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_cache = os.environ.get("CRUSE_TPU_TEST_CACHE", "/root/.cache/cruse_tpu_jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cruse_tpu.dsp.stft import StftConfig, stft
from cruse_tpu.models import MtfaaNet
from cruse_tpu.models.mtfaa import MtfaaConfig
from cruse_tpu.train.step import (
    StepConfig, init_train_state, make_train_step, forward_for_model,
)

B, SECONDS, SR = 16, 10, 16000

OVERRIDES = {
    "base": {},
    "nodf": {"use_deep_filter": False},
    "tfcm0": {"tfcm_layers": 0},
    "noasa": {"asa_enabled": False},
    "fullcausal": {"attention_window": None},
}


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_step"
    variant = sys.argv[2] if len(sys.argv) > 2 else "base"
    kw = {"attention_window": 126}
    kw.update(OVERRIDES[variant])
    model = MtfaaNet(MtfaaConfig(**kw))
    scfg = StftConfig(n_fft=512, hop_length=256)
    cfg = StepConfig(stft=scfg, compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.standard_normal((B, SECONDS * SR)), jnp.float32) * 0.05
    noisy = clean + jnp.asarray(
        rng.standard_normal((B, SECONDS * SR)), jnp.float32) * 0.05
    spec = stft(noisy, scfg)
    feat = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = jax.jit(make_train_step(model, cfg, forward=forward_for_model(model)))

    # warm (compile outside the trace)
    state2, m = step(state, {"noisy": noisy, "clean": clean})
    float(m["grad_norm"])
    t0 = time.perf_counter()
    with jax.profiler.trace(out):
        st = state
        for i in range(4):
            st, m = step(st, {"noisy": noisy * (1 + 1e-4 * i), "clean": clean})
        float(m["grad_norm"])
    print(f"traced 4 steps in {time.perf_counter() - t0:.2f}s -> {out}")


if __name__ == "__main__":
    main()
