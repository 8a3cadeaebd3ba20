"""XLA compiler-option sweep over the production windowed MTFAA train step.

The FLOOR.md gap analysis attributes ~a third of the config-5 headroom to
graph integration (what XLA fuses with what, scheduling) rather than
formulation; compiler options are the one lever on that axis that needs no
model rewrite. XLA_FLAGS cannot carry TPU options here (the axon tunnel
client parses flags locally and aborts on TPU-only names), but per-compile
``compiler_options`` ARE forwarded to the remote compiler — this sweep
AOT-lowers the production step loop once and compiles it under each
candidate option set.

Usage: python scripts/flag_sweep.py [name ...]   # default: all
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_cache = os.environ.get("CRUSE_TPU_TEST_CACHE", "/root/.cache/cruse_tpu_jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cruse_tpu.dsp.stft import StftConfig, stft
from cruse_tpu.models import MtfaaNet
from cruse_tpu.models.mtfaa import MtfaaConfig
from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step, forward_for_model

B, SECONDS, ITERS = 16, 10, 4
SR = 16000

CANDIDATES = {
    "baseline": {},
    # bigger scoped VMEM -> larger fusion clusters (v5e has 128 MiB VMEM)
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # small-K dots (c_att=6..12, C=4..48) get strength-reduced off the MXU
    "no_dot_sr": {"xla_tpu_enable_dot_strength_reduction": "false"},
    "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    # reduce-window/broadcast fusion (softmax/reduce chains)
    "no_rwb": {"xla_tpu_rwb_fusion": "false"},
    "licm2": {"xla_tpu_licm_size_inflation_ratio": "2"},
    "vmem64_nosr": {"xla_tpu_scoped_vmem_limit_kib": "65536",
                    "xla_tpu_enable_dot_strength_reduction": "false"},
}


def build_loop():
    scfg = StftConfig(n_fft=512, hop_length=256)
    model = MtfaaNet(MtfaaConfig(attention_window=126))
    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.standard_normal((B, SECONDS * SR)).astype(np.float32) * 0.05)
    noisy = clean + jnp.asarray(
        rng.standard_normal((B, SECONDS * SR)).astype(np.float32) * 0.05)
    spec = stft(noisy, scfg)
    feat = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    cfg = StepConfig(stft=scfg, compute_dtype="bfloat16",
                     loss_weights=(("si_snr", 1.0), ("spec", 1.0)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = make_train_step(model, cfg, forward=forward_for_model(model))

    def loop(noisy, clean, state):
        def body(i, carry):
            st, acc = carry
            st, m = step(st, {"noisy": noisy + 1e-6 * acc, "clean": clean})
            return st, m["grad_norm"]
        _, acc = lax.fori_loop(0, ITERS, body, (state, jnp.float32(0.0)))
        return acc

    lowered = jax.jit(loop).lower(noisy, clean, state)
    return lowered, (noisy, clean, state)


def measure(compiled, args):
    noisy, clean, state = args
    float(np.asarray(compiled(noisy, clean, state)))
    times = []
    for rep in range(3):
        fresh = noisy * (1.0 + 1e-4 * (rep + 1))
        float(fresh.ravel()[0])
        t0 = time.perf_counter()
        float(np.asarray(compiled(fresh, clean, state)))
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS


if __name__ == "__main__":
    names = sys.argv[1:] or list(CANDIDATES)
    lowered, args = build_loop()
    for name in names:
        opts = CANDIDATES[name]
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts or None)
            ct = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"{name:14s} COMPILE FAILED: {type(e).__name__} {str(e)[:200]}",
                  flush=True)
            continue
        dt = measure(compiled, args)
        print(f"{name:14s} {dt * 1e3:7.1f} ms/step  ({B * SECONDS / dt:6.0f}x RT)"
              f"  [compile {ct:.0f}s]", flush=True)
