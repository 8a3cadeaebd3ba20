"""Which MTFAA component dominates the training step? Variant timing on-chip.

Timing rules (learned the hard way): identical executions are cached by the
tunneled runtime, so every rep must see fresh inputs AND the on-device loop
must create a sequential data dependence (output feeds the next input).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# persistent compile cache: variant sweeps re-run across invocations
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


def _data():
    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.standard_normal((B, SECONDS * SR)).astype(np.float32) * 0.05)
    noisy = clean + jnp.asarray(
        rng.standard_normal((B, SECONDS * SR)).astype(np.float32) * 0.05
    )
    return noisy, clean


def _time3(loop, *args):
    # float() forces a real device round trip -- on the tunneled runtime
    # block_until_ready alone can return early (see bench.py)
    float(loop(*args))
    times = []
    for rep in range(3):
        fresh = (args[0] * (1.0 + 1e-4 * (rep + 1)),) + args[1:]
        float(fresh[0].ravel()[0])
        t0 = time.perf_counter()
        float(loop(*fresh))
        times.append(time.perf_counter() - t0)
    return min(times)


def measure_train(name, mcfg, loss_weights=(("si_snr", 1.0), ("spec", 1.0)),
                  remat=None, b=B, seconds=SECONDS):
    scfg = StftConfig(n_fft=512, hop_length=256)
    model = MtfaaNet(mcfg)
    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.standard_normal((b, seconds * SR)).astype(np.float32) * 0.05)
    noisy = clean + jnp.asarray(
        rng.standard_normal((b, seconds * SR)).astype(np.float32) * 0.05
    )
    spec = stft(noisy, scfg)
    feat = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    cfg = StepConfig(stft=scfg, compute_dtype="bfloat16", loss_weights=loss_weights,
                     remat=remat)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = make_train_step(model, cfg, forward=forward_for_model(model))

    @jax.jit
    def loop(noisy, clean, state):
        def body(i, carry):
            st, acc = carry
            st, m = step(st, {"noisy": noisy + 1e-6 * acc, "clean": clean})
            return st, m["grad_norm"]
        _, acc = lax.fori_loop(0, ITERS, body, (state, jnp.float32(0.0)))
        return acc

    dt = _time3(loop, noisy, clean, state)
    print(f"{name:44s} {b * seconds * ITERS / dt:10.0f}x RT  ({dt / ITERS * 1e3:7.1f} ms/step)",
          flush=True)


def measure_forward(name, mcfg):
    scfg = StftConfig(n_fft=512, hop_length=256)
    model = MtfaaNet(mcfg)
    noisy, _ = _data()
    spec = stft(noisy, scfg)
    feat = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    cfg = StepConfig(stft=scfg)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    fwd = forward_for_model(model)

    @jax.jit
    def loop(feat, params, stats):
        def body(i, carry):
            acc, x = carry
            out, _ = fwd(params, stats, x, train=False)
            return acc + out[0, 0, 0, 0], x + 1e-6 * out
        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), feat))
        return acc

    dt = _time3(loop, feat, state.params, state.batch_stats)
    print(f"{name:44s} {B * SECONDS * ITERS / dt:10.0f}x RT  ({dt / ITERS * 1e3:7.1f} ms/fwd)",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "base"
    if which == "base":
        base = MtfaaConfig()
        measure_forward("forward only (base)", base)
        measure_train("train base (si_snr+spec)", base)
        measure_train("train si_snr only", base, loss_weights=(("si_snr", 1.0),))
        measure_train("train no deep filter", MtfaaConfig(use_deep_filter=False))
        measure_train("train tfcm_layers=2", MtfaaConfig(tfcm_layers=2))
        measure_train("train channels=(16,24,32)", MtfaaConfig(channels=(16, 24, 32)))
    elif which.startswith("r3"):
        # round-3 breakdown: ASA impl/window ablations + subtractive TFCM.
        # Each variant compiles a full train-step graph (minutes on this
        # 1-core host) -> select one by index: `r3:0` .. `r3:5`.
        variants = [
            ("train asa xla, full causal", MtfaaConfig(asa_impl="xla")),
            ("train asa flash, full causal", MtfaaConfig(asa_impl="flash")),
            ("train asa xla, w=126", MtfaaConfig(asa_impl="xla", attention_window=126)),
            ("train asa flash, w=126", MtfaaConfig(asa_impl="flash", attention_window=126)),
            ("train tfcm_layers=0 (xla asa)", MtfaaConfig(asa_impl="xla", tfcm_layers=0)),
            ("train tfcm_layers=1 (xla asa)", MtfaaConfig(asa_impl="xla", tfcm_layers=1)),
            # remat: the roofline showed the step is HBM-bandwidth bound at
            # 1.5% MXU -- trade recompute for residual traffic
            ("train remat=all, full causal", MtfaaConfig(asa_impl="xla"), None, "all"),
            ("train remat=dots, full causal", MtfaaConfig(asa_impl="xla"), None, "dots"),
            ("train remat=all, w=126", MtfaaConfig(asa_impl="xla", attention_window=126), None, "all"),
            ("train remat=dots, w=126", MtfaaConfig(asa_impl="xla", attention_window=126), None, "dots"),
        ]
        sel = [int(which.split(":", 1)[1])] if ":" in which else range(len(variants))
        for i in sel:
            v = variants[i]
            if len(v) == 4:
                measure_train(v[0], v[1], remat=v[3])
            else:
                measure_train(v[0], v[1])
    elif which.startswith("r5"):
        # round-5: does per-block jax.checkpoint (tfcm_remat) stack with the
        # fused_fold custom-VJP path? Both attack the same defusion problem
        # (param-grad reductions becoming separate HBM passes at full-graph
        # scale) from different ends. All variants are the windowed
        # production configuration.
        variants = [
            ("train w=126 fused_fold (prod)",
             MtfaaConfig(attention_window=126)),
            ("train w=126 fused_fold + tfcm_remat",
             MtfaaConfig(attention_window=126, tfcm_remat=True)),
            ("train w=126 xla dw + tfcm_remat",
             MtfaaConfig(attention_window=126, tfcm_dw_impl="xla",
                         tfcm_remat=True)),
            ("train w=126 xla dw",
             MtfaaConfig(attention_window=126, tfcm_dw_impl="xla")),
            ("train w=126 + asa_remat",
             MtfaaConfig(attention_window=126, asa_remat=True)),
            ("train w=126 fused_fold_merged",
             MtfaaConfig(attention_window=126,
                         tfcm_dw_impl="fused_fold_merged")),
            ("train w=126 fused_fold (hist-DUS fix)",
             MtfaaConfig(attention_window=126)),
        ]
        sel = [int(which.split(":", 1)[1])] if ":" in which else range(len(variants))
        for i in sel:
            name, mcfg = variants[i]
            measure_train(name, mcfg)
    elif which.startswith("crop"):
        # crop-length sweep: same total audio per step (160 s), shorter
        # crops (the reference trains on ~3 s crops) -> full-causal
        # attention cost per audio-second scales with T
        i = int(which.split(":", 1)[1]) if ":" in which else None
        crops = [
            ("train full causal, B=32 x 5s", MtfaaConfig(asa_impl="xla"), 32, 5),
            ("train full causal, B=53 x 3s", MtfaaConfig(asa_impl="xla"), 53, 3),
            ("train w=126, B=32 x 5s",
             MtfaaConfig(asa_impl="xla", attention_window=126), 32, 5),
            ("train w=126, B=53 x 3s",
             MtfaaConfig(asa_impl="xla", attention_window=126), 53, 3),
        ]
        for j, (name, mcfg, b, sec) in enumerate(crops):
            if i is None or i == j:
                measure_train(name, mcfg, b=b, seconds=sec)
