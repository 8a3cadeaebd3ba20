"""Round-4: decompose the MTFAA windowed train step into fwd / bwd / loss /
optimizer shares, on-chip.

Round-3 left a bookkeeping discrepancy: the tfcm-ablation says one TFCM
layer-row costs ~21 ms in-graph, but the isolated block measurements
(profile_tfcm_block.py anat: ~2.2 ms at stage-0, ~9 ms stage-scaled per
row) account for less than half of that. Suspects: the optimizer update
(Adam over ~700 small leaves -> hundreds of tiny kernels), BN running-stat
EMA updates (24 blocks x 4 tiny tensors), and the balancer's extra vjp
pulls. This script measures, for the windowed (deployable) config:

  fwd         forward pass only (train=True, mutable stats)
  grad        value_and_grad of the scalar loss (no optimizer)
  step        the full production train step (balancer + adam + EMA)

and prints the deltas. Timing protocol as in profile_mtfaa.py.
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

from cruse_tpu.models import MtfaaNet
from cruse_tpu.models.mtfaa import MtfaaConfig
from cruse_tpu.train.step import (
    StepConfig, init_train_state, make_train_step, forward_for_model, cast_forward,
)
from cruse_tpu.dsp.stft import stft, StftConfig

B = 16
SECONDS = 10
SR = 16000
ITERS = int(os.environ.get("ANAT_ITERS", "20"))


def _data():
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(rng.standard_normal((B, SECONDS * SR)), jnp.float32) * 0.05
    clean = jnp.asarray(rng.standard_normal((B, SECONDS * SR)), jnp.float32) * 0.05
    return noisy, clean


def _time3(loop, *args):
    float(loop(*args))
    times = []
    for rep in range(3):
        fresh = (args[0] * (1.0 + 1e-3 * (rep + 1)),) + args[1:]
        float(jnp.asarray(fresh[0]).ravel()[0])
        t0 = time.perf_counter()
        float(loop(*fresh))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    # optional model-config ablation: pass e.g. `grad:tfcm0`, `grad:nodf`,
    # `grad:fullcausal`, `grad:noasa_win` to localize the backward anomaly
    overrides = {
        "base": {},
        "tfcm0": {"tfcm_layers": 0},
        "tfcm2": {"tfcm_layers": 2},
        "nodf": {"use_deep_filter": False},
        "fullcausal": {"attention_window": None},
        "tfcmremat": {"tfcm_remat": True},
        "tfcmfused": {"tfcm_dw_impl": "fused"},
        "tfcmfusedpl": {"tfcm_dw_impl": "fused_pallas"},
        "tfcmfold": {"tfcm_dw_impl": "fused_fold"},
    }
    variant = "base"
    for a in sys.argv[1:]:
        if ":" in a:
            variant = a.split(":", 1)[1]
    flatopt = variant == "flatopt"
    if flatopt:
        variant = "base"
    kw = {"attention_window": 126}
    kw.update(overrides[variant])
    mcfg = MtfaaConfig(**kw)
    model = MtfaaNet(mcfg)
    noisy, clean = _data()
    scfg = StftConfig(n_fft=512, hop_length=256)
    cfg = StepConfig(stft=scfg, compute_dtype="bfloat16",
                     flatten_optimizer=flatopt)

    def stft_ri(x):
        s = stft(x, scfg)
        return jnp.stack([jnp.real(s), jnp.imag(s)], axis=-1)

    feat = stft_ri(noisy)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    fwd = cast_forward(forward_for_model(model), jnp.bfloat16)

    sel = [a.split(":", 1)[0] for a in sys.argv[1:]] or ["fwd", "grad", "step"]
    print(f"variant={variant}", flush=True)

    results = {}

    if "fwd" in sel:
        @jax.jit
        def loop_fwd(noisy, params, stats):
            feat = stft_ri(noisy)

            def body(i, carry):
                acc, f = carry
                out, _ = fwd(params, stats, f, train=True)
                return acc + jnp.sum(out[0][:1, :1, :4].real), f * (1 + 1e-6 * acc)

            acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), feat))
            return acc

        dt = _time3(loop_fwd, noisy, state.params, state.batch_stats) / ITERS
        results["fwd"] = dt
        print(f"fwd   {dt * 1e3:8.1f} ms/iter  ({B * SECONDS / dt:8.0f}x RT)", flush=True)

    if "grad" in sel:
        def loss_fn(params, stats, f, clean_spec):
            out, _ = fwd(params, stats, f, train=True)
            # plain compressed-spec MSE against the clean cspec (a stand-in
            # scalar objective: one vjp pull, no balancer)
            enh = jax.lax.complex(out[..., 0], out[..., 1])
            err = jnp.abs(enh - clean_spec)
            return jnp.mean(jnp.square(err))

        @jax.jit
        def loop_grad(noisy, clean, params, stats):
            f = stft_ri(noisy)
            cs = stft_ri(clean)
            clean_spec = jax.lax.complex(cs[..., 0], cs[..., 1])

            def body(i, carry):
                acc, f = carry
                v, g = jax.value_and_grad(loss_fn)(params, stats, f, clean_spec)
                # consume EVERY grad leaf (a single-leaf read lets XLA DCE
                # most of the backward -- observed: "bwd" at 4 ms)
                gn = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
                return acc + v + gn * 1e-9, f * (1 + 1e-9 * v)

            acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), f))
            return acc

        dt = _time3(loop_grad, noisy, clean, state.params, state.batch_stats) / ITERS
        results["grad"] = dt
        print(f"grad  {dt * 1e3:8.1f} ms/iter  ({B * SECONDS / dt:8.0f}x RT)", flush=True)

    if "step" in sel:
        step = make_train_step(model, cfg, forward=forward_for_model(model))

        @jax.jit
        def loop_step(noisy, clean, state):
            def body(i, carry):
                st, acc = carry
                st, metrics = step(st, {"noisy": noisy * (1 + 1e-6 * acc), "clean": clean})
                return (st, acc + metrics["grad_norm"] * 1e-9)

            st, acc = lax.fori_loop(0, ITERS, body, (state, jnp.float32(0.0)))
            return acc

        dt = _time3(loop_step, noisy, clean, state) / ITERS
        results["step"] = dt
        print(f"step  {dt * 1e3:8.1f} ms/iter  ({B * SECONDS / dt:8.0f}x RT)", flush=True)

    if "grad" in results and "fwd" in results:
        print(f"bwd share (grad - fwd):      {(results['grad'] - results['fwd']) * 1e3:8.1f} ms")
    if "step" in results and "grad" in results:
        print(f"balancer+opt (step - grad):  {(results['step'] - results['grad']) * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
