#!/usr/bin/env python
"""Component timing on the real TPU chip: where does the enhancement pass
spend its time? Times stft / istft / model forward / GRU variants / train
step with fresh inputs per call (the tunneled runtime caches identical
executions) and a forced value fetch."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cruse_tpu.dsp.stft import StftConfig, stft, istft
from cruse_tpu.models import CruseNet, CruseConfig
from cruse_tpu.nn.gru import gru_scan
from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step

B, SEC, SR = 32, 10, 16000
ITERS = 10


def bench(name, fn, *args, fresh_idx=0):
    """Compile, then time ITERS sequential on-device iterations."""
    @jax.jit
    def loop(*a):
        def body(i, carry):
            acc, x = carry
            out = fn(x, *a[1:])
            leaf = jnp.real(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            return acc + leaf.astype(jnp.float32), x + (1e-6 * leaf).astype(x.dtype)
        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), a[0]))
        return acc

    float(loop(*args))  # compile+warm
    ts = []
    for rep in range(3):
        a0 = args[0] * (1.0 + 1e-5 * (rep + 1))
        float(a0.ravel()[0])
        t0 = time.perf_counter()
        float(loop(a0, *args[1:]))
        ts.append((time.perf_counter() - t0) / ITERS)
    per = min(ts)
    print(f"{name:28s} {per*1e3:8.2f} ms/iter   ({B*SEC/per:9.0f}x RT)", flush=True)
    return per


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = StftConfig(n_fft=320, hop_length=160)
    model = CruseNet(CruseConfig(in_freq=161))
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, SEC * SR)).astype(np.float32) * 0.1)
    spec = stft(wav, cfg)
    feat = model.compress(jnp.abs(spec))
    variables = model.init(jax.random.PRNGKey(0), feat)
    t_frames = feat.shape[1]

    bench("stft", lambda w: stft(w, cfg), wav)
    bench("istft", lambda s: istft(lax.complex(s, s * 0.5), cfg), jnp.real(spec))
    bench("model fwd (mask)", lambda f: model.apply(variables, f)[0], feat)

    # GRU bottleneck in isolation (flagship dims)
    g, h = 4, model.config.bottleneck_dim // 4
    x_proj = jnp.asarray(rng.standard_normal((B, t_frames, g, 3 * h)).astype(np.float32) * 0.1)
    h0 = jnp.zeros((B, g, h))
    w_hh = jnp.asarray(rng.standard_normal((g, 3 * h, h)).astype(np.float32) * 0.05)
    b_hh = jnp.zeros((g, 3 * h))
    bench("gru scan (isolated)", lambda x: gru_scan(x, h0, w_hh, b_hh)[0], x_proj)
    from cruse_tpu.ops.gru_kernel import gru_sequence_pallas

    bench("gru pallas ts=8", lambda x: gru_sequence_pallas(x, h0, w_hh, b_hh)[0], x_proj)
    bench("gru pallas ts=16", lambda x: gru_sequence_pallas(
        x, h0, w_hh, b_hh, time_block=16)[0], x_proj)
    bench("gru pallas ts=16 bf16 w", lambda x: gru_sequence_pallas(
        x, h0, w_hh, b_hh, time_block=16, weight_dtype=jnp.bfloat16)[0], x_proj)

    def full(w):
        s = stft(w, cfg)
        m, _ = model.apply(variables, model.compress(jnp.abs(s)))
        return istft(s * m, cfg, length=w.shape[-1])

    bench("full enhance", full, wav)

    # train step (benchmark config 2: step with balancer)
    step_cfg = StepConfig(stft=cfg)
    short = wav[:, : 3 * SR]
    state = init_train_state(model, step_cfg, jax.random.PRNGKey(0),
                             model.compress(jnp.abs(stft(short, cfg))))
    train_step = make_train_step(model, step_cfg)

    @jax.jit
    def tloop(noisy, clean, st):
        def body(i, carry):
            st, acc = carry
            new_st, metrics = train_step(st, {"noisy": noisy, "clean": clean})
            return new_st, acc + metrics["loss_si_snr"]
        st, acc = lax.fori_loop(0, ITERS, body, (st, jnp.float32(0.0)))
        return acc

    clean = short * 0.5
    float(tloop(short, clean, state))
    ts = []
    for rep in range(3):
        n2 = short * (1.0 + 1e-5 * (rep + 1))
        float(n2.ravel()[0])
        t0 = time.perf_counter()
        float(tloop(n2, clean, state))
        ts.append((time.perf_counter() - t0) / ITERS)
    per = min(ts)
    print(f"{'train step (B=32, 3 s)':28s} {per*1e3:8.2f} ms/iter   ({B*3/per:9.0f}x RT)", flush=True)


if __name__ == "__main__":
    main()
