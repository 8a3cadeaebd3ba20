"""Single-stream streaming latency on the TPU host: per-hop latency table
(p50/p99) for k=1/2/4 hops-per-dispatch, plus a persistent on-device serving
loop prototype (jitted fori_loop + ordered io_callback in/out) that keeps ONE
dispatch alive for a whole session so the per-hop cost is the callback
round-trip instead of a fresh dispatch (round-2 VERDICT item 6).

MEASURED (2026-08-17, v5e via the axon tunnel, 300 hops):
  step k=1   p50 33.9-41.1 ms/hop   p99 ~68 ms   RTF 3.8-4.5
  step k=2   p50 16.6-19.5          RTF 2.2      (+10 ms latency)
  step k=4   p50  9.9-11.4          RTF 1.3      (+30 ms latency)
  persistent loop: NEGATIVE RESULT on this runtime -- jax.experimental
  .io_callback never completes through the axon tunnel (a minimal 3-iter
  fori_loop+ordered-io_callback jit hangs >240 s), so a device-resident
  loop cannot source host audio here. On runtimes with working host
  callbacks the prototype below is the intended shape.

These numbers are TUNNEL-dominated (host<->device RTT ~10-20 ms today;
round 2 measured 2.3 ms/call on a quieter day): per-hop cost scales with
dispatch RTT, not chip compute (~50 us of model math/hop). k-hop batching
(StreamingEnhancer.step_multi) remains the available amortization:
k=4 cuts p50 per-hop cost 3.4x for +30 ms algorithmic latency.

Prints a table for STATUS.md. Run on the chip: python scripts/profile_streaming_latency.py
"""
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cruse_tpu.dsp.stft import StftConfig
from cruse_tpu.infer.streaming import StreamingEnhancer
from cruse_tpu.models import CruseNet, CruseConfig

HOP = 160
N_HOPS = 300


def build():
    cfg = StftConfig(n_fft=320, hop_length=HOP, center=False)
    model = CruseNet(CruseConfig(in_freq=161))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 161)))
    return StreamingEnhancer(model, variables, cfg)


def pct(v, p):
    return float(np.percentile(np.asarray(v) * 1e3, p))


def measure_step_k(enh, k):
    rng = np.random.default_rng(0)
    state = enh.init_state(1)
    x = jnp.asarray(rng.standard_normal((1, k * HOP)).astype(np.float32) * 0.1)
    step = enh.step if k == 1 else enh.step_multi
    out, state = step(state, x)  # compile
    jax.block_until_ready(out)
    lat = []
    for i in range(N_HOPS // k):
        x = jnp.asarray(rng.standard_normal((1, k * HOP)).astype(np.float32) * 0.1)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        out, state = step(state, x)
        float(out[0, 0])  # force full round trip
        lat.append((time.perf_counter() - t0) / k)  # per-hop
    rtf = np.mean(lat) / (HOP / 16000.0)
    return lat, rtf


def measure_persistent(enh, n_hops=N_HOPS):
    """One jitted fori_loop serves the whole session; hops stream through
    ordered io_callbacks (host queue in, host queue out)."""
    inq: "queue.Queue[np.ndarray]" = queue.Queue()
    outq: "queue.Queue[np.ndarray]" = queue.Queue()

    def fetch(_):
        return inq.get(timeout=60)

    def emit(y):
        outq.put(np.asarray(y))
        return np.int32(0)

    from jax.experimental import io_callback

    def serve(state):
        def body(i, st):
            x = io_callback(
                fetch, jax.ShapeDtypeStruct((1, HOP), jnp.float32), i, ordered=True
            )
            out, st = enh._step_impl(st, x)
            io_callback(emit, jax.ShapeDtypeStruct((), jnp.int32), out, ordered=True)
            return st

        return lax.fori_loop(0, n_hops, body, state)

    serve_j = jax.jit(serve)
    state = enh.init_state(1)

    rng = np.random.default_rng(0)
    lat = []

    def run():
        final = serve_j(state)
        jax.block_until_ready(final)

    t = threading.Thread(target=run)
    t.start()
    # warmup hops (the first get waits out the fori_loop+callback compile,
    # which takes minutes on this 1-core host)
    for i in range(20):
        inq.put(rng.standard_normal((1, HOP)).astype(np.float32) * 0.1)
        outq.get(timeout=540 if i == 0 else 60)
    for i in range(n_hops - 20):
        x = rng.standard_normal((1, HOP)).astype(np.float32) * 0.1
        t0 = time.perf_counter()
        inq.put(x)
        outq.get(timeout=60)
        lat.append(time.perf_counter() - t0)
    t.join(timeout=60)
    rtf = np.mean(lat) / (HOP / 16000.0)
    return lat, rtf


def main():
    enh = build()
    print(f"single stream, CRUSE flagship, hop {HOP} ({HOP/16:.0f} ms audio), "
          f"{N_HOPS} hops, host {jax.devices()[0].platform}")
    rows = []
    for k in (1, 2, 4):
        lat, rtf = measure_step_k(enh, k)
        rows.append((f"step k={k}", lat, rtf,
                     0.0 if k == 1 else (k - 1) * HOP / 16.0))
    try:
        lat, rtf = measure_persistent(enh)
        rows.append(("persistent loop", lat, rtf, 0.0))
    except Exception as e:
        print(f"persistent loop FAILED: {type(e).__name__}: {e}")
    print(f"{'path':18s} {'p50 ms/hop':>11s} {'p99 ms/hop':>11s} {'RTF':>7s} {'+latency ms':>12s}")
    for name, lat, rtf, extra in rows:
        print(f"{name:18s} {pct(lat, 50):11.2f} {pct(lat, 99):11.2f} {rtf:7.3f} {extra:12.0f}")


if __name__ == "__main__":
    main()
