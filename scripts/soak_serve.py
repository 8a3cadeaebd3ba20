"""On-chip serving soak (round-5, VERDICT r4 item 7): a long-lived
StreamingServer under continuous session churn, with latency + memory
accounting.

Companion to tests/test_server.py::test_serving_soak_stable_memory_and_churn
(which asserts the correctness/memory invariants on CPU): this script runs
the same churn pattern against the real chip and records the numbers that
matter for deployment:

  - per-step() wall latency p50/p95/p99 vs the hop budget (how much of the
    10 ms frame the device step consumes; through the axon tunnel this is
    dispatch-RTT-dominated -- chip compute is ~50 us/hop, see STATUS)
  - % of steps that overran the hop budget ("deadline misses": each serves
    up to max_streams hops, so one step per hop interval is the realtime
    requirement)
  - host RSS at the soak's start/middle/end (leak watch)

Usage:  python scripts/soak_serve.py [minutes_aggregate_audio] [max_streams]
Defaults: 30 minutes aggregate, 16 streams. Flagship CRUSE, 10 ms hops.
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

from cruse_tpu.dsp.stft import StftConfig
from cruse_tpu.infer.server import StreamingServer
from cruse_tpu.models import CruseNet, CruseConfig


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return float(line.split()[1]) / 1024.0
    return float("nan")


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    n_streams = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sr = 16000
    cfg = StftConfig(n_fft=320, hop_length=160, center=False)  # 10 ms hops
    hop_budget_s = cfg.hop_length / sr
    model = CruseNet(CruseConfig(in_freq=161))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 161)))
    server = StreamingServer(model, variables, cfg, max_streams=n_streams)

    rng = np.random.default_rng(0)
    chunk = rng.standard_normal(cfg.hop_length * 16).astype(np.float32) * 0.1
    lifetimes = iter(rng.integers(150, 450, size=1 << 20))

    sessions = {}
    audio_target = minutes * 60.0
    audio_s, served, opened, closed = 0.0, 0, 0, 0
    lat = []
    rss0 = _rss_mb()
    rss_mid = None
    t_start = time.perf_counter()
    hop = cfg.hop_length
    while audio_s < audio_target:
        while len(sessions) < n_streams:
            sid = server.open()
            sessions[sid] = [int(next(lifetimes)), 0]
            opened += 1
        for sid, acc in sessions.items():
            feed = min(16, acc[0] - acc[1] - (server._buffers[sid].shape[-1] // hop))
            if feed > 0:
                server.feed(sid, chunk[: feed * hop])
        while server.ready_sessions():
            t0 = time.perf_counter()
            res = server.step()
            if res:
                # force one value to the host so the timing includes the
                # device round trip (server.step already np.asarray's the
                # batch, but be explicit: block_until_ready can return
                # early on the tunneled runtime -- bench.py protocol)
                float(next(iter(res.values()))[0])
            lat.append(time.perf_counter() - t0)
            for sid in res:
                sessions[sid][1] += 1
                served += 1
                audio_s += hop / sr
        for sid in [s for s, acc in sessions.items() if acc[1] >= acc[0]]:
            server.close(sid)
            del sessions[sid]
            closed += 1
        if rss_mid is None and audio_s >= audio_target / 2:
            rss_mid = _rss_mb()
    wall = time.perf_counter() - t_start
    rss1 = _rss_mb()
    ts = np.sort(np.asarray(lat))
    p = lambda q: ts[min(int(q * len(ts)), len(ts) - 1)] * 1e3
    missed = float(np.mean(ts > hop_budget_s)) * 100.0
    print(f"soak: {audio_s / 60:.1f} min aggregate audio, {n_streams} slots, "
          f"{opened} sessions opened / {closed} closed, wall {wall:.0f} s "
          f"({audio_s / wall:.0f}x realtime aggregate)")
    print(f"step latency p50 {p(0.50):.2f} ms / p95 {p(0.95):.2f} ms / "
          f"p99 {p(0.99):.2f} ms vs {hop_budget_s * 1e3:.0f} ms hop budget; "
          f"{missed:.2f}% steps overran the budget")
    print(f"RSS start {rss0:.0f} MB -> mid {rss_mid:.0f} MB -> end {rss1:.0f} MB "
          f"(tail drift {rss1 - rss_mid:+.1f} MB)")


if __name__ == "__main__":
    main()
