#!/usr/bin/env python
"""Serving CLI: run many concurrent enhancement sessions -- optionally over
several models -- through the MultiModelServer priority scheduler.

Each `-M name=config.toml:checkpoint` registers a model (its own compiled
batched per-hop program); each `-I path[@model[:priority]]` enqueues wav
sessions against a model. Sessions are admitted as slots free up, fed
chunk-by-chunk, stepped under an optional per-iteration dispatch budget
(priority decides who keeps cadence under load), drained at end-of-stream,
and written to the output dir. The reference's inferencer is offline batch
only (base_inferencer.py:164-196); this is the online serving front end of
the same checkpoints.
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_model(config_path: str, ckpt: str, quantize: str | None = None):
    import jax
    import jax.numpy as jnp

    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import build_from_config, features_for_model
    from cruse_tpu.train.checkpoint import preload_variables
    from cruse_tpu.utils.config import load_config, initialize_module

    config = load_config(config_path)
    ac = config["acoustics"]
    model_cfg = initialize_module(config["model"]["path"], config["model"].get("args"))
    model = build_from_config(model_cfg)
    ex_spec = stft(jnp.zeros((1, 8 * int(ac["hop_length"]))),
                   StftConfig(n_fft=int(ac["n_fft"]), hop_length=int(ac["hop_length"])))
    variables = model.init(jax.random.PRNGKey(0), features_for_model(model, ex_spec))
    variables = preload_variables(ckpt, variables)
    if quantize == "int8":
        from cruse_tpu.nn.quantize import quantize_variables

        variables = quantize_variables(variables)
    scfg = StftConfig(n_fft=int(ac["n_fft"]), hop_length=int(ac["hop_length"]),
                      center=False)
    return model, variables, scfg, int(ac.get("sr", 16000))


def _expand_inputs(spec: str, default_model: str):
    """`path[@model[:priority]]` -> (wav file list, model, priority)."""
    from cruse_tpu.data.manifest import load_manifest

    model, priority = default_model, 0
    path = spec
    if "@" in spec:
        path, tail = spec.rsplit("@", 1)
        if ":" in tail:
            model, prio = tail.split(":", 1)
            priority = int(prio)
        else:
            model = tail
    p = Path(path)
    if p.is_dir():
        files = sorted(str(f) for f in p.glob("*.wav"))
    elif p.suffix == ".txt":
        files = load_manifest(str(p))
    else:
        files = [str(p)]
    assert files, f"no wavs under {path}"
    return files, model, priority


def main():
    parser = argparse.ArgumentParser(description="cruse_tpu streaming server")
    parser.add_argument("-M", "--model", action="append", required=True,
                        metavar="NAME=CONFIG:CKPT",
                        help="register a model (repeatable)")
    parser.add_argument("-I", "--input", action="append", required=True,
                        metavar="PATH[@MODEL[:PRIORITY]]",
                        help="wav file/dir/manifest of sessions (repeatable)")
    parser.add_argument("-O", "--output_dir", required=True)
    parser.add_argument("--max_streams", type=int, default=8,
                        help="slots per model pool (sessions beyond this queue)")
    parser.add_argument("--max_dispatches", type=int, default=0,
                        help="device dispatches per scheduler iteration "
                             "(0 = unbounded; >0 rations by priority)")
    parser.add_argument("--feed_chunk", type=int, default=1,
                        help="hops of input fed per session per iteration "
                             "(>1 simulates bursty arrivals; the backlog "
                             "drains at one hop per iteration)")
    parser.add_argument("--quantize", choices=["int8"], default=None,
                        help="weight-only int8 serving for all registered "
                             "models (kernels stay int8 in HBM)")
    parser.add_argument("-N", "--num_devices", type=int, default=0,
                        help="shard every pool's stream slots over an N-device "
                             "mesh (max_streams must be a multiple of N; each "
                             "chip carries max_streams/N sessions' state)")
    parser.add_argument("--realtime", action="store_true",
                        help="pace the scheduler at wall-clock hop intervals "
                             "(real-time QoS mode): reports per-iteration p50/"
                             "p99 latency and the fraction of hop deadlines "
                             "missed instead of running flat out")
    args = parser.parse_args()
    from cruse_tpu.utils.cache import maybe_enable_compile_cache

    maybe_enable_compile_cache()  # CRUSE_TPU_COMPILE_CACHE=1 opt-in

    import numpy as np

    from cruse_tpu.data.wavio import read_wav, write_wav, to_int16_scaled
    from cruse_tpu.infer.server import MultiModelServer
    from cruse_tpu.utils.logger import log

    mesh = None
    if args.num_devices > 1:
        import jax

        from cruse_tpu.parallel.mesh import make_mesh

        devices = jax.devices()
        if args.num_devices > len(devices):
            raise SystemExit(
                f"-N {args.num_devices} requested but only {len(devices)} "
                f"devices visible; for a virtual CPU mesh set JAX_PLATFORMS=cpu "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={args.num_devices}")
        mesh = make_mesh(n_data=args.num_devices, n_model=1,
                         devices=devices[: args.num_devices])
        log(f"serving over mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    server = MultiModelServer()
    hops, srs, mics = {}, {}, {}
    for spec in args.model:
        name, rest = spec.split("=", 1)
        config_path, ckpt = rest.rsplit(":", 1)
        model, variables, scfg, sr = _build_model(config_path, ckpt, args.quantize)
        server.add_model(name, model, variables, scfg, max_streams=args.max_streams,
                         mesh=mesh)
        hops[name], srs[name] = scfg.hop_length, sr
        mics[name] = server._pools[name]._mics  # 0 = single-channel
        log(f"registered model {name!r} (hop {scfg.hop_length}, {sr} Hz)")

    default_model = args.model[0].split("=", 1)[0]
    queue = []  # (wav_path, model, priority)
    for spec in args.input:
        files, model_name, priority = _expand_inputs(spec, default_model)
        assert model_name in server.models, f"unknown model {model_name!r}"
        queue.extend((f, model_name, priority) for f in files)
    log(f"{len(queue)} sessions queued over {len(server.models)} model(s)")

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    live = {}  # handle -> session record
    total_hops = 0
    t0 = time.perf_counter()

    def admit():
        while queue:
            path, model_name, priority = queue[0]
            try:
                handle = server.open(model_name, priority=priority)
            except RuntimeError:
                return  # pool full; wait for a drain
            queue.pop(0)
            wav, _ = read_wav(path, sr=srs[model_name],
                              mono=not mics[model_name])
            live[handle] = {"name": Path(path).stem, "model": model_name,
                            "wav": wav.astype(np.float32), "pos": 0,
                            "outs": [], "t": time.perf_counter(),
                            "priority": priority}

    # real-time pacing: one scheduler iteration per hop period; an iteration
    # that overruns the period is a missed deadline (audible glitch in a
    # genuinely live deployment)
    hop_period = hops[default_model] / srs[default_model]
    iter_times: list = []
    next_tick = time.perf_counter()

    admit()
    while live or queue:
        if args.realtime:
            now = time.perf_counter()
            if now < next_tick:
                time.sleep(next_tick - now)
            next_tick = max(next_tick + hop_period, time.perf_counter() - hop_period)
            it0 = time.perf_counter()
        # feed every live session its next chunk of input
        for handle, s in list(live.items()):
            chunk = args.feed_chunk * hops[s["model"]]
            nxt = s["wav"][..., s["pos"] : s["pos"] + chunk]
            if nxt.shape[-1]:
                server.feed(handle, nxt)
                s["pos"] += nxt.shape[-1]
        # one scheduler iteration
        budget = args.max_dispatches if args.max_dispatches > 0 else None
        for handle, hop_out in server.step(max_dispatches=budget).items():
            live[handle]["outs"].append(hop_out)
            total_hops += 1
        if args.realtime:
            iter_times.append(time.perf_counter() - it0)
        # retire exhausted sessions: drain, write, free the slot
        for handle, s in list(live.items()):
            if s["pos"] >= s["wav"].shape[-1] and not server.ready(handle):
                tail = server.drain(handle)
                if len(tail):
                    s["outs"].append(tail)
                server.close(handle)
                out = (np.concatenate(s["outs"])
                       if s["outs"] else np.zeros(0, np.float32))
                dt = time.perf_counter() - s["t"]
                audio = s["wav"].shape[-1] / srs[s["model"]]
                write_wav(str(out_dir / f"{s['name']}.wav"),
                          to_int16_scaled(out), srs[s["model"]])
                log(f"  {s['name']} ({s['model']}, prio {s['priority']}): "
                    f"{audio:.2f}s audio in {dt:.2f}s wall "
                    f"(session rtf {dt / max(audio, 1e-9):.3f})")
                del live[handle]
        admit()

    wall = time.perf_counter() - t0
    log(f"served {total_hops} hops in {wall:.2f}s "
        f"({total_hops * hops[default_model] / srs[default_model] / max(wall, 1e-9):.1f}x "
        f"realtime aggregate)")
    if args.realtime and iter_times:
        ts = np.sort(np.asarray(iter_times))
        p50 = ts[len(ts) // 2] * 1e3
        p99 = ts[min(int(0.99 * len(ts)), len(ts) - 1)] * 1e3
        missed = float(np.mean(ts > hop_period)) * 100.0
        log(f"realtime QoS: iteration p50 {p50:.2f} ms / p99 {p99:.2f} ms "
            f"vs {hop_period * 1e3:.1f} ms hop budget; "
            f"{missed:.1f}% deadlines missed")


if __name__ == "__main__":
    main()
