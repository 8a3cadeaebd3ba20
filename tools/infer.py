#!/usr/bin/env python
"""Inference CLI: enhance a directory (or manifest) of wavs with a trained
checkpoint, logging per-utterance RTF (reference tools flow,
base_inferencer.py:164-196)."""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="cruse_tpu inferencer")
    parser.add_argument("-C", "--configuration", required=True, help="Config (*.toml) used for training.")
    parser.add_argument("-M", "--model_checkpoint_path", required=True, help="Checkpoint dir (orbax) to load.")
    parser.add_argument("-I", "--input", required=True, help="Dir of wavs or manifest txt.")
    parser.add_argument("-O", "--output_dir", required=True, help="Where to write enhanced wavs.")
    parser.add_argument("--streaming", action="store_true", help="Use the frame-by-frame causal path.")
    parser.add_argument("--hops_per_step", type=int, default=1,
                        help="Streaming: hops per device dispatch (k>1 amortizes dispatch "
                             "cost at +(k-1)*hop/sr seconds of latency).")
    parser.add_argument("--postfilter", choices=["sin", "envelope"], default=None,
                        help="Mask post-filter for magnitude-mask strategies "
                             "(musical-noise suppression; overrides [inferencer] postfilter).")
    parser.add_argument("--quantize", choices=["int8"], default=None,
                        help="Weight-only per-channel int8 serving: large kernels "
                             "held int8 in HBM, dequantized in-graph.")
    parser.add_argument("-N", "--num_devices", type=int, default=0,
                        help="Data-parallel batch inference over an N-device mesh "
                             "(utterance batches shard over the mesh's data axis; "
                             "N=0 keeps the reference's one-utterance-per-forward flow).")
    parser.add_argument("--batch", type=int, default=0,
                        help="Utterances per dispatch for batched/mesh inference "
                             "(0 = auto; rounded up to a multiple of -N).")
    parser.add_argument("--chunk_seconds", type=float, default=0.0,
                        help="Memory-bounded long-audio mode: enhance each file as "
                             "50%%-overlapping chunks of this many seconds and stitch "
                             "(with -N, the chunks shard over the mesh's data axis).")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from cruse_tpu.utils.cache import maybe_enable_compile_cache

    maybe_enable_compile_cache()  # CRUSE_TPU_COMPILE_CACHE=1 opt-in

    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.data.manifest import load_manifest
    from cruse_tpu.data.wavio import read_wav, write_wav, to_int16_scaled
    from cruse_tpu.infer.batch import BatchInferencer, InferencerConfig
    from cruse_tpu.infer.streaming import StreamingEnhancer
    from cruse_tpu.models import build_from_config, features_for_model
    from cruse_tpu.train.checkpoint import preload_variables
    from cruse_tpu.utils.config import load_config, initialize_module
    from cruse_tpu.utils.logger import log

    config = load_config(args.configuration)
    ac = config["acoustics"]
    sr = int(ac.get("sr", 16000))

    model_cfg = initialize_module(config["model"]["path"], config["model"].get("args"))
    model = build_from_config(model_cfg)

    # init + load params (example input shaped for the model family)
    ex_spec = stft(jnp.zeros((1, 8 * int(ac["hop_length"]))),
                   StftConfig(n_fft=int(ac["n_fft"]), hop_length=int(ac["hop_length"])))
    variables = model.init(jax.random.PRNGKey(0), features_for_model(model, ex_spec))
    # params AND BatchNorm running stats (a params-only load would run
    # trained BN layers with fresh stats and diverge from validation)
    variables = preload_variables(args.model_checkpoint_path, variables)
    if args.quantize == "int8":
        from cruse_tpu.nn.quantize import quantize_variables, quantization_report

        variables = quantize_variables(variables)
        rep = quantization_report(variables["params"])
        log(f"int8 weights: {rep['leaves_quantized']} kernels, params "
            f"{rep['bytes_fp32']/1e6:.2f} -> {rep['bytes_quantized']/1e6:.2f} MB")

    inp = Path(args.input)
    files = load_manifest(str(inp)) if inp.is_file() else sorted(str(p) for p in inp.glob("*.wav"))
    assert files, f"no wavs found under {inp}"

    if args.streaming:
        if args.num_devices > 1 or args.batch > 1 or args.chunk_seconds > 0:
            raise SystemExit(
                "--streaming is the single-device low-latency path; it does "
                "not compose with -N/--batch/--chunk_seconds (use the batch "
                "mode for mesh scale-out, or tools/serve.py -N for sharded "
                "concurrent streams)")
        from cruse_tpu.models import CruseNet as _CN
        from cruse_tpu.models.dfsmn import DfsmnNet as _DN
        from cruse_tpu.models.cruse_df import CruseDfNet as _CDN
        from cruse_tpu.models.mtfaa import MtfaaNet as _MN
        from cruse_tpu.models.mc_cruse import McCruseNet as _MCN
        from cruse_tpu.models.fullsubnet import FullSubNet as _FSN
        from cruse_tpu.models.bsrnn import BSRNN as _BN

        assert isinstance(model, (_CN, _DN, _CDN, _MN, _MCN, _FSN, _BN)), (
            "--streaming supports CRUSE/DFSMN (magnitude mask), CRUSE+DF, "
            "MTFAA with a finite attention_window, multi-mic McCruse, "
            "FullSubNet with cumulative norms, and causal BSRNN"
        )
        is_mc = isinstance(model, _MCN)
        scfg = StftConfig(n_fft=int(ac["n_fft"]), hop_length=int(ac["hop_length"]), center=False)
        enhancer = StreamingEnhancer(model, variables, scfg)
        out_dir = Path(args.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        k = max(args.hops_per_step, 1)
        hop = int(ac["hop_length"])
        for f in files:
            # multi-mic models stream [1, M, hop] frames (enhanced output is
            # the reference mic); all indexing below is channel-agnostic
            wav, _ = read_wav(f, sr=sr, mono=not is_mc)
            rtf = enhancer.measure_rtf(wav[None], sr=sr, num_frames=20)
            if k > 1:
                # k-hop dispatches: same samples, k-fold fewer device calls
                state = enhancer.prime(enhancer.init_state(1),
                                       jnp.asarray(wav[None][..., : enhancer.cfg.n_fft - hop]))
                rest = wav[..., enhancer.cfg.n_fft - hop :]
                n_hops_total = rest.shape[-1] // hop
                n_chunks = rest.shape[-1] // (k * hop)
                outs = []
                for i in range(n_chunks):
                    x = jnp.asarray(rest[None][..., i * k * hop : (i + 1) * k * hop])
                    o, state = enhancer.step_multi(state, x)
                    outs.append(np.asarray(o))
                # tail: process remaining whole hops one-by-one so output
                # length is independent of k (only < hop samples dropped,
                # matching the k=1 run() path)
                for j in range(n_chunks * k, n_hops_total):
                    x = jnp.asarray(rest[None][..., j * hop : (j + 1) * hop])
                    o, state = enhancer.step(state, x)
                    outs.append(np.asarray(o))
                out = np.concatenate(outs, axis=-1)[0] if outs else np.zeros(0, np.float32)
            else:
                out = np.asarray(enhancer.run(jnp.asarray(wav[None])))[0]
            log(f"{Path(f).stem}, streaming rtf: {rtf}")
            write_wav(str(out_dir / f"{Path(f).stem}.wav"), to_int16_scaled(out), sr)
    else:
        icfg = InferencerConfig(
            type=config.get("inferencer", {}).get("type", "auto"),
            sr=sr,
            stft=StftConfig(n_fft=int(ac["n_fft"]), hop_length=int(ac["hop_length"])),
            output_dir=args.output_dir,
            postfilter=(args.postfilter
                        or config.get("inferencer", {}).get("postfilter")),
        )
        mesh = None
        if args.num_devices > 1 or args.batch > 1:
            n = args.num_devices or 1
            devices = jax.devices()
            if n > len(devices):
                raise SystemExit(
                    f"-N {n} requested but only {len(devices)} devices visible; "
                    f"for a virtual CPU mesh set JAX_PLATFORMS=cpu "
                    f"XLA_FLAGS=--xla_force_host_platform_device_count={n}"
                )
            if n > 1:
                from cruse_tpu.parallel.mesh import make_mesh

                mesh = make_mesh(n_data=n, n_model=1, devices=devices[:n])
                log(f"batched inference over mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}")
        inferencer = BatchInferencer(model, variables, icfg, mesh=mesh)
        # multi-channel strategies need [C, L] wavs, not a mono downmix
        from cruse_tpu.models.mc_cruse import McCruseNet as _MCN2

        mono = not (isinstance(model, _MCN2)
                    or icfg.type.startswith("multi_channel"))
        if args.chunk_seconds > 0:
            import time

            out_dir = Path(args.output_dir)
            for f in files:
                wav, _ = read_wav(f, sr=sr, mono=mono)
                t1 = time.time()
                out = np.asarray(inferencer.enhance_long(
                    jnp.asarray(wav[None]), chunk_seconds=args.chunk_seconds))[0]
                rtf = (time.time() - t1) / (len(out) / sr)
                log(f"{Path(f).stem} ({len(out)/sr:.1f}s in "
                    f"{args.chunk_seconds:.0f}s chunks), rtf: {rtf}")
                write_wav(str(out_dir / f"{Path(f).stem}.wav"), to_int16_scaled(out), sr)
        elif mesh is not None or args.batch > 1:
            wavs = [read_wav(f, sr=sr, mono=mono)[0] for f in files]
            inferencer.run_batched(wavs, [Path(f).stem for f in files],
                                   batch_size=args.batch or None)
        else:
            batches = ({"noisy": read_wav(f, sr=sr, mono=mono)[0][None],
                        "name": [Path(f).stem]} for f in files)
            inferencer(batches)


if __name__ == "__main__":
    main()
