#!/usr/bin/env python
"""Export a trained checkpoint as a serialized, self-contained enhancement
artifact (jax.export) + loader demo.

The TPU-native analogue of the reference's ONNX-export deployment path:
the exported blob embeds the full stft -> model -> mask -> istft graph with
baked weights, reloadable without the model code.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _quantize(variables):
    """Weight-only int8 on the params collection + one log line of savings."""
    from cruse_tpu.nn.quantize import quantize_variables, quantization_report
    from cruse_tpu.utils.logger import log

    variables = quantize_variables(variables)
    rep = quantization_report(variables["params"])
    log(
        f"int8-quantized {rep['leaves_quantized']} kernels "
        f"({rep['leaves_kept']} small leaves kept fp32): params "
        f"{rep['bytes_fp32']/1e6:.2f} -> {rep['bytes_quantized']/1e6:.2f} MB"
    )
    return variables


def _artifact_meta(args, config) -> dict:
    """Container metadata a code-free consumer needs to feed the graph."""
    ac = config["acoustics"]
    return {
        "model": config["model"]["path"],
        "sr": int(ac.get("sr", 16000)),
        "n_fft": int(ac["n_fft"]),
        "hop_length": int(ac["hop_length"]),
        "batch": int(args.batch),
        "quantized": args.quantize,
    }


def main():
    parser = argparse.ArgumentParser(description="export enhancement graph")
    parser.add_argument("-C", "--configuration", required=True)
    parser.add_argument("-M", "--model_checkpoint_path", required=True)
    parser.add_argument("-O", "--output", required=True, help="output .jaxexport blob")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--seconds", type=float, default=10.0)
    parser.add_argument(
        "--streaming", action="store_true",
        help="export the per-hop streaming step (state, hop) -> (out, state) "
             "instead of the offline batch graph")
    parser.add_argument(
        "--quantize", choices=["int8"], default=None,
        help="weight-only per-channel int8: large kernels are baked into the "
             "artifact as int8 + scales (~4x smaller), dequantized in-graph")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from cruse_tpu.utils.cache import maybe_enable_compile_cache

    maybe_enable_compile_cache()  # CRUSE_TPU_COMPILE_CACHE=1 opt-in
    from jax import export as jexport

    from cruse_tpu.infer import artifact as artifact_lib
    from cruse_tpu.dsp.stft import StftConfig, stft, istft
    from cruse_tpu.models import build_from_config, features_for_model
    from cruse_tpu.train.step import forward_for_model
    from cruse_tpu.train.checkpoint import preload_variables
    from cruse_tpu.utils.config import load_config, initialize_module
    from cruse_tpu.utils.logger import log

    config = load_config(args.configuration)
    ac = config["acoustics"]
    scfg = StftConfig(n_fft=int(ac["n_fft"]), hop_length=int(ac["hop_length"]))
    sr = int(ac.get("sr", 16000))
    model_cfg = initialize_module(config["model"]["path"], config["model"].get("args"))
    model = build_from_config(model_cfg)

    if args.streaming:
        # real-time deployment artifact: the jitted per-hop step with the
        # carried stream state as an explicit pytree argument (the TPU
        # analogue of the reference exporting jit.trace'd streaming modules,
        # test/test_model.py:348-360)
        from cruse_tpu.infer.streaming import StreamingEnhancer

        stream_cfg = StftConfig(n_fft=scfg.n_fft, hop_length=scfg.hop_length,
                                center=False)
        feat_len = 8 * scfg.hop_length + scfg.n_fft
        ex_feat = stft(jnp.zeros((1, feat_len)), stream_cfg)
        variables = model.init(
            jax.random.PRNGKey(0), features_for_model(model, ex_feat))
        variables = preload_variables(args.model_checkpoint_path, variables)
        if args.quantize == "int8":
            variables = _quantize(variables)
        enhancer = StreamingEnhancer(model, variables, stream_cfg)
        state = enhancer.init_state(args.batch)
        hop_shape = (
            (args.batch, model.config.num_mics, stream_cfg.hop_length)
            if enhancer._is_mc else (args.batch, stream_cfg.hop_length)
        )
        hop = jnp.zeros(hop_shape, jnp.float32)
        step_blob = jexport.export(jax.jit(enhancer._step_impl))(state, hop).serialize()
        # the carried state is an opaque model-family pytree; ship its
        # initial value as a no-arg exported graph so a consumer
        # (tools/run_exported.py) never needs the model code to build it
        init_blob = jexport.export(
            jax.jit(lambda: enhancer.init_state(args.batch)))().serialize()
        artifact_lib.save_streaming(
            args.output, step_blob, init_blob,
            dict(_artifact_meta(args, config),
                 num_mics=(int(hop_shape[1]) if enhancer._is_mc else None)))
        log(f"exported {(len(step_blob)+len(init_blob))/1e6:.2f} MB streaming step "
            f"(B={args.batch}, hop={stream_cfg.hop_length}"
            + (f", mics={hop_shape[1]}" if enhancer._is_mc else "") + ") "
            f"-> {args.output}")
        art = artifact_lib.load(args.output)
        out, new_state = art.step(art.init_state(), hop)
        assert out.shape == (args.batch, stream_cfg.hop_length)
        log("reload check OK")
        return

    length = int(args.seconds * sr)
    ex_spec = stft(jnp.zeros((args.batch, length)), scfg)
    variables = model.init(jax.random.PRNGKey(0), features_for_model(model, ex_spec))
    # params AND BatchNorm running stats (a params-only load would run
    # trained BN layers with fresh stats and diverge from validation)
    variables = preload_variables(args.model_checkpoint_path, variables)
    if args.quantize == "int8":
        variables = _quantize(variables)
    adapter = forward_for_model(model)

    def forward(noisy):
        from cruse_tpu.nn.quantize import dequantize_tree

        v = dequantize_tree(variables)  # identity unless --quantize
        spec = stft(noisy, scfg)
        ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        enhanced_ri, _ = adapter(v["params"], v["batch_stats"], ri, train=False)
        return istft((enhanced_ri[..., 0], enhanced_ri[..., 1]), scfg, length=noisy.shape[-1])

    example = jnp.zeros((args.batch, length), jnp.float32)
    blob = jexport.export(jax.jit(forward))(example).serialize()
    artifact_lib.save_offline(args.output, blob, _artifact_meta(args, config))
    log(f"exported {len(blob)/1e6:.2f} MB graph for input [{args.batch}, {length}] -> {args.output}")

    # reload + smoke check through the consumer loader
    art = artifact_lib.load(args.output)
    out = art.enhance(example)
    assert out.shape == (args.batch, length)
    log("reload check OK")


if __name__ == "__main__":
    main()
