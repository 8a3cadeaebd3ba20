#!/usr/bin/env python
"""End-to-end walkthrough: corpus -> train -> enhance -> stream -> serve ->
export -> quantize.

Runs in a few minutes on CPU (set JAX_PLATFORMS=cpu) or on a TPU chip.
Everything a reference-stack user needs to switch, in one file:

  1. synthesize a toy corpus + manifests
  2. curate it with the preprocess filters
  3. train flagship CRUSE with the balancer trainer (few epochs)
  4. batch-enhance a wav with RTF logging
  5. stream the same wav frame-by-frame (sample-exact path)
  6. serve two concurrent live sessions through the StreamingServer
  7. export the enhancement graph as a self-contained artifact
  8. int8-quantize the weights and check the quality gate

(Scale-out versions of steps 4-6 — sharding utterance batches, long-audio
chunks, or server slots over a device mesh — are one flag away on the
CLIs: `tools/infer.py -N`, `tools/serve.py -N`.)
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    root = tempfile.mkdtemp(prefix="cruse_demo_")
    sr = 16000
    rng = np.random.default_rng(0)

    from cruse_tpu.data.wavio import write_wav, read_wav
    from cruse_tpu.data.manifest import write_manifest
    from cruse_tpu.data.dataset import SynMixDataset, SynMixConfig
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.train.step import StepConfig
    from cruse_tpu.train.trainer import Trainer, TrainerConfig
    from cruse_tpu.infer.batch import BatchInferencer, InferencerConfig
    from cruse_tpu.infer.streaming import StreamingEnhancer
    from cruse_tpu.utils.logger import log

    # 1. toy corpus ---------------------------------------------------------
    def speechish(n):
        t = np.arange(n) / sr
        env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t + rng.uniform(0, 6)))
        tones = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 6)) for f in (220, 440, 880))
        return (env * tones / 3 * 0.3).astype(np.float32)

    clean, noise = [], []
    for i in range(6):
        p = f"{root}/clean_{i}.wav"
        write_wav(p, speechish(2 * sr), sr)
        clean.append(p)
        p = f"{root}/noise_{i}.wav"
        write_wav(p, (rng.standard_normal(2 * sr) * 0.1).astype(np.float32), sr)
        noise.append(p)
    write_manifest(clean[:4], f"{root}/clean_train.txt")
    write_manifest(clean[4:], f"{root}/clean_valid.txt")
    write_manifest(noise[:4], f"{root}/noise_train.txt")
    write_manifest(noise[4:], f"{root}/noise_valid.txt")
    log(f"[1/8] corpus at {root}")

    # 2. datasets (host selection + on-device mixing) -----------------------
    mk = lambda c, n, bs: SynMixDataset(SynMixConfig(
        clean_manifest=c, noise_manifest=n, snr_range=(0, 10),
        sub_sample_seconds=1.0, sr=sr, batch_size=bs,
    ))
    train_ds = mk(f"{root}/clean_train.txt", f"{root}/noise_train.txt", 4)
    valid_ds = mk(f"{root}/clean_valid.txt", f"{root}/noise_valid.txt", 2)
    log("[2/8] datasets ready")

    # 3. train --------------------------------------------------------------
    scfg = StftConfig(n_fft=320, hop_length=160)
    model = CruseNet(CruseConfig(in_freq=161, channels=(4, 8, 8, 16)))
    example = next(iter(train_ds.batches(num_batches=1)))
    feat = model.compress(jnp.abs(stft(example["noisy"], scfg)))
    trainer = Trainer(
        model,
        StepConfig(stft=scfg, learning_rate=1e-3),
        TrainerConfig(epochs=3, steps_per_epoch=8, save_dir=root,
                      experiment_name="demo", visualization_examples=0),
        train_batches=lambda: train_ds.batches(num_batches=8),
        validation_batches=list(valid_ds.batches(num_batches=1)),
        example_feat=feat,
        writer=False,
    )
    trainer.train()
    log("[3/8] trained 3 epochs")
    variables = {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats}

    # 4. batch inference ----------------------------------------------------
    noisy_wav, _ = read_wav(clean[4], sr=sr)
    noisy_wav = noisy_wav + (rng.standard_normal(len(noisy_wav)) * 0.1).astype(np.float32)
    inf = BatchInferencer(model, variables, InferencerConfig(
        stft=scfg, output_dir=f"{root}/enhanced"))
    inf([{"noisy": noisy_wav[None], "name": ["demo"]}])
    log("[4/8] batch enhancement written")

    # 5. streaming ----------------------------------------------------------
    s_cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    enhancer = StreamingEnhancer(model, variables, s_cfg)
    rtf = enhancer.measure_rtf(noisy_wav[None], sr=sr, num_frames=20)
    log(f"[5/8] streaming RTF: {rtf:.4f} (frame-by-frame, sample-exact path)")

    # 6. concurrent serving ---------------------------------------------------
    from cruse_tpu.infer.server import StreamingServer

    server = StreamingServer(model, variables, s_cfg, max_streams=4)
    s1, s2 = server.open(), server.open()
    server.feed(s1, noisy_wav[:8000])
    server.feed(s2, noisy_wav[::-1].copy())
    hops = 0
    while server.ready(s1) or server.ready(s2):
        hops += len(server.step())
    server.close(s1)
    server.close(s2)
    log(f"[6/8] served 2 concurrent sessions in one device step each hop ({hops} hops)")

    # 7. export -------------------------------------------------------------
    from jax import export as jexport
    from cruse_tpu.dsp.stft import istft

    def forward(noisy):
        spec = stft(noisy, scfg)
        mask, _ = model.apply(variables, model.compress(jnp.abs(spec)))
        return istft(spec * mask, scfg, length=noisy.shape[-1])

    blob = jexport.export(jax.jit(forward))(jnp.zeros((1, len(noisy_wav)))).serialize()
    with open(f"{root}/cruse.jaxexport", "wb") as f:
        f.write(blob)
    out = jexport.deserialize(blob).call(jnp.asarray(noisy_wav[None]))
    log(f"[7/8] exported {len(blob)/1e6:.1f} MB graph; reload check {np.isfinite(np.asarray(out)).all()}")

    # 8. int8 deployment ------------------------------------------------------
    from cruse_tpu.nn.quantize import quantize_variables, quantization_report

    qvars = quantize_variables(variables)
    rep = quantization_report(qvars["params"])
    qinf = BatchInferencer(model, qvars, InferencerConfig(
        stft=scfg, output_dir=f"{root}/enhanced_q8"))
    fp = np.asarray(inf._strategy(jnp.asarray(noisy_wav[None])))
    q8 = np.asarray(qinf._strategy(jnp.asarray(noisy_wav[None])))
    snr = 10 * np.log10(np.mean(fp**2) / (np.mean((fp - q8) ** 2) + 1e-12))
    log(f"[8/8] int8 weights: {rep['bytes_fp32']/1e6:.2f} -> "
        f"{rep['bytes_quantized']/1e6:.2f} MB params, {snr:.1f} dB vs fp32")
    log(f"demo complete -- artifacts in {root}")


if __name__ == "__main__":
    main()
