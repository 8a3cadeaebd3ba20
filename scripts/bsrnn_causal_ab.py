"""A/B: how much quality does causal BSRNN give up vs the offline prototype?
(round-3 VERDICT item 3 'done' criterion)

Trains the SAME BSRNN twice on the same corpus — once with the reference
prototype's offline GroupNorm(1, C) (reads the whole time axis,
testBSRNN.py:40-48), once with the causal cumulative-layer-norm variant
(streamable frame-by-frame) — then scores BOTH on one shared eval set.
Prints per-variant SI-SDR so the offline->causal trade is evidence-based.

Usage: python scripts/bsrnn_causal_ab.py [epochs] [steps_per_epoch]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("BSRNN_AB_CPU", "1") == "1":
    # the axon sitecustomize overrides JAX_PLATFORMS; force CPU here
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def make_dataset(valid: bool, seed: int):
    from cruse_tpu.data.dataset import SynMixDataset, SynMixConfig

    root = "/tmp/corpus"
    split = "valid" if valid else "train"
    return SynMixDataset(SynMixConfig(
        clean_manifest=f"{root}/clean_{split}.txt",
        noise_manifest=f"{root}/noise_{split}.txt",
        snr_range=(0, 12), sub_sample_seconds=1.0, sr=16000,
        batch_size=4, seed=seed, valid_mode=valid,
    ))


def train_one(tag: str, causal: bool):
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import features_for_model
    from cruse_tpu.models.bsrnn import BSRNN
    from cruse_tpu.train.step import (
        StepConfig, init_train_state, make_train_step, forward_for_model)

    scfg = StftConfig(n_fft=512, hop_length=256)
    model = BSRNN(num_channel=12, num_layer=1, causal=causal)
    ds = make_dataset(valid=False, seed=0)
    ex = next(iter(ds.batches(num_batches=1)))
    feat = features_for_model(model, stft(ex["noisy"], scfg))
    cfg = StepConfig(stft=scfg, learning_rate=1e-3)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = jax.jit(make_train_step(model, cfg, forward=forward_for_model(model)))
    for ep in range(EPOCHS):
        losses = []
        for batch in ds.batches(num_batches=STEPS):
            state, m = step(state, {"noisy": batch["noisy"], "clean": batch["clean"]})
            losses.append(float(m.get("loss_si_snr", np.nan)))
        print(f"  [{tag}] epoch {ep + 1}: si_snr loss {np.mean(losses):.3f}", flush=True)
    return model, state, scfg


def evaluate(model, state, scfg, eval_batches):
    from cruse_tpu.dsp.stft import stft, istft
    from cruse_tpu.metrics.sisdr import si_sdr
    from cruse_tpu.train.step import forward_for_model

    fwd = forward_for_model(model)

    @jax.jit
    def enhance(params, stats, noisy):
        spec = stft(noisy, scfg)
        ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        out, _ = fwd(params, stats, ri, train=False)
        return istft((out[..., 0], out[..., 1]), scfg, length=noisy.shape[-1])

    vals_enh, vals_noisy = [], []
    for batch in eval_batches:
        enh = np.asarray(enhance(state.params, state.batch_stats, batch["noisy"]))
        for j in range(enh.shape[0]):
            clean = np.asarray(batch["clean"][j])
            vals_enh.append(si_sdr(clean, enh[j]))
            vals_noisy.append(si_sdr(clean, np.asarray(batch["noisy"][j])))
    return float(np.mean(vals_noisy)), float(np.mean(vals_enh))


def main():
    if not os.path.exists("/tmp/corpus/clean_train.txt"):
        import examples.make_tiny_corpus as mk

        mk.main("/tmp/corpus")
    # one SHARED eval set (fixed seed -> identical batches for both arms)
    eval_batches = list(make_dataset(valid=True, seed=7).batches(num_batches=4))

    results = {}
    for tag, causal in (("offline-norm", False), ("causal-norm", True)):
        print(f"training {tag} ...", flush=True)
        model, state, scfg = train_one(tag, causal)
        noisy_sdr, enh_sdr = evaluate(model, state, scfg, eval_batches)
        results[tag] = (noisy_sdr, enh_sdr)
        print(f"{tag}: eval SI-SDR noisy {noisy_sdr:.2f} -> enhanced {enh_sdr:.2f} dB",
              flush=True)
    off, cz = results["offline-norm"][1], results["causal-norm"][1]
    print(f"\ncausal-norm minus offline-norm on shared eval: {cz - off:+.2f} dB SI-SDR "
          f"(the price of frame-streamability)")


if __name__ == "__main__":
    main()
