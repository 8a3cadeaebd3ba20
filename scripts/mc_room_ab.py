"""A/B: does image-source room training beat free-field training on
reverberant multi-mic eval data? (round-2 VERDICT item 5 'done' criterion)

Trains the SAME McCruseNet twice on the same corpus -- once with the
free-field delay simulator, once with the image-source room simulator --
then scores BOTH on one shared reverberant (room-simulated) eval set.
Prints per-model validation SI-SDR. Any backend; run with JAX_PLATFORMS=cpu
for a deterministic CPU run or on the chip.

Usage: python scripts/mc_room_ab.py [epochs] [steps_per_epoch]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("MC_AB_CPU", "1") == "1":
    # the axon sitecustomize overrides JAX_PLATFORMS; force CPU here
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
MICS = 3


def make_dataset(mc_room: bool, valid: bool, seed: int):
    from cruse_tpu.data.dataset import SynMixDataset, SynMixConfig

    root = "/tmp/corpus"
    split = "valid" if valid else "train"
    return SynMixDataset(SynMixConfig(
        clean_manifest=f"{root}/clean_{split}.txt",
        noise_manifest=f"{root}/noise_{split}.txt",
        snr_range=(0, 12), sub_sample_seconds=1.0, sr=16000,
        batch_size=4, num_mics=MICS, mc_room=mc_room,
        mc_room_t60=(0.25, 0.6), seed=seed, valid_mode=valid,
    ))


def train_one(tag: str, mc_room: bool):
    from cruse_tpu.dsp.stft import StftConfig, mc_stft
    from cruse_tpu.models import features_for_model
    from cruse_tpu.models.mc_cruse import McCruseConfig, McCruseNet
    from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step, forward_for_model

    scfg = StftConfig(n_fft=320, hop_length=160)
    model = McCruseNet(McCruseConfig(
        mic_pairs=((0, 1), (0, 2)),
        cruse_args={"in_freq": 161, "channels": (4, 8, 8, 16), "rnn_groups": 4}))
    ds = make_dataset(mc_room, valid=False, seed=0)
    ex = next(iter(ds.batches(num_batches=1)))
    feat = features_for_model(model, mc_stft(ex["noisy"], scfg))
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
    from cruse_tpu.dsp.stft import mc_stft
    from cruse_tpu.metrics.sisdr import si_sdr
    from cruse_tpu.train.step import forward_for_model
    from cruse_tpu.dsp.stft import istft

    fwd = forward_for_model(model)

    @jax.jit
    def enhance(params, stats, noisy):
        spec = mc_stft(noisy, scfg)
        ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        out, _ = fwd(params, stats, ri, train=False)
        return istft((out[..., 0], out[..., 1]), scfg, length=noisy.shape[-1])

    vals_enh, vals_noisy = [], []
    for batch in eval_batches:
        enh = np.asarray(enhance(state.params, state.batch_stats, batch["noisy"]))
        for j in range(enh.shape[0]):
            clean = np.asarray(batch["clean"][j])
            vals_enh.append(si_sdr(clean, enh[j]))
            vals_noisy.append(si_sdr(clean, np.asarray(batch["noisy"][j, 0])))
    return float(np.mean(vals_noisy)), float(np.mean(vals_enh))


def main():
    if not os.path.exists("/tmp/corpus/clean_train.txt"):
        import examples.make_tiny_corpus as mk

        mk.main("/tmp/corpus")
    # one SHARED reverberant eval set (fixed seed -> identical batches)
    eval_batches = list(make_dataset(mc_room=True, valid=True, seed=7).batches(num_batches=4))

    results = {}
    for tag, mc_room in (("free-field", False), ("room-ISM", True)):
        print(f"training {tag} ...", flush=True)
        model, state, scfg = train_one(tag, mc_room)
        noisy_sdr, enh_sdr = evaluate(model, state, scfg, eval_batches)
        results[tag] = (noisy_sdr, enh_sdr)
        print(f"{tag}: reverberant-eval SI-SDR noisy {noisy_sdr:.2f} -> enhanced {enh_sdr:.2f} dB",
              flush=True)
    ff, rm = results["free-field"][1], results["room-ISM"][1]
    print(f"\nroom-ISM-trained minus free-field-trained on reverberant eval: "
          f"{rm - ff:+.2f} dB SI-SDR")


if __name__ == "__main__":
    main()
