"""Knowledge distillation: frozen teacher -> student through the train step,
the Trainer, and the CLI config surface.

Beyond the reference (which deploys whatever it trained): the standard
compress-a-big-offline-model-into-a-small-streaming-model recipe, driven by
the 'distill' entry in loss_weights + a (teacher_model, teacher_variables)
pair. Any zoo family can teach any other since every forward adapter emits
enhanced RI spectra (train/step.py forward_for_model).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft
from cruse_tpu.models import CruseNet, CruseConfig
from cruse_tpu.train.step import (
    StepConfig,
    init_train_state,
    make_train_step,
    forward_for_model,
)

SCFG = StftConfig(n_fft=64, hop_length=32)


def _batch(rng, b=2, n=2000):
    clean = jnp.asarray(rng.standard_normal((b, n)) * 0.1, jnp.float32)
    noisy = clean + jnp.asarray(rng.standard_normal((b, n)) * 0.05, jnp.float32)
    return {"noisy": noisy, "clean": clean}


def _teacher(rng_key=0, channels=(4, 8)):
    model = CruseNet(CruseConfig(in_freq=33, channels=channels, rnn_groups=2))
    feat = model.compress(jnp.abs(stft(jnp.zeros((1, 2000)), SCFG)))
    variables = model.init(jax.random.PRNGKey(rng_key), feat)
    return model, variables


def test_distill_requires_teacher():
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    cfg = StepConfig(stft=SCFG, loss_weights=(("distill", 1.0),))
    with pytest.raises(ValueError, match="teacher"):
        make_train_step(model, cfg)


def test_student_distills_toward_teacher(rng):
    """The distill loss (spectral distance to the frozen teacher's output)
    decreases over steps, and the teacher never moves."""
    t_model, t_vars = _teacher()
    student = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    cfg = StepConfig(stft=SCFG, learning_rate=3e-3,
                     loss_weights=(("distill", 1.0),))
    batch = _batch(rng)
    feat = student.compress(jnp.abs(stft(batch["noisy"], SCFG)))
    state = init_train_state(student, cfg, jax.random.PRNGKey(1), feat)
    t_leaf0 = np.asarray(jax.tree_util.tree_leaves(t_vars["params"])[0]).copy()
    step = jax.jit(make_train_step(
        student, cfg, teacher=(forward_for_model(t_model), t_vars)))
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss_distill"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0], losses
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(t_vars["params"])[0]), t_leaf0)


def test_distill_cross_family(rng):
    """A complex-spectrum family (FullSubNet/cIRM) teaches a magnitude-mask
    family (CRUSE): the adapters meet at the enhanced RI spectrum."""
    from cruse_tpu.models.fullsubnet import FullSubNet, FullSubNetConfig

    t_model = FullSubNet(FullSubNetConfig(
        num_freqs=33, num_neighbors=3, fb_hidden=16, fb_layers=1,
        sb_hidden=12, sb_layers=1))
    batch = _batch(rng)
    t_feat = jnp.abs(stft(batch["noisy"], SCFG))
    t_vars = t_model.init(jax.random.PRNGKey(0), t_feat)

    student = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    cfg = StepConfig(stft=SCFG, learning_rate=3e-3,
                     loss_weights=(("distill", 1.0), ("si_snr", 0.1)))
    feat = student.compress(t_feat)
    state = init_train_state(student, cfg, jax.random.PRNGKey(1), feat)
    step = jax.jit(make_train_step(
        student, cfg, teacher=(forward_for_model(t_model), t_vars)))
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss_distill"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_trainer_distillation_end_to_end(tmp_path, rng):
    """Trainer(teacher=...) runs the full epoch loop with the distill loss
    and checkpoints the STUDENT (the deployable artifact)."""
    from cruse_tpu.train.trainer import Trainer, TrainerConfig

    t_model, t_vars = _teacher()
    student = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    cfg = StepConfig(stft=SCFG, learning_rate=1e-3,
                     loss_weights=(("distill", 1.0), ("si_snr", 0.3)))
    batch = dict(_batch(rng), name=["a", "b"])
    feat = student.compress(jnp.abs(stft(batch["noisy"], SCFG)))
    tcfg = TrainerConfig(
        epochs=2, steps_per_epoch=2, save_dir=str(tmp_path),
        experiment_name="distill", metrics=("STOI", "SI_SDR"),
        visualization_examples=0,
    )
    trainer = Trainer(
        student, cfg, tcfg,
        train_batches=[batch, batch],
        validation_batches=[batch],
        example_feat=feat,
        writer=False,
        teacher=(t_model, t_vars),
    )
    trainer.train()
    ckpt = tmp_path / "distill" / "checkpoints"
    assert (ckpt / "latest").exists()
    # the saved tree is the student's (shape check on the first conv kernel)
    from cruse_tpu.train.checkpoint import preload_params

    student_params = trainer.state.params
    merged = preload_params(ckpt / "model_0002", jax.device_get(student_params))
    s0 = jax.tree_util.tree_leaves(student_params)[0]
    assert np.asarray(jax.tree_util.tree_leaves(merged)[0]).shape == s0.shape
