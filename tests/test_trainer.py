"""Trainer loop: epochs, checkpoint trio, resume, best tracking, config system."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cruse_tpu.dsp.stft import StftConfig, stft
from cruse_tpu.models import CruseNet, CruseConfig
from cruse_tpu.train.step import StepConfig, init_train_state
from cruse_tpu.train.checkpoint import save_checkpoint, restore_checkpoint, preload_params
from cruse_tpu.train.trainer import Trainer, TrainerConfig
from cruse_tpu.utils.config import (
    load_config,
    save_config,
    merge_config,
    initialize_module,
    AttrDict,
)


def _setup(rng, tmp_path, epochs=2):
    scfg = StftConfig(n_fft=320, hop_length=160)
    model = CruseNet(CruseConfig(in_freq=161, channels=(2, 4, 4, 8), rnn_groups=4))
    step_cfg = StepConfig(stft=scfg, learning_rate=1e-3)
    clean = rng.standard_normal((2, 4800)).astype(np.float32) * 0.1
    noise = rng.standard_normal((2, 4800)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(clean + noise), "clean": jnp.asarray(clean), "name": ["a", "b"]}
    feat = model.compress(jnp.abs(stft(batch["noisy"], scfg)))
    tcfg = TrainerConfig(
        epochs=epochs,
        steps_per_epoch=2,
        save_dir=str(tmp_path),
        experiment_name="t",
        metrics=("STOI", "SI_SDR"),
        visualization_examples=0,
    )
    return model, step_cfg, tcfg, batch, feat


def test_trainer_full_loop_and_resume(tmp_path, rng):
    model, step_cfg, tcfg, batch, feat = _setup(rng, tmp_path)
    trainer = Trainer(
        model, step_cfg, tcfg,
        train_batches=[batch, batch],
        validation_batches=[batch],
        example_feat=feat,
        writer=False,
    )
    trainer.train()
    ckpt = tmp_path / "t" / "checkpoints"
    assert (ckpt / "latest").exists()
    assert (ckpt / "best").exists()
    assert (ckpt / "model_0002").exists()
    assert int(trainer.state.step) == 4  # 2 epochs x 2 steps

    # resume continues from epoch 3
    trainer2 = Trainer(
        model, step_cfg, TrainerConfig(**{**tcfg.__dict__, "epochs": 3}),
        train_batches=[batch, batch],
        validation_batches=[batch],
        example_feat=feat,
        resume=True,
        writer=False,
    )
    assert trainer2.start_epoch == 3
    assert int(trainer2.state.step) == 4
    trainer2.train()
    assert int(trainer2.state.step) == 6


def test_preemption_checkpoint(tmp_path, rng):
    """SIGTERM mid-training checkpoints `latest` and exits cleanly; -R
    resumes from it (preemption-safe recovery beyond the reference's
    periodic-save-only story)."""
    import os
    import signal

    model, step_cfg, tcfg, batch, feat = _setup(rng, tmp_path, epochs=50)
    tcfg.validation_interval = 10**9  # no validation; pure train loop
    tcfg.save_checkpoint_interval = 10**9  # no periodic saves either

    sent = {"done": False}

    def batches():
        yield batch
        if not sent["done"]:
            sent["done"] = True
            os.kill(os.getpid(), signal.SIGTERM)  # preempt mid-epoch
        yield batch
        yield batch

    trainer = Trainer(
        model, step_cfg, tcfg,
        train_batches=batches,
        validation_batches=[batch],
        example_feat=feat,
        writer=False,
    )
    trainer.train()  # returns instead of dying
    ckpt = tmp_path / "t" / "checkpoints"
    assert (ckpt / "latest").exists(), "preemption checkpoint missing"
    saved_epoch = int(trainer.state.step)
    assert 0 < saved_epoch < 50 * tcfg.steps_per_epoch, "did not stop early"

    trainer2 = Trainer(
        model, step_cfg, tcfg,
        train_batches=[batch, batch],
        validation_batches=[batch],
        example_feat=feat,
        resume=True,
        writer=False,
    )
    assert int(trainer2.state.step) == saved_epoch


@pytest.mark.slow
def test_profiling_window_writes_trace(tmp_path, rng):
    """[trainer.profiling] captures a jax.profiler trace over the configured
    step window (the reference has no profiler at all, SURVEY.md §5)."""
    model, step_cfg, tcfg, batch, feat = _setup(rng, tmp_path, epochs=1)
    trace_dir = tmp_path / "trace"
    tcfg = TrainerConfig(**{**tcfg.__dict__,
                            "profiling": {"epoch": 1, "start_step": 1,
                                          "num_steps": 1,
                                          "trace_dir": str(trace_dir)}})
    trainer = Trainer(
        model, step_cfg, tcfg,
        train_batches=[batch, batch],
        validation_batches=[batch],
        example_feat=feat,
        writer=False,
    )
    trainer.train()
    traces = list(trace_dir.rglob("*.xplane.pb"))
    assert traces, f"no profiler trace written under {trace_dir}"


def test_only_validation_mode(tmp_path, rng):
    model, step_cfg, tcfg, batch, feat = _setup(rng, tmp_path, epochs=1)
    tcfg.only_validation = True
    trainer = Trainer(
        model, step_cfg, tcfg,
        validation_batches=[batch],
        example_feat=feat,
        writer=False,
    )
    trainer.train()
    assert int(trainer.state.step) == 0  # no training happened
    assert (tmp_path / "t" / "checkpoints" / "best").exists()


def test_checkpoint_roundtrip(tmp_path, rng):
    model, step_cfg, _, batch, feat = _setup(rng, tmp_path)
    state = init_train_state(model, step_cfg, jax.random.PRNGKey(0), feat)
    save_checkpoint(tmp_path / "ck", state, epoch=5, best_score=0.7, is_best_epoch=True)
    restored, start_epoch, best = restore_checkpoint(tmp_path / "ck", state)
    assert start_epoch == 6 and best == 0.7
    for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_preload_tolerates_missing(tmp_path, rng):
    model, step_cfg, _, batch, feat = _setup(rng, tmp_path)
    state = init_train_state(model, step_cfg, jax.random.PRNGKey(0), feat)
    save_checkpoint(tmp_path / "ck", state, epoch=1, best_score=0.0)
    # template with an extra param entry -> kept from template
    params2 = dict(jax.device_get(state.params))
    params2["extra_layer"] = {"w": np.ones(3, np.float32)}
    merged = preload_params(tmp_path / "ck" / "model_0001", params2)
    np.testing.assert_allclose(merged["extra_layer"]["w"], np.ones(3))


def test_config_system(tmp_path):
    cfg = {
        "meta": {"seed": 1, "use_amp": False, "experiment_name": "x"},
        "acoustics": {"n_fft": 320, "hop_length": 160, "win_length": 320, "sr": 16000},
        "model": {"path": "cruse_tpu.models.cruse.CruseConfig", "args": {"in_freq": 161}},
    }
    p = str(tmp_path / "c.toml")
    save_config(cfg, p)
    loaded = load_config(p)
    assert loaded == cfg

    merged = merge_config(cfg, {"acoustics": {"n_fft": 512}})
    assert merged["acoustics"]["n_fft"] == 512
    assert merged["acoustics"]["hop_length"] == 160
    with pytest.raises(KeyError):
        merge_config(cfg, {"bogus": 1})

    obj = initialize_module(loaded["model"]["path"], loaded["model"]["args"])
    assert obj.in_freq == 161
    cls = initialize_module(loaded["model"]["path"], initialize=False)
    assert cls.__name__ == "CruseConfig"


def test_attrdict_and_yaml(tmp_path):
    from cruse_tpu.utils.config import load_hparams, dump_hparams

    d = AttrDict({"a": 1, "b": {"c": 2}})
    assert d.a == 1 and d.b.c == 2
    dump_hparams({"x": 1, "y": {"z": 2}}, str(tmp_path / "h.yaml"))
    h = load_hparams(str(tmp_path / "h.yaml"))
    assert h.y.z == 2


def test_logger(tmp_path, capsys):
    from cruse_tpu.utils import logger

    logger.init(str(tmp_path / "log" / "train.log"))
    logger.log("hello", "world")
    logger.close()
    text = (tmp_path / "log" / "train.log").read_text()
    assert "hello world" in text


def test_lr_schedules():
    """Beyond-reference LR schedules: warmup ramps from 0, cosine decays to
    final_lr_scale * lr; constant stays the reference's fixed-LR Adam."""
    from cruse_tpu.train.step import StepConfig, make_lr

    const = make_lr(StepConfig())
    assert const == StepConfig().learning_rate

    warm = make_lr(StepConfig(warmup_steps=10))
    assert float(warm(0)) == 0.0
    assert abs(float(warm(10)) - StepConfig().learning_rate) < 1e-9

    cfg = StepConfig(learning_rate=1e-3, lr_schedule="cosine", warmup_steps=5,
                     decay_steps=50, final_lr_scale=0.1)
    sched = make_lr(cfg)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(5)) - 1e-3) < 1e-9
    assert abs(float(sched(50)) - 1e-4) < 1e-6
    assert float(sched(20)) < 1e-3


def test_train_step_with_cosine_schedule(rng):
    """The scheduled optimizer trains and the opt state round-trips the step
    counter (checkpoint compatibility)."""
    import jax
    import jax.numpy as jnp
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step

    scfg = StftConfig(n_fft=64, hop_length=32)
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    cfg = StepConfig(stft=scfg, learning_rate=1e-3, lr_schedule="cosine",
                     warmup_steps=2, decay_steps=10)
    clean = rng.standard_normal((2, 512)).astype(np.float32) * 0.1
    noisy = clean + rng.standard_normal((2, 512)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(noisy), "clean": jnp.asarray(clean)}
    feat = model.compress(jnp.abs(stft(batch["noisy"], scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = jax.jit(make_train_step(model, cfg))
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, m0 = step(state, batch)
    # warmup step 0: lr == 0 -> params unchanged
    np.testing.assert_allclose(jax.tree_util.tree_leaves(state.params)[0], p0)
    for _ in range(3):
        state, metrics = step(state, batch)
    # past warmup: params actually move
    assert not np.allclose(jax.tree_util.tree_leaves(state.params)[0], p0)
    assert np.isfinite(float(metrics["loss_si_snr"]))


def test_ema_params_track_and_guard(rng):
    """EMA weights follow the params at the configured decay and the
    validation path prefers them."""
    import jax
    import jax.numpy as jnp
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step

    scfg = StftConfig(n_fft=64, hop_length=32)
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    cfg = StepConfig(stft=scfg, learning_rate=1e-3, ema_decay=0.5)
    clean = rng.standard_normal((2, 512)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(clean + rng.standard_normal((2, 512)).astype(np.float32) * 0.1),
             "clean": jnp.asarray(clean)}
    feat = model.compress(jnp.abs(stft(batch["noisy"], scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    assert state.ema_params is not None
    step = jax.jit(make_train_step(model, cfg))
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state, _ = step(state, batch)
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    e1 = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    np.testing.assert_allclose(e1, 0.5 * p0 + 0.5 * p1, rtol=1e-6, atol=1e-7)

    # checkpoint round-trip keeps the EMA tree
    import tempfile
    from cruse_tpu.train.checkpoint import save_checkpoint, restore_checkpoint
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, state, epoch=1, best_score=0.0)
        restored, _, _ = restore_checkpoint(d, state)
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(restored.ema_params)[0]), e1, atol=1e-7
        )


def test_grad_accumulation_applies_every_k(rng):
    """grad_accum_steps=2: params stay frozen on the accumulation step and
    move on the boundary (optax.MultiSteps semantics)."""
    import jax
    import jax.numpy as jnp
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step

    scfg = StftConfig(n_fft=64, hop_length=32)
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    cfg = StepConfig(stft=scfg, learning_rate=1e-3, grad_accum_steps=2)
    clean = rng.standard_normal((2, 512)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(clean + rng.standard_normal((2, 512)).astype(np.float32) * 0.1),
             "clean": jnp.asarray(clean)}
    feat = model.compress(jnp.abs(stft(batch["noisy"], scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = jax.jit(make_train_step(model, cfg))
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state, _ = step(state, batch)
    np.testing.assert_allclose(np.asarray(jax.tree_util.tree_leaves(state.params)[0]), p0)
    state, _ = step(state, batch)
    assert not np.allclose(np.asarray(jax.tree_util.tree_leaves(state.params)[0]), p0)


def test_snapshot_carries_ema_and_preload_prefers_it(tmp_path, rng):
    """With EMA on, the per-epoch snapshot must contain ema_params and
    preload_variables must load THOSE (the weights that produced the
    validated best score), not the raw training params."""
    from cruse_tpu.train.checkpoint import preload_variables
    from cruse_tpu.train.step import init_train_state

    scfg = StftConfig(n_fft=64, hop_length=32)
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    cfg = StepConfig(stft=scfg, ema_decay=0.9)
    feat = model.compress(jnp.abs(stft(jnp.zeros((1, 512)), scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    # make EMA weights visibly different from the raw params
    state = state._replace(ema_params=jax.tree.map(lambda p: p + 1.0, state.params))
    d = tmp_path / "ck"
    save_checkpoint(d, state, epoch=3, best_score=0.0)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    loaded = preload_variables(d / "model_0003", variables)
    want = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    got = np.asarray(jax.tree_util.tree_leaves(loaded["params"])[0])
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_resume_pre_ema_checkpoint_with_ema_newly_enabled(tmp_path, rng):
    """A 'latest' written before EMA was enabled must still resume when the
    new run has ema_decay set: ema_params warm-starts from the restored
    params instead of orbax raising on the missing subtree."""
    from cruse_tpu.train.step import init_train_state

    scfg = StftConfig(n_fft=64, hop_length=32)
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    feat = model.compress(jnp.abs(stft(jnp.zeros((1, 512)), scfg)))
    state_no_ema = init_train_state(
        model, StepConfig(stft=scfg), jax.random.PRNGKey(0), feat
    )
    assert state_no_ema.ema_params is None
    d = tmp_path / "ck"
    save_checkpoint(d, state_no_ema, epoch=1, best_score=0.5)

    template = init_train_state(
        model, StepConfig(stft=scfg, ema_decay=0.99), jax.random.PRNGKey(1), feat
    )
    restored, start_epoch, best = restore_checkpoint(d, template)
    assert start_epoch == 2 and best == 0.5
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
    )


def test_preload_stale_layout_fails_loudly(tmp_path, rng):
    """A checkpoint whose parameter tree matches ZERO template leaves (e.g.
    a pre-rewrite layout) must raise, not silently return random init."""
    import orbax.checkpoint as ocp
    from cruse_tpu.train.step import init_train_state

    scfg = StftConfig(n_fft=64, hop_length=32)
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    feat = model.compress(jnp.abs(stft(jnp.zeros((1, 512)), scfg)))
    state = init_train_state(model, StepConfig(stft=scfg), jax.random.PRNGKey(0), feat)
    stale = tmp_path / "stale"
    ocp.PyTreeCheckpointer().save(
        stale, {"params": {"old_layer": {"w": np.zeros((3, 3), np.float32)}}}
    )
    with pytest.raises(ValueError, match="0 of"):
        preload_params(stale, state.params)


def test_weight_decay_optimizer():
    """[optimizer] weight_decay > 0 switches to decoupled AdamW: zero
    gradients still shrink weight matrices toward zero (1-D leaves are
    masked out), while plain Adam leaves everything untouched (the
    reference runs fixed-LR Adam only)."""
    import jax.numpy as jnp
    import optax

    from cruse_tpu.dsp.stft import StftConfig
    from cruse_tpu.train.step import StepConfig, make_optimizer

    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)

    def run(cfg):
        tx = make_optimizer(cfg)
        st = tx.init(params)
        upd, _ = tx.update(zeros, st, params)
        return optax.apply_updates(params, upd)

    scfg = StftConfig(n_fft=320, hop_length=160)
    plain = run(StepConfig(stft=scfg))
    decayed = run(StepConfig(stft=scfg, weight_decay=0.1))
    np.testing.assert_allclose(np.asarray(plain["w"]), 1.0)
    assert np.all(np.asarray(decayed["w"]) < 1.0)
    # 1-D leaves (biases, norm scales) are masked out of the decay
    np.testing.assert_allclose(np.asarray(decayed["b"]), 1.0)


def test_flatten_optimizer_matches_tree_path():
    """StepConfig.flatten_optimizer ravels the param leaves into one flat
    vector for clip+Adam (a kernel-count knob, measured perf-neutral on
    MTFAA bench shapes where XLA already fuses the update -- see STATUS).
    Updates must match the tree path bitwise-closely, freeze masks must
    still pin their params, and weight_decay must be rejected (the AdamW
    ndim mask cannot see leaf boundaries in the flat vector)."""
    import jax.numpy as jnp
    import optax

    from cruse_tpu.dsp.stft import StftConfig
    from cruse_tpu.train.step import StepConfig, make_optimizer

    params = {"enc": {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))},
              "dec": {"w": jnp.full((2, 5), 0.5)}}
    r = np.random.default_rng(1)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(r.standard_normal(p.shape), jnp.float32), params)
    scfg = StftConfig(n_fft=320, hop_length=160)

    def run(cfg):
        tx = make_optimizer(cfg)
        st = tx.init(params)
        new = params
        for _ in range(3):
            upd, st = tx.update(grads, st, new)
            new = optax.apply_updates(new, upd)
        return new

    tree = run(StepConfig(stft=scfg))
    flat = run(StepConfig(stft=scfg, flatten_optimizer=True))
    for a, b in zip(jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # freeze masks stay OUTSIDE the flat vector and keep working
    frozen = run(StepConfig(stft=scfg, flatten_optimizer=True, freeze=("enc",)))
    np.testing.assert_array_equal(np.asarray(frozen["enc"]["w"]),
                                  np.asarray(params["enc"]["w"]))
    assert not np.allclose(np.asarray(frozen["dec"]["w"]),
                           np.asarray(params["dec"]["w"]))
    with pytest.raises(ValueError, match="flatten_optimizer"):
        make_optimizer(StepConfig(stft=scfg, flatten_optimizer=True,
                                  weight_decay=0.1))


def test_restore_ema_fallback_is_narrow(tmp_path, rng):
    """Resuming with EMA newly enabled from a pre-EMA checkpoint warm-starts
    ema_params from the restored params; but if the checkpoint DOES carry
    ema_params and the restore fails anyway, it must raise instead of
    silently resetting the validated EMA weights (review finding)."""
    import jax
    import jax.numpy as jnp
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.train.step import StepConfig, init_train_state
    from cruse_tpu.train.checkpoint import save_checkpoint, restore_checkpoint

    scfg = StftConfig(n_fft=64, hop_length=32)
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    feat = model.compress(jnp.abs(stft(jnp.zeros((1, 512)), scfg)))

    # 1. pre-EMA checkpoint -> EMA template: warm-start from params
    no_ema = init_train_state(model, StepConfig(stft=scfg), jax.random.PRNGKey(0), feat)
    save_checkpoint(tmp_path / "a", no_ema, epoch=3, best_score=0.1)
    with_ema = init_train_state(
        model, StepConfig(stft=scfg, ema_decay=0.9), jax.random.PRNGKey(1), feat)
    restored, start, _ = restore_checkpoint(tmp_path / "a", with_ema)
    assert start == 4 and restored.ema_params is not None
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]))

    # 2. the fallback's gate: the on-disk metadata distinguishes a genuine
    # pre-EMA checkpoint (ema_params saved as None) from one that carries
    # EMA weights -- restore only falls back in the former case, so a
    # failed restore of an EMA-bearing checkpoint raises instead of
    # silently resetting EMA to the raw params
    import orbax.checkpoint as ocp

    save_checkpoint(tmp_path / "b", with_ema, epoch=1, best_score=0.0)
    cp = ocp.PyTreeCheckpointer()
    assert cp.metadata(tmp_path / "a" / "latest").item_metadata.get("ema_params") is None
    assert cp.metadata(tmp_path / "b" / "latest").item_metadata.get("ema_params") is not None


def test_remat_policy_validated(rng):
    """A typo'd remat policy raises instead of silently selecting
    recompute-everything (review finding)."""
    import jax
    import jax.numpy as jnp
    import pytest
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step

    scfg = StftConfig(n_fft=64, hop_length=32)
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    cfg = StepConfig(stft=scfg, remat="full")  # not a valid policy name
    clean = rng.standard_normal((1, 256)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(clean), "clean": jnp.asarray(clean)}
    feat = model.compress(jnp.abs(stft(batch["noisy"], scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    with pytest.raises(ValueError, match="remat"):
        jax.jit(make_train_step(model, cfg))(state, batch)


def test_freeze_patterns_pin_matching_params(rng):
    """[optimizer] freeze zeroes updates for matching parameter paths: the
    fine-tune-after-import flow (freeze the encoder, adapt the rest)."""
    import jax
    import jax.numpy as jnp
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step

    scfg = StftConfig(n_fft=64, hop_length=32)
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    cfg = StepConfig(stft=scfg, learning_rate=1e-2, freeze=("enc",))
    clean = rng.standard_normal((2, 512)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(clean + rng.standard_normal((2, 512)).astype(np.float32) * 0.1),
             "clean": jnp.asarray(clean)}
    feat = model.compress(jnp.abs(stft(batch["noisy"], scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    before = jax.device_get(state.params)
    state, _ = jax.jit(make_train_step(model, cfg))(state, batch)
    after = jax.device_get(state.params)

    moved = frozen = 0
    for path, b in jax.tree_util.tree_flatten_with_path(before)[0]:
        key = jax.tree_util.keystr(path)
        a = after
        for k in path:
            a = a[k.key]
        if "enc" in key:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            frozen += 1
        elif not np.allclose(np.asarray(a), np.asarray(b)):
            moved += 1
    assert frozen > 0 and moved > 0  # both populations exist and behave


def test_early_stopping_patience(tmp_path, rng, monkeypatch):
    """[trainer.validation] patience stops the loop after N validations
    without a new best (the reference always burns its full epoch budget)."""
    import jax
    import jax.numpy as jnp
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.train.step import StepConfig
    from cruse_tpu.train.trainer import Trainer, TrainerConfig

    scfg = StftConfig(n_fft=64, hop_length=32)
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    clean = rng.standard_normal((2, 512)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(clean), "clean": jnp.asarray(clean)}
    feat = model.compress(jnp.abs(stft(batch["noisy"], scfg)))
    trainer = Trainer(
        model, StepConfig(stft=scfg),
        TrainerConfig(epochs=6, steps_per_epoch=1, patience=2,
                      save_dir=str(tmp_path), experiment_name="es",
                      visualization_examples=0, metrics=("STOI", "SI_SDR")),
        train_batches=lambda: iter([batch]),
        validation_batches=[batch],
        example_feat=feat, writer=False,
    )
    monkeypatch.setattr(trainer, "_is_best_epoch", lambda score: False)
    epochs_trained = []
    orig = trainer._train_epoch
    monkeypatch.setattr(trainer, "_train_epoch",
                        lambda e: (epochs_trained.append(e), orig(e))[1])
    trainer.train()
    # never-best + patience 2: epoch 1/2 validations score async, the stop
    # flag latches at epoch 3's harvest at the latest -> well short of 6
    assert len(epochs_trained) <= 4, epochs_trained


def test_trainer_passes_epoch_to_curriculum_factory(tmp_path, rng):
    """Factories that accept epoch= get the 1-based epoch each time (the
    [train_dataset.curriculum] SNR-annealing hook), through the
    PrefetchingLoader."""
    from cruse_tpu.data.prefetch import PrefetchingLoader

    model, step_cfg, tcfg, batch, feat = _setup(rng, tmp_path)
    seen = []

    def make_batches(epoch=1):
        seen.append(epoch)
        return iter([batch, batch])

    trainer = Trainer(
        model, step_cfg, tcfg,
        train_batches=PrefetchingLoader(make_batches),
        validation_batches=[batch],
        example_feat=feat,
        writer=False,
    )
    trainer.train()
    assert seen == [1, 2], seen
