"""CRUSE flagship model: shapes, causality, streaming parity, jit, train step."""
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.models import CruseNet, CruseConfig
from cruse_tpu.dsp.stft import StftConfig, stft
from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step


def _small_model():
    return CruseNet(CruseConfig(in_freq=161, channels=(4, 8, 8, 16), rnn_groups=4))


def test_forward_shape_and_range(rng):
    net = _small_model()
    feat = jnp.asarray(np.abs(rng.standard_normal((2, 16, 161))).astype(np.float32))
    v = net.init(jax.random.PRNGKey(0), feat)
    mask, state = net.apply(v, feat)
    assert mask.shape == (2, 16, 161)
    m = np.asarray(mask)
    assert (m >= 0).all() and (m <= 1).all()


def test_causality(rng):
    net = _small_model()
    feat = np.abs(rng.standard_normal((1, 20, 161))).astype(np.float32)
    v = net.init(jax.random.PRNGKey(0), jnp.asarray(feat))
    m1, _ = net.apply(v, jnp.asarray(feat))
    feat2 = feat.copy()
    feat2[:, 12:] *= 5.0
    m2, _ = net.apply(v, jnp.asarray(feat2))
    np.testing.assert_allclose(np.asarray(m1)[:, :12], np.asarray(m2)[:, :12], atol=1e-6)
    assert np.abs(np.asarray(m1)[:, 12:] - np.asarray(m2)[:, 12:]).max() > 1e-4


def test_streaming_matches_batch_chunked(rng):
    net = _small_model()
    feat = jnp.asarray(np.abs(rng.standard_normal((1, 24, 161))).astype(np.float32))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), feat)
    full, _ = jax.jit(net.apply)(v, feat)
    step = jax.jit(net.apply)
    state = None
    outs = []
    # uneven chunk sizes on purpose
    for chunk in (feat[:, :5], feat[:, 5:6], feat[:, 6:16], feat[:, 16:]):
        m, state = step(v, chunk, state)
        outs.append(np.asarray(m))
    stream = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(stream, np.asarray(full), atol=1e-5)


def test_jit_forward(rng):
    net = _small_model()
    feat = jnp.asarray(np.abs(rng.standard_normal((2, 16, 161))).astype(np.float32))
    v = net.init(jax.random.PRNGKey(0), feat)
    fn = jax.jit(lambda v, f: net.apply(v, f)[0])
    m = fn(v, feat)
    assert np.isfinite(np.asarray(m)).all()


def test_full_size_param_count():
    """Flagship size sanity: ~1.5M params (CRUSE-scale, not a toy)."""
    net = CruseNet(CruseConfig())
    feat = jnp.zeros((1, 4, 161))
    # shapes only -- eval_shape skips initialization compute entirely
    v = jax.eval_shape(net.init, jax.random.PRNGKey(0), feat)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    assert 1e6 < n < 3e6


def test_train_step_decreases_loss(rng):
    scfg = StftConfig(n_fft=320, hop_length=160)
    model = _small_model()
    cfg = StepConfig(stft=scfg, learning_rate=1e-3)
    clean = rng.standard_normal((4, 4800)).astype(np.float32) * 0.1
    noise = rng.standard_normal((4, 4800)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(clean + noise), "clean": jnp.asarray(clean)}
    feat = model.compress(jnp.abs(stft(batch["noisy"], scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = jax.jit(make_train_step(model, cfg))
    first_loss = None
    for i in range(8):
        state, metrics = step(state, batch)
        if first_loss is None:
            first_loss = float(metrics["loss_si_snr"])
    last_loss = float(metrics["loss_si_snr"])
    assert np.isfinite(last_loss)
    assert last_loss < first_loss, (first_loss, last_loss)
    assert int(state.step) == 8


def test_train_step_alternate_losses(rng):
    """wo_male + multi_res wiring through the balancer."""
    scfg = StftConfig(n_fft=320, hop_length=160)
    model = _small_model()
    cfg = StepConfig(
        stft=scfg,
        loss_weights=(("si_snr", 1.0), ("wo_male", 0.5), ("multi_res", 0.5)),
    )
    clean = rng.standard_normal((2, 3200)).astype(np.float32) * 0.1
    batch = {
        "noisy": jnp.asarray(clean + rng.standard_normal((2, 3200)).astype(np.float32) * 0.1),
        "clean": jnp.asarray(clean),
    }
    feat = model.compress(jnp.abs(stft(batch["noisy"], scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = jax.jit(make_train_step(model, cfg))
    state, metrics = step(state, batch)
    for k in ("loss_si_snr", "loss_wo_male", "loss_multi_res"):
        assert np.isfinite(float(metrics[k])), k


def test_train_step_sdnr_loss(rng):
    """sdnr is selectable from loss_weights (VAD-gated, SNR-weighted,
    reference loss.py:151-175) and trains."""
    scfg = StftConfig(n_fft=320, hop_length=160)
    model = _small_model()
    cfg = StepConfig(stft=scfg, loss_weights=(("si_snr", 1.0), ("sdnr", 1.0)))
    clean = rng.standard_normal((2, 3200)).astype(np.float32) * 0.1
    batch = {
        "noisy": jnp.asarray(clean + rng.standard_normal((2, 3200)).astype(np.float32) * 0.1),
        "clean": jnp.asarray(clean),
    }
    feat = model.compress(jnp.abs(stft(batch["noisy"], scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = jax.jit(make_train_step(model, cfg))
    first = None
    for _ in range(4):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss_sdnr"])
    assert np.isfinite(float(metrics["loss_sdnr"]))
    assert float(metrics["loss_sdnr"]) < first


def test_train_step_bf16_compute(rng):
    """compute_dtype='bfloat16': fwd/bwd in bf16, fp32 master params; loss
    still decreases and params/opt state stay fp32."""
    scfg = StftConfig(n_fft=320, hop_length=160)
    model = _small_model()
    cfg = StepConfig(stft=scfg, learning_rate=1e-3, compute_dtype="bfloat16")
    clean = rng.standard_normal((4, 4800)).astype(np.float32) * 0.1
    noise = rng.standard_normal((4, 4800)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(clean + noise), "clean": jnp.asarray(clean)}
    feat = model.compress(jnp.abs(stft(batch["noisy"], scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = jax.jit(make_train_step(model, cfg))
    first = None
    for _ in range(8):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss_si_snr"])
    assert float(metrics["loss_si_snr"]) < first, (first, float(metrics["loss_si_snr"]))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_nonfinite_gradient_guard(rng):
    """A poisoned batch (NaNs) must not corrupt the parameters."""
    scfg = StftConfig(n_fft=320, hop_length=160)
    model = _small_model()
    cfg = StepConfig(stft=scfg)
    good = rng.standard_normal((2, 3200)).astype(np.float32) * 0.1
    batch_bad = {
        "noisy": jnp.asarray(good).at[0, 100].set(jnp.nan),
        "clean": jnp.asarray(good),
    }
    feat = model.compress(jnp.abs(stft(jnp.asarray(good), scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = jax.jit(make_train_step(model, cfg))
    new_state, metrics = step(state, batch_bad)
    assert float(metrics["nonfinite_skipped"]) == 1.0
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(new_state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a clean batch still updates
    batch_good = {"noisy": jnp.asarray(good), "clean": jnp.asarray(good * 0.5)}
    new_state2, metrics2 = step(new_state, batch_good)
    assert float(metrics2["nonfinite_skipped"]) == 0.0


def test_batch_stats_update(rng):
    scfg = StftConfig(n_fft=320, hop_length=160)
    model = _small_model()
    cfg = StepConfig(stft=scfg)
    batch = {
        "noisy": jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32)),
        "clean": jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32)),
    }
    feat = model.compress(jnp.abs(stft(batch["noisy"], scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    before = jax.tree_util.tree_leaves(state.batch_stats)[0]
    step = jax.jit(make_train_step(model, cfg))
    state2, _ = step(state, batch)
    after = jax.tree_util.tree_leaves(state2.batch_stats)[0]
    assert np.abs(np.asarray(before) - np.asarray(after)).max() > 0
