"""FullSubNet sub-band ops: golden parity vs torch references
(train_base/model/base_model.py:18-86 semantics) + the consumer model."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.nn.subband import freq_unfold, reduce_complexity_separately


def _torch_unfold_reference(x_bcft, num_neighbor):
    """Scalar/torch golden for the reference unfold: [B, C, F, T] ->
    [B, F, C, 2n+1, T] via reflect pad + im2col."""
    import torch
    from torch.nn import functional

    inp = torch.from_numpy(x_bcft)
    b, c, f, t = inp.shape
    if num_neighbor < 1:
        return inp.permute(0, 2, 1, 3).reshape(b, f, c, 1, t).numpy()
    out = inp.reshape(b * c, 1, f, t)
    size = num_neighbor * 2 + 1
    out = functional.pad(out, [0, 0, num_neighbor, num_neighbor], mode="reflect")
    out = functional.unfold(out, (size, t))
    out = out.reshape(b, c, size, t, f).permute(0, 4, 1, 2, 3)
    return out.contiguous().numpy()


def test_freq_unfold_matches_torch_golden(rng):
    x = rng.standard_normal((2, 1, 33, 10)).astype(np.float32)  # [B, C, F, T]
    for n in (0, 1, 5, 15):
        golden = _torch_unfold_reference(x, n)  # [B, F, C, S, T]
        # ours is time-major [B, T, F] -> [B, T, F, S]
        ours = np.asarray(freq_unfold(jnp.asarray(x[:, 0].transpose(0, 2, 1)), n))
        np.testing.assert_allclose(
            ours, golden[:, :, 0].transpose(0, 3, 1, 2), atol=0, err_msg=f"n={n}"
        )


def test_freq_unfold_edge_reflection():
    # F=5, n=2: unit at f=0 must be [2, 1, 0, 1, 2] (reflect, edge not repeated)
    x = jnp.arange(5.0)[None, None, :]  # [1, 1, 5]
    out = np.asarray(freq_unfold(x, 2))
    np.testing.assert_array_equal(out[0, 0, 0], [2, 1, 0, 1, 2])
    np.testing.assert_array_equal(out[0, 0, 4], [2, 3, 4, 3, 2])


def test_reduce_complexity_separately_matches_reference_semantics(rng):
    b, t, f, s1, s2 = 6, 4, 17, 5, 1
    sub = rng.standard_normal((b, t, f, s1)).astype(np.float32)
    full = rng.standard_normal((b, t, f, s2)).astype(np.float32)
    out = np.asarray(reduce_complexity_separately(jnp.asarray(sub), jnp.asarray(full)))
    n_sel = min(len(range(g + 1, f - 1, 3)) for g in range(3))
    assert out.shape == (b, t, n_sel, s1 + s2)
    # group 0 = batch items 0..1 on freqs 1, 4, 7, ...
    freqs0 = list(range(1, f - 1, 3))[:n_sel]
    np.testing.assert_allclose(out[0, :, :, :s1], sub[0][:, freqs0])
    np.testing.assert_allclose(out[1, :, :, s1:], full[1][:, freqs0])
    # group 2 = batch items 4..5 on freqs 3, 6, 9, ...
    freqs2 = list(range(3, f - 1, 3))[:n_sel]
    np.testing.assert_allclose(out[4, :, :, :s1], sub[4][:, freqs2])


def test_fullsubnet_trains(rng):
    """The FullSubNet consumer: cIRM output, loss decreases through the
    fullsubnet adapter."""
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models.fullsubnet import FullSubNet, FullSubNetConfig
    from cruse_tpu.train.step import (
        StepConfig,
        forward_for_model,
        init_train_state,
        make_train_step,
    )

    scfg = StftConfig(n_fft=128, hop_length=64)
    model = FullSubNet(
        FullSubNetConfig(num_freqs=65, num_neighbors=2, fb_hidden=32, sb_hidden=16)
    )
    cfg = StepConfig(stft=scfg, learning_rate=1e-3)
    clean = rng.standard_normal((2, 1600)).astype(np.float32) * 0.1
    batch = {
        "noisy": jnp.asarray(clean + rng.standard_normal((2, 1600)).astype(np.float32) * 0.1),
        "clean": jnp.asarray(clean),
    }
    mag = jnp.abs(stft(batch["noisy"], scfg))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), mag)
    step = jax.jit(make_train_step(model, cfg, forward=forward_for_model(model)))
    first = None
    for _ in range(6):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss_si_snr"])
    assert np.isfinite(float(metrics["loss_si_snr"]))
    assert float(metrics["loss_si_snr"]) < first


@pytest.mark.slow
def test_fullsubnet_streaming_exact(rng):
    """With the cumulative norm, chunked calls (GRU + norm carries threaded)
    are bit-exact with one full-sequence call."""
    from cruse_tpu.models.fullsubnet import FullSubNet, FullSubNetConfig

    model = FullSubNet(
        FullSubNetConfig(
            num_freqs=9, num_neighbors=1, fb_hidden=8, sb_hidden=8,
            norm="cumulative_laplace_norm",
        )
    )
    mag = jnp.asarray(np.abs(rng.standard_normal((1, 6, 9))).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), mag)
    full, _ = model.apply(variables, mag, model.init_state(1))
    st = model.init_state(1)
    out1, st = model.apply(variables, mag[:, :3], st)
    out2, st = model.apply(variables, mag[:, 3:], st)
    chunked = np.concatenate([np.asarray(out1), np.asarray(out2)], axis=1)
    np.testing.assert_allclose(chunked, np.asarray(full), atol=1e-6)
