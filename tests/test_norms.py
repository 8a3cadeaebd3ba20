"""Streaming-norm parity vs scalar torch goldens (base_model.py semantics)."""
import numpy as np
import torch
import jax.numpy as jnp

from cruse_tpu.nn import norms


def _torch_forgetting_norm(x_bft, sample_length):
    """Scalar golden: base_model.py:124-155 (input [B, F, T])."""
    x = torch.from_numpy(x_bft)
    b, f, t = x.shape
    eps = 1e-10
    mu = 0
    alpha = (sample_length - 1) / (sample_length + 1)
    mu_list = []
    for idx in range(t):
        if idx < sample_length:
            alp = min((idx - 1) / (idx + 1), alpha)
            mu = alp * mu + (1 - alp) * torch.mean(x[:, :, idx], dim=1).reshape(b, 1)
        else:
            mu = alpha * mu + (1 - alpha) * torch.mean(x[:, :, idx], dim=1).reshape(b, 1)
        mu_list.append(mu)
    mu = torch.stack(mu_list, dim=-1)
    return (x / (mu + eps)).numpy()


def test_forgetting_norm_matches_golden(rng):
    x = np.abs(rng.standard_normal((2, 16, 40))).astype(np.float32)  # [B, F, T]
    ref = _torch_forgetting_norm(x, 20)
    ours = np.asarray(norms.forgetting_norm(jnp.asarray(np.transpose(x, (0, 2, 1))), 20))
    np.testing.assert_allclose(np.transpose(ours, (0, 2, 1)), ref, atol=1e-4)


def test_cumulative_laplace_norm_matches_golden(rng):
    x = np.abs(rng.standard_normal((2, 3, 16, 25))).astype(np.float32)  # [B,C,F,T]
    xt = torch.from_numpy(x)
    b, c, f, t = xt.shape
    xr = xt.reshape(b * c, f, t)
    step_sum = torch.sum(xr, dim=1)
    cum = torch.cumsum(step_sum, dim=-1)
    cnt = torch.arange(f, f * t + 1, f, dtype=xt.dtype).reshape(1, t).expand_as(cum)
    mean = (cum / cnt).reshape(b * c, 1, t)
    ref = (xr / (mean + 1e-10)).reshape(b, c, f, t).numpy()

    ours = np.asarray(
        norms.cumulative_laplace_norm(jnp.asarray(np.transpose(x, (0, 1, 3, 2))))
    )
    np.testing.assert_allclose(np.transpose(ours, (0, 1, 3, 2)), ref, atol=1e-4)


def test_cumulative_layer_norm_matches_golden(rng):
    x = np.abs(rng.standard_normal((2, 1, 8, 30))).astype(np.float32)
    xt = torch.from_numpy(x)
    b, c, f, t = xt.shape
    xr = xt.reshape(b * c, f, t)
    s = torch.sum(xr, dim=1)
    p = torch.sum(xr**2, dim=1)
    cs, cp = torch.cumsum(s, -1), torch.cumsum(p, -1)
    cnt = torch.arange(f, f * t + 1, f, dtype=xt.dtype).reshape(1, t).expand_as(cs)
    cm = cs / cnt
    cv = (cp - 2 * cm * cs) / cnt + cm.pow(2)
    cstd = torch.sqrt(cv + 1e-10)
    ref = ((xr - cm.reshape(-1, 1, t)) / cstd.reshape(-1, 1, t)).reshape(b, c, f, t).numpy()

    ours = np.asarray(norms.cumulative_layer_norm(jnp.asarray(np.transpose(x, (0, 1, 3, 2)))))
    np.testing.assert_allclose(np.transpose(ours, (0, 1, 3, 2)), ref, atol=2e-4)


def test_cumulative_layer_norm_carry_chunk_exact(rng):
    """Chunked calls threading the (sum, power, count) carry are bit-exact
    with one full-sequence cumulative_layer_norm call (the causal-BSRNN
    streaming contract)."""
    x = np.abs(rng.standard_normal((3, 20, 16))).astype(np.float32)
    full = np.asarray(norms.cumulative_layer_norm(jnp.asarray(x)))
    full_carry, _ = norms.cumulative_layer_norm_carry(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(full_carry), full, atol=1e-6)

    carry = None
    outs = []
    for lo, hi in ((0, 7), (7, 8), (8, 20)):  # ragged chunks incl. T=1
        y, carry = norms.cumulative_layer_norm_carry(jnp.asarray(x[:, lo:hi]), carry)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full, atol=1e-6)


def test_offline_norms(rng):
    x = np.abs(rng.standard_normal((2, 1, 10, 20))).astype(np.float32)
    xt = torch.from_numpy(x)
    ref_l = (xt / (torch.mean(xt, dim=(1, 2, 3), keepdim=True) + 1e-5)).numpy()
    ref_g = (
        (xt - torch.mean(xt, dim=(1, 2, 3), keepdim=True))
        / (torch.std(xt, dim=(1, 2, 3), keepdim=True) + 1e-5)
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(norms.offline_laplace_norm(jnp.asarray(x))), ref_l, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(norms.offline_gaussian_norm(jnp.asarray(x))), ref_g, atol=1e-4
    )


def test_exponential_unit_norm_streaming_equals_batch(rng):
    mag = np.abs(rng.standard_normal((2, 30, 16))).astype(np.float32)
    alpha = norms.get_norm_alpha(16000, 160, tau=0.5)
    full, s_full = norms.exponential_unit_norm(jnp.asarray(mag), alpha)
    s = None
    outs = []
    for t in range(30):
        y, s = norms.exponential_unit_norm(jnp.asarray(mag[:, t : t + 1]), alpha, state=s)
        outs.append(np.asarray(y))
    stream = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(stream, np.asarray(full), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_full), atol=1e-6)


def test_exponential_unit_norm_matches_golden(rng):
    """Scalar per-frame loop golden (test/test_norm.py:43-61)."""
    mag = np.abs(rng.standard_normal((1, 12, 8))).astype(np.float32)  # [B,T,F]
    alpha = 0.9
    state = np.linspace(1e-3, 1e-4, 8, dtype=np.float32)
    ref = np.zeros_like(mag)
    s = state.copy()
    for t in range(12):
        s = alpha * s + (1 - alpha) * mag[0, t]
        ref[0, t] = mag[0, t] / np.sqrt(s + 1e-14)
    ours, _ = norms.exponential_unit_norm(jnp.asarray(mag), alpha)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_hybrid_norm_prefix_matches_forgetting(rng):
    x = np.abs(rng.standard_normal((1, 50, 8))).astype(np.float32)
    sample_length = 30
    h = np.asarray(norms.hybrid_norm(jnp.asarray(x), sample_length))
    f = np.asarray(norms.forgetting_norm(jnp.asarray(x), sample_length))
    np.testing.assert_allclose(h[:, :sample_length], f[:, :sample_length], atol=1e-5)


def test_norm_wrapper_dispatch():
    assert norms.norm_wrapper("offline_laplace_norm") is norms.offline_laplace_norm
    import pytest

    with pytest.raises(NotImplementedError):
        norms.norm_wrapper("bogus")
