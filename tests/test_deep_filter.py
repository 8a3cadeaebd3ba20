"""Deep-filter head: golden parity vs an unfold-based torch reference + invariants."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from cruse_tpu.models.deep_filter import deep_filter_apply, tap_offsets, DeepFilterHead


def _torch_deep_filter(spec_r, spec_i, coef_r, coef_i, t_dim, f_dim):
    """Golden: repaired deep_filter.py semantics via F.conv2d identity-kernel
    unfold. spec [B, F, T] torch layout; coef [B, K, F, T]."""
    t_width, f_width = 2 * t_dim + 1, 2 * f_dim + 1
    k = t_width * f_width
    kernel = torch.eye(k).reshape(k, 1, f_width, t_width)
    sr = torch.nn.functional.conv2d(spec_r[:, None], kernel, padding=[f_dim, t_dim])
    si = torch.nn.functional.conv2d(spec_i[:, None], kernel, padding=[f_dim, t_dim])
    out_r = (sr * coef_r - si * coef_i).sum(1)
    out_i = (sr * coef_i + si * coef_r).sum(1)
    return out_r, out_i


def test_matches_torch_unfold_reference(rng):
    b, t, f = 2, 12, 16
    t_dim, f_dim = 1, 2
    k = (2 * t_dim + 1) * (2 * f_dim + 1)
    spec_r = rng.standard_normal((b, t, f)).astype(np.float32)
    spec_i = rng.standard_normal((b, t, f)).astype(np.float32)
    coef_r = rng.standard_normal((b, t, f, k)).astype(np.float32)
    coef_i = rng.standard_normal((b, t, f, k)).astype(np.float32)

    ours_r, ours_i = deep_filter_apply(
        jnp.asarray(spec_r), jnp.asarray(spec_i), jnp.asarray(coef_r), jnp.asarray(coef_i),
        t_dim, f_dim, causal=False,
    )

    # torch layout: [B, F, T]; conv2d kernel unfold index order is
    # (f_offset, t_offset) scanning -- map our (dt, df) tap order onto it.
    tr = torch.from_numpy(np.transpose(spec_r, (0, 2, 1)))
    ti = torch.from_numpy(np.transpose(spec_i, (0, 2, 1)))
    # identity-kernel conv output channel j corresponds to neighborhood
    # position (row j // t_width, col j % t_width) == (f + f_dim - row, t + t_dim - col)
    offs = tap_offsets(t_dim, f_dim, causal=False)
    t_width = 2 * t_dim + 1
    cr = np.zeros((b, k, f, t), np.float32)
    ci = np.zeros((b, k, f, t), np.float32)
    for our_k, (dt, df) in enumerate(offs):
        # identity-kernel conv2d output channel j = row*t_width+col holds the
        # neighborhood shifted by (dt, df) = (t_dim - col, f_dim - row)
        row = f_dim - df
        col = t_dim - dt
        j = row * t_width + col
        cr[:, j] = np.transpose(coef_r[..., our_k], (0, 2, 1))
        ci[:, j] = np.transpose(coef_i[..., our_k], (0, 2, 1))
    ref_r, ref_i = _torch_deep_filter(tr, ti, torch.from_numpy(cr), torch.from_numpy(ci), t_dim, f_dim)
    np.testing.assert_allclose(np.asarray(ours_r), np.transpose(ref_r.numpy(), (0, 2, 1)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_i), np.transpose(ref_i.numpy(), (0, 2, 1)), atol=1e-4)


def test_identity_filter():
    """A filter with 1 at the center tap and 0 elsewhere is the identity."""
    b, t, f = 1, 8, 10
    rng = np.random.default_rng(0)
    spec_r = jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32))
    spec_i = jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32))
    offs = tap_offsets(1, 1, causal=False)
    k = len(offs)
    center = offs.index((0, 0))
    coef_r = jnp.zeros((b, t, f, k)).at[..., center].set(1.0)
    coef_i = jnp.zeros((b, t, f, k))
    out_r, out_i = deep_filter_apply(spec_r, spec_i, coef_r, coef_i, 1, 1)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(spec_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(spec_i), atol=1e-6)


def test_causal_taps_only_past():
    offs = tap_offsets(1, 1, causal=True)
    assert all(dt >= 0 for dt, df in offs)
    b, t, f = 1, 10, 8
    rng = np.random.default_rng(0)
    spec = rng.standard_normal((b, t, f)).astype(np.float32)
    k = len(offs)
    coef = np.abs(rng.standard_normal((b, t, f, k))).astype(np.float32)
    out1, _ = deep_filter_apply(jnp.asarray(spec), jnp.zeros_like(jnp.asarray(spec)), jnp.asarray(coef), jnp.zeros((b, t, f, k)), 1, 1, causal=True)
    spec2 = spec.copy()
    spec2[:, 6:] += 3.0
    out2, _ = deep_filter_apply(jnp.asarray(spec2), jnp.zeros((b, t, f)), jnp.asarray(coef), jnp.zeros((b, t, f, k)), 1, 1, causal=True)
    np.testing.assert_allclose(np.asarray(out1)[:, :6], np.asarray(out2)[:, :6], atol=1e-6)


def test_head_module(rng):
    b, t, f, d = 2, 10, 33, 16
    feats = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    spec = jnp.asarray(
        (rng.standard_normal((b, t, f)) + 1j * rng.standard_normal((b, t, f))).astype(np.complex64)
    )
    head = DeepFilterHead(t_dim=1, f_dim=2, num_freqs=f)
    v = head.init(jax.random.PRNGKey(0), feats, spec)
    out = head.apply(v, feats, spec)
    assert out.shape == (b, t, f)
    assert np.isfinite(np.asarray(out)).all().item()


def test_tm_matches_tmajor(rng):
    """deep_filter_apply_tm ([B, F, T] / [B, F, K, T]) computes exactly the
    T-major apply's result (round-5 T-minor MTFAA batch path)."""
    from cruse_tpu.models.deep_filter import deep_filter_apply_tm

    b, t, f = 2, 14, 11
    for t_dim, f_dim, causal in ((1, 1, True), (1, 2, False), (2, 1, True)):
        k = len(tap_offsets(t_dim, f_dim, causal))
        spec_r = rng.standard_normal((b, t, f)).astype(np.float32)
        spec_i = rng.standard_normal((b, t, f)).astype(np.float32)
        coef_r = rng.standard_normal((b, t, f, k)).astype(np.float32)
        coef_i = rng.standard_normal((b, t, f, k)).astype(np.float32)
        ref_r, ref_i = deep_filter_apply(
            jnp.asarray(spec_r), jnp.asarray(spec_i),
            jnp.asarray(coef_r), jnp.asarray(coef_i), t_dim, f_dim, causal)
        tm_r, tm_i = deep_filter_apply_tm(
            jnp.asarray(spec_r.transpose(0, 2, 1)),
            jnp.asarray(spec_i.transpose(0, 2, 1)),
            jnp.asarray(coef_r.transpose(0, 2, 3, 1)),
            jnp.asarray(coef_i.transpose(0, 2, 3, 1)), t_dim, f_dim, causal)
        np.testing.assert_allclose(
            np.asarray(tm_r).transpose(0, 2, 1), np.asarray(ref_r), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(tm_i).transpose(0, 2, 1), np.asarray(ref_i), atol=1e-6)
