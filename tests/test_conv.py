"""Causal conv parity vs torch Conv2d/ConvTranspose2d with explicit pad+trim."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from cruse_tpu.nn.conv import CausalConv2d, CausalConvTranspose2d, FreqUpsample


def _to_torch_nchw(x_btfc):
    # our [B, T, F, C] -> torch [B, C, T, F]
    return torch.from_numpy(np.transpose(x_btfc, (0, 3, 1, 2)))


def _from_torch_nchw(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_causal_conv_matches_torch(rng):
    b, t, f, cin, cout = 2, 10, 161, 1, 8
    x = rng.standard_normal((b, t, f, cin)).astype(np.float32)
    model = CausalConv2d(features=cout, kernel_size=(2, 3), fstride=2, norm=False, act=None)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    tconv = torch.nn.Conv2d(cin, cout, (2, 3), stride=(1, 2))
    with torch.no_grad():
        # flax kernel [kh, kw, in, out] -> torch [out, in, kh, kw]
        k = np.asarray(variables["params"]["conv"]["kernel"])
        tconv.weight.copy_(torch.from_numpy(np.transpose(k, (3, 2, 0, 1))))
        tconv.bias.copy_(torch.from_numpy(np.asarray(variables["params"]["conv"]["bias"])))
        xt = _to_torch_nchw(x)
        # reference causal convention: pad T left k_t-1, F symmetric 1
        xt = torch.nn.functional.pad(xt, (1, 1, 1, 0))
        ref = _from_torch_nchw(tconv(xt))

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert ours.shape == ref.shape == (b, t, 81, cout)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_causal_conv_is_causal(rng):
    """Changing a future frame must not affect past outputs."""
    b, t, f = 1, 12, 32
    x = rng.standard_normal((b, t, f, 1)).astype(np.float32)
    model = CausalConv2d(features=4, kernel_size=(3, 3), fstride=1, norm=False, act=None)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y1 = np.asarray(model.apply(variables, jnp.asarray(x)))
    x2 = x.copy()
    x2[:, 7:] += 10.0
    y2 = np.asarray(model.apply(variables, jnp.asarray(x2)))
    np.testing.assert_allclose(y1[:, :7], y2[:, :7], atol=1e-6)
    assert np.abs(y1[:, 7:] - y2[:, 7:]).max() > 1e-3


def test_causal_conv_transpose_matches_torch(rng):
    b, t, f, cin, cout = 2, 10, 11, 16, 8
    x = rng.standard_normal((b, t, f, cin)).astype(np.float32)
    model = CausalConvTranspose2d(features=cout, kernel_size=(2, 3), fstride=2, norm=False, act=None)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    tconv = torch.nn.ConvTranspose2d(cin, cout, (2, 3), stride=(1, 2), padding=(0, 1))
    with torch.no_grad():
        # flax ConvTranspose kernel [kh, kw, in, out] (unflipped); torch's
        # transposed conv flips spatially -> flip kh/kw when mapping
        k = np.asarray(variables["params"]["conv"]["kernel"])[::-1, ::-1].copy()
        tconv.weight.copy_(torch.from_numpy(np.transpose(k, (2, 3, 0, 1))))
        tconv.bias.copy_(torch.from_numpy(np.asarray(variables["params"]["conv"]["bias"])))
        ref_full = tconv(_to_torch_nchw(x))
        ref = _from_torch_nchw(ref_full)[:, :-1]  # causal trim [..., :-1] in T

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert ours.shape == ref.shape == (b, t, 21, cout)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_conv_transpose_causal(rng):
    b, t, f = 1, 12, 8
    x = rng.standard_normal((b, t, f, 4)).astype(np.float32)
    model = CausalConvTranspose2d(features=2, kernel_size=(2, 3), fstride=2, norm=False, act=None)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y1 = np.asarray(model.apply(variables, jnp.asarray(x)))
    x2 = x.copy()
    x2[:, 6:] += 5.0
    y2 = np.asarray(model.apply(variables, jnp.asarray(x2)))
    np.testing.assert_allclose(y1[:, :6], y2[:, :6], atol=1e-6)


def test_encoder_decoder_freq_geometry():
    """161 -> 81 -> 41 -> 21 -> 11 down, then back up to 161."""
    x = jnp.zeros((1, 4, 161, 1))
    sizes = [161]
    h = x
    convs = []
    key = jax.random.PRNGKey(0)
    for ch in (8, 16, 32, 64):
        m = CausalConv2d(features=ch, kernel_size=(2, 3), fstride=2, norm=False, act=None)
        v = m.init(key, h)
        h = m.apply(v, h)
        sizes.append(h.shape[2])
        convs.append((m, v))
    assert sizes == [161, 81, 41, 21, 11]
    for ch in (32, 16, 8, 1):
        m = CausalConvTranspose2d(features=ch, kernel_size=(2, 3), fstride=2, norm=False, act=None)
        v = m.init(key, h)
        h = m.apply(v, h)
    assert h.shape == (1, 4, 161, 1)


def test_freq_upsample():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 1, 6, 1)
    y = FreqUpsample(factor=2)(x)
    assert y.shape == (1, 1, 12, 1)
    np.testing.assert_array_equal(np.asarray(y[0, 0, :4, 0]), [0, 0, 1, 1])


def test_separable_conv_runs(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 32, 8)).astype(np.float32))
    model = CausalConv2d(features=16, kernel_size=(2, 3), separable=True, norm=False, act=None)
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 6, 32, 16)
    assert "pointwise" in variables["params"]
