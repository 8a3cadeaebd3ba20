"""ConvKxF factory modes + SqueezedGRU variants (cust_conv.py parity rows)."""
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.nn.conv import ConvKxF
from cruse_tpu.nn.gru import SqueezedGRU


def test_convkxf_normal_mode(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 4)).astype(np.float32))
    m = ConvKxF(out_ch=8, k=2, f=3, fstride=2, mode="normal")
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 8, 16, 8)
    # depthwise + 1x1 split present when groups > 1
    assert "conv1x1" in v["params"]


def test_convkxf_transposed_mode(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 8)).astype(np.float32))
    m = ConvKxF(out_ch=4, k=2, f=3, fstride=2, mode="transposed", depthwise=False)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 8, 31, 4)


def test_convkxf_upsample_mode(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 8)).astype(np.float32))
    m = ConvKxF(out_ch=4, k=1, f=3, fstride=2, mode="upsample", depthwise=False)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 8, 32, 4)
    assert "upsample" not in v["params"]  # FreqUpsample has no params


def test_convkxf_causal(rng):
    x = rng.standard_normal((1, 10, 16, 4)).astype(np.float32)
    m = ConvKxF(out_ch=4, k=3, f=3, fstride=1, mode="normal", depthwise=False)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y1 = m.apply(v, jnp.asarray(x))
    x2 = x.copy()
    x2[:, 6:] += 5.0
    y2 = m.apply(v, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(y1)[:, :6], np.asarray(y2)[:, :6], atol=1e-6)


def test_squeezed_gru_variants(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
    # pre-linear-out skip (SqueezedGRU, cust_conv.py:455-456)
    m1 = SqueezedGRU(hidden_size=24, output_size=16, linear_groups=8, skip=True)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    y1, h1 = m1.apply(v1, x)
    assert y1.shape == (2, 12, 16) and h1.shape == (2, 24)
    # post-linear-out skip from raw input (SqueezedGRU_S, :498-499)
    m2 = SqueezedGRU(hidden_size=24, output_size=16, linear_groups=8, skip=True, skip_post=True)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    y2, _ = m2.apply(v2, x)
    assert y2.shape == (2, 12, 16)
    # no output projection -> identity linear_out
    m3 = SqueezedGRU(hidden_size=24)
    v3 = m3.init(jax.random.PRNGKey(0), x)
    y3, _ = m3.apply(v3, x)
    assert y3.shape == (2, 12, 24)
    # streaming carry
    h = None
    outs = []
    for t in range(12):
        yt, h = m1.apply(v1, x[:, t : t + 1], h)
        outs.append(np.asarray(yt))
    np.testing.assert_allclose(np.concatenate(outs, 1), np.asarray(y1), atol=1e-5)
