"""DFSMN block parity vs a torch reference + streaming equivalence."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from cruse_tpu.models.dfsmn import DfsmnBlock, DfsmnNet


class _TorchDfsmn(torch.nn.Module):
    """Golden reimplementation of the reference block (model/dfsmn.py:15-71)."""

    def __init__(self, input_dim, hidden_dim, output_dim, left_frames, left_dilation,
                 right_frames, right_dilation):
        super().__init__()
        self.left_frames, self.right_frames = left_frames, right_frames
        self.in_conv = torch.nn.Conv1d(input_dim, hidden_dim, 1)
        if left_frames > 0:
            self.left_conv = torch.nn.Sequential(
                torch.nn.ConstantPad1d([left_dilation * left_frames, 0], 0),
                torch.nn.Conv1d(hidden_dim, hidden_dim, left_frames + 1,
                                dilation=left_dilation, bias=False, groups=hidden_dim),
            )
        if right_frames > 0:
            self.right_conv = torch.nn.Sequential(
                torch.nn.ConstantPad1d([-right_dilation, right_frames * right_dilation], 0),
                torch.nn.Conv1d(hidden_dim, hidden_dim, right_frames,
                                dilation=right_dilation, bias=False, groups=hidden_dim),
            )
        self.out_conv = torch.nn.Conv1d(hidden_dim, output_dim, 1)
        self.weight = torch.nn.Parameter(torch.Tensor([0.0]))

    def forward(self, x, hidden=None):
        out = self.in_conv(x)
        left = self.left_conv(out) if self.left_frames > 0 else 0
        right = self.right_conv(out) if self.right_frames > 0 else 0
        out_p = out + left + right
        if hidden is not None:
            out_p = hidden + torch.relu(out_p) * self.weight
        return self.out_conv(out_p), out_p


def test_block_matches_torch(rng):
    b, t, i, h, o = 2, 16, 12, 20, 10
    lf, ld, rf, rd = 2, 2, 2, 3
    x = rng.standard_normal((b, t, i)).astype(np.float32)

    block = DfsmnBlock(hidden_dim=h, output_dim=o, left_frames=lf, left_dilation=ld,
                       right_frames=rf, right_dilation=rd)
    v = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = v["params"]

    tb = _TorchDfsmn(i, h, o, lf, ld, rf, rd)
    with torch.no_grad():
        tb.in_conv.weight.copy_(torch.from_numpy(np.asarray(p["in_conv"]["kernel"]).T[:, :, None]))
        tb.in_conv.bias.copy_(torch.from_numpy(np.asarray(p["in_conv"]["bias"])))
        # our depthwise kernel [K, 1, H] -> torch [H, 1, K]
        tb.left_conv[1].weight.copy_(
            torch.from_numpy(np.transpose(np.asarray(p["left_kernel"]), (2, 1, 0)))
        )
        tb.right_conv[1].weight.copy_(
            torch.from_numpy(np.transpose(np.asarray(p["right_kernel"]), (2, 1, 0)))
        )
        tb.out_conv.weight.copy_(torch.from_numpy(np.asarray(p["out_conv"]["kernel"]).T[:, :, None]))
        tb.out_conv.bias.copy_(torch.from_numpy(np.asarray(p["out_conv"]["bias"])))
        ref_y, ref_p = tb(torch.from_numpy(np.transpose(x, (0, 2, 1))))

    y, out_p, _ = block.apply(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), np.transpose(ref_y.numpy(), (0, 2, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p), np.transpose(ref_p.numpy(), (0, 2, 1)), atol=1e-5)


def test_block_skip_chain(rng):
    b, t, d = 1, 8, 6
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    block = DfsmnBlock(hidden_dim=d, output_dim=d, right_frames=0)
    v = block.init(jax.random.PRNGKey(0), x, x)
    y, out_p, _ = block.apply(v, x, x)
    assert y.shape == (b, t, d)


def test_net_forward_and_causality(rng):
    net = DfsmnNet(in_freq=33, hidden_dim=16, num_blocks=3, left_frames=2, right_frames=0)
    feat = rng.standard_normal((1, 20, 33)).astype(np.float32)
    v = net.init(jax.random.PRNGKey(0), jnp.asarray(feat))
    m1, _ = net.apply(v, jnp.asarray(feat))
    assert m1.shape == (1, 20, 33)
    feat2 = feat.copy()
    feat2[:, 10:] *= 3.0
    m2, _ = net.apply(v, jnp.asarray(feat2))
    np.testing.assert_allclose(np.asarray(m1)[:, :10], np.asarray(m2)[:, :10], atol=1e-6)


def test_net_streaming_matches_batch(rng):
    net = DfsmnNet(in_freq=33, hidden_dim=16, num_blocks=3, left_frames=2, left_dilation=2, right_frames=0)
    feat = jnp.asarray(rng.standard_normal((2, 12, 33)).astype(np.float32))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), feat)
    full, _ = jax.jit(net.apply)(v, feat)
    step = jax.jit(net.apply)
    state = net.init_state(2)
    outs = []
    for t in range(12):
        m, state = step(v, feat[:, t : t + 1], state)
        outs.append(np.asarray(m))
    stream = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(stream, np.asarray(full), atol=1e-5)


def test_lookahead_net_rejects_streaming(rng):
    net = DfsmnNet(in_freq=17, hidden_dim=8, num_blocks=1, right_frames=2)
    feat = jnp.asarray(rng.standard_normal((1, 6, 17)).astype(np.float32))
    v = net.init(jax.random.PRNGKey(0), feat)
    import pytest

    with pytest.raises(AssertionError):
        net.apply(v, feat, net.init_state(1))
