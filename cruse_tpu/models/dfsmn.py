"""DFSMN: deep feedforward sequential memory networks.

Block semantics follow model/dfsmn.py:15-71: 1x1 in-projection, depthwise
dilated *left* (past) memory conv with causal padding, depthwise *right*
(future/lookahead) conv, memory residual ``out + left + right``, optional
skip ``hidden + relu(out_p) * weight`` from the previous block, 1x1
out-projection; each block returns ``(out, out_p)`` for stacking.

Layout is time-major [B, T, D]; the memory convs are depthwise 1-D convs
over T expressed as explicit pad + grouped conv (MXU-free, pure VPU -- XLA
fuses them with the surrounding elementwise ops). Streaming: with
``right_frames == 0`` the model is fully causal and carries per-block left
context; lookahead variants require full-sequence calls.

`DfsmnNet` is the full enhancement model (linear in -> N blocks -> mask
head), the benchmark's "DFSMN memory-block variant, frame-by-frame
low-latency enhancement" (BASELINE.md config 4) -- the reference ships only
the block.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

_DN_TIME = ("NHC", "HIO", "NHC")  # [B, T, D] depthwise time convs


def _depthwise_time_conv(x: jax.Array, kernel: jax.Array, dilation: int) -> jax.Array:
    """x: [B, T, D], kernel: [K, 1, D] depthwise -> [B, T', D] (VALID)."""
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=_DN_TIME,
        feature_group_count=x.shape[-1],
    )


class DfsmnBlock(nn.Module):
    hidden_dim: int
    output_dim: int
    left_frames: int = 1
    left_dilation: int = 1
    right_frames: int = 1
    right_dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, hidden: jax.Array | None = None,
                 left_ctx: jax.Array | None = None):
        """x: [B, T, I] -> (out [B, T, O], out_p [B, T, H], new_left_ctx).

        `hidden` is the previous block's memory output (skip chain);
        `left_ctx` carries [B, left_frames*left_dilation, H] history for
        streaming (causal variants only).
        """
        h = self.hidden_dim
        out = nn.Dense(h, name="in_conv")(x)

        left = 0.0
        new_ctx = left_ctx
        if self.left_frames > 0:
            k_left = self.param(
                "left_kernel",
                nn.initializers.normal(0.05),
                (self.left_frames + 1, 1, h),
            )
            pad = self.left_dilation * self.left_frames
            if left_ctx is None:
                ext = jnp.pad(out, ((0, 0), (pad, 0), (0, 0)))
            else:
                ext = jnp.concatenate([left_ctx, out], axis=1)
            new_ctx = ext[:, ext.shape[1] - pad :]
            left = _depthwise_time_conv(ext, k_left, self.left_dilation)

        right = 0.0
        if self.right_frames > 0:
            assert left_ctx is None, "lookahead DFSMN blocks cannot stream"
            k_right = self.param(
                "right_kernel",
                nn.initializers.normal(0.05),
                (self.right_frames, 1, h),
            )
            # negative left pad == skip the current frame, look ahead
            ext = jnp.pad(out, ((0, 0), (0, self.right_frames * self.right_dilation), (0, 0)))
            ext = ext[:, self.right_dilation :]
            right = _depthwise_time_conv(ext, k_right, self.right_dilation)

        out_p = out + left + right
        if hidden is not None:
            w = self.param("skip_weight", nn.initializers.zeros_init(), ())
            out_p = hidden + nn.relu(out_p) * w
        y = nn.Dense(self.output_dim, name="out_conv")(out_p)
        return y, out_p, new_ctx


class DfsmnNet(nn.Module):
    """Full DFSMN enhancement model: mag features [B, T, F] -> mask [B, T, F].

    Causal by default (right_frames=0) for frame-by-frame streaming; the
    state is a tuple of per-block left contexts.
    """

    in_freq: int = 161
    hidden_dim: int = 256
    num_blocks: int = 6
    left_frames: int = 2
    left_dilation: int = 1
    right_frames: int = 0
    right_dilation: int = 1

    def compress(self, mag: jax.Array) -> jax.Array:
        return jnp.power(jnp.maximum(mag, 1e-12), 0.3)

    @nn.compact
    def __call__(self, feat: jax.Array, state=None, train: bool = False):
        streaming = state is not None
        if state is None:
            state = self.init_state(feat.shape[0], feat.dtype)
        x = nn.Dense(self.hidden_dim, name="proj_in")(feat)
        x = nn.relu(x)
        hidden = None
        new_state = []
        for i in range(self.num_blocks):
            block = DfsmnBlock(
                hidden_dim=self.hidden_dim,
                output_dim=self.hidden_dim,
                left_frames=self.left_frames,
                left_dilation=self.left_dilation,
                right_frames=self.right_frames,
                right_dilation=self.right_dilation,
                name=f"block_{i}",
            )
            x, hidden, ctx = block(x, hidden, state[i] if streaming else None)
            if ctx is None:
                ctx = jnp.zeros_like(state[i])
            new_state.append(ctx)
        mask = nn.sigmoid(nn.Dense(self.in_freq, name="mask_head")(x))
        return mask, tuple(new_state)

    def init_state(self, batch_size: int, dtype=jnp.float32):
        pad = self.left_dilation * self.left_frames
        return tuple(
            jnp.zeros((batch_size, pad, self.hidden_dim), dtype)
            for _ in range(self.num_blocks)
        )
