"""Causal conv blocks, NHWC layout: activations are [B, T, F, C].

TPU notes: NHWC keeps channels on lanes; causal time padding is explicit
`jnp.pad` + trim (bit-exact with the reference's ConstantPad2d+trim
convention, cust_conv.py:30-57 / cruse_net.py:149-152) instead of conv
padding arguments, so parity and streaming semantics are unambiguous.

Streaming: each block exposes the number of past frames it needs
(`time_context`); the streaming inferencer carries that many trailing input
frames as state and calls the same module on [B, ctx+1, F, C] windows.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn


def xavier_normal_conv(key, shape, dtype=jnp.float32):
    """torch init.xavier_normal_ for conv kernels [kh, kw, in, out]."""
    fan_in = shape[0] * shape[1] * shape[2]
    fan_out = shape[0] * shape[1] * shape[3]
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class CausalConv2d(nn.Module):
    """Conv over [B, T, F, C]: causal in T (left pad k_t-1-lookahead, right pad
    lookahead), symmetric freq pad, optional stride in F, BatchNorm + act.

    Matches Conv2dNormAct (cust_conv.py:15-62): fpad = k_f//2 + dilation - 1,
    separable = grouped conv + 1x1 when enabled.
    """

    features: int
    kernel_size: Tuple[int, int] = (2, 3)
    fstride: int = 1
    dilation: int = 1
    fpad: bool = True
    lookahead: int = 0
    bias: bool = True
    separable: bool = False
    norm: bool = True  # BatchNorm2d equivalent
    act: Optional[Callable] = nn.relu

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kt, kf = self.kernel_size
        fpad_ = kf // 2 + self.dilation - 1 if self.fpad else 0
        # causal time pad + symmetric freq pad
        x = jnp.pad(
            x,
            ((0, 0), (kt - 1 - self.lookahead, self.lookahead), (fpad_, fpad_), (0, 0)),
        )
        in_ch = x.shape[-1]
        groups = 1
        separable = self.separable and max(self.kernel_size) > 1
        if separable:
            import math

            groups = math.gcd(in_ch, self.features)
            if groups == 1:
                separable = False
        x = nn.Conv(
            self.features,
            kernel_size=self.kernel_size,
            strides=(1, self.fstride),
            padding="VALID",
            kernel_dilation=(1, self.dilation),
            feature_group_count=groups,
            use_bias=self.bias,
            name="conv",
        )(x)
        if separable:
            x = nn.Conv(self.features, (1, 1), use_bias=False, name="pointwise")(x)
        if self.norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x

    @property
    def time_context(self) -> int:
        return self.kernel_size[0] - 1 - self.lookahead


class CausalConvTranspose2d(nn.Module):
    """Transposed conv over [B, T, F, C], causal in T.

    VALID transposed conv then trim: (k_t - 1) frames from the *end* of time
    (reference's `[..., :-1]`, cruse_net.py:161-164) and `fpad` bins from each
    side of freq (torch ConvTranspose2d `padding` semantics).
    """

    features: int
    kernel_size: Tuple[int, int] = (2, 3)
    fstride: int = 2
    fpad: bool = True
    bias: bool = True
    norm: bool = True
    act: Optional[Callable] = nn.relu

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kt, kf = self.kernel_size
        fpad_ = kf // 2 if self.fpad else 0
        x = nn.ConvTranspose(
            self.features,
            kernel_size=self.kernel_size,
            strides=(1, self.fstride),
            padding="VALID",
            use_bias=self.bias,
            name="conv",
        )(x)
        # causal: drop the trailing k_t-1 future-looking frames
        if kt > 1:
            x = x[:, : x.shape[1] - (kt - 1)]
        if fpad_ > 0:
            x = x[:, :, fpad_ : x.shape[2] - fpad_]
        if self.norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x

    @property
    def time_context(self) -> int:
        return self.kernel_size[0] - 1


class FreqUpsample(nn.Module):
    """Nearest-neighbor upsample along the freq axis (cust_conv.py:177-184)."""

    factor: int

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.repeat(x, self.factor, axis=2)


class ConvKxF(nn.Module):
    """`convkxf` factory equivalent (cust_conv.py:114-174): normal /
    transposed / upsample modes, optional depthwise + 1x1, BN + act."""

    out_ch: int
    k: int = 1
    f: int = 3
    fstride: int = 2
    lookahead: int = 0
    batch_norm: bool = False
    act: Optional[Callable] = nn.relu
    mode: str = "normal"  # normal | transposed | upsample
    depthwise: bool = True
    complex_in: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        import math

        assert self.f % 2 == 1
        in_ch = x.shape[-1]
        bias = not self.batch_norm
        fpad_ = (self.f - 1) // 2
        groups = min(in_ch, self.out_ch) if self.depthwise else 1
        if in_ch % groups != 0 or self.out_ch % groups != 0:
            groups = 1
        if self.complex_in and groups % 2 == 0:
            groups //= 2
        t_in = x.shape[1]
        # causal time pad
        x = jnp.pad(x, ((0, 0), (self.k - 1 - self.lookahead, self.lookahead), (0, 0), (0, 0)))
        stride = 1 if self.f == 1 else self.fstride
        if self.mode == "normal":
            x = jnp.pad(x, ((0, 0), (0, 0), (fpad_, fpad_), (0, 0)))
            x = nn.Conv(
                self.out_ch,
                (self.k, self.f),
                strides=(1, stride),
                padding="VALID",
                feature_group_count=groups,
                use_bias=bias,
                name="sconv",
            )(x)
        elif self.mode == "transposed":
            x = nn.ConvTranspose(
                self.out_ch,
                (self.k, self.f),
                strides=(1, stride),
                padding="VALID",
                use_bias=bias,
                name="sconv",
            )(x)
            # input was causal-padded by k-1 and VALID convT adds k-1 more:
            # keep the [k-1, k-1+T) window (torch padding=(k-1, .) semantics)
            if self.k > 1:
                x = x[:, self.k - 1 : self.k - 1 + t_in]
            if fpad_ > 0:
                x = x[:, :, fpad_ : x.shape[2] - fpad_]
        elif self.mode == "upsample":
            x = FreqUpsample(self.fstride, name="upsample")(x)
            x = jnp.pad(x, ((0, 0), (0, 0), (fpad_, fpad_), (0, 0)))
            x = nn.Conv(
                self.out_ch,
                (self.k, self.f),
                strides=(1, 1),
                padding="VALID",
                feature_group_count=groups,
                use_bias=bias,
                name="sconv",
            )(x)
        else:
            raise NotImplementedError(self.mode)
        if groups > 1:
            x = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv1x1")(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm")(x)
        if self.act is not None:
            x = self.act(x)
        return x
