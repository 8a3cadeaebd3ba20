"""CRUSE: causal conv U-Net encoder/decoder + grouped-GRU bottleneck.

The flagship net. Rebuilt from the *intended* semantics of the reference
``unet_2`` (model/cruse_net.py:129-165, repaired per SURVEY.md §2.9):

- encoder: L levels of causal Conv2d (kernel (2,3), freq stride 2) + BN + ReLU
- per-level 1x3 conv skip connections (no bias)
- bottleneck: two grouped-GRU banks with LayerNorm + interleave mixing (GGRU)
- decoder: skip-add -> causal ConvTranspose2d + BN + ReLU per level; final
  level emits a 1-channel sigmoid magnitude mask (no norm)

TPU-first layout: activations [B, T, F, C] (NHWC); the bottleneck flattens
(F', C) onto the lane dimension so the GRU input projection is one MXU
matmul over all timesteps (see cruse_tpu.nn.gru).

Streaming: ``init_state``/carried-state calls are bit-exact with the batch
path; conv layers carry their (k_t - 1)-frame input history, the GRU carries
its hidden state.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from cruse_tpu.nn.conv import CausalConv2d, CausalConvTranspose2d
from cruse_tpu.nn.gru import GGRUBottleneck


@dataclasses.dataclass(frozen=True)
class CruseConfig:
    in_freq: int = 161  # n_fft//2 + 1 for 320-pt STFT (or crop of 512-pt)
    channels: Tuple[int, ...] = (8, 16, 32, 64)
    kernel: Tuple[int, int] = (2, 3)
    fstride: int = 2
    rnn_groups: int = 4
    skip_convs: bool = True
    decoder_mode: str = "transposed"  # "transposed" | "upsample" (the
    # CRUSE4MagAddSkipUpsample variant, model/cruse.py:14-15 intended design)
    mask_activation: str = "sigmoid"
    feature_compression: str = "pow"  # "pow" | "log1p" | "none"
    compression_exponent: float = 0.3
    emit_features: bool = False  # also return the bottleneck output (for
    # auxiliary heads like deep filtering)

    @property
    def num_levels(self) -> int:
        return len(self.channels)

    def freq_sizes(self) -> Tuple[int, ...]:
        """Frequency-axis sizes after each encoder level."""
        sizes = [self.in_freq]
        f = self.in_freq
        kf = self.kernel[1]
        fpad = kf // 2
        for _ in self.channels:
            f = (f + 2 * fpad - kf) // self.fstride + 1
            sizes.append(f)
        return tuple(sizes)

    @property
    def bottleneck_dim(self) -> int:
        return self.freq_sizes()[-1] * self.channels[-1]


def compress_mag(mag: jax.Array, cfg: CruseConfig) -> jax.Array:
    """Feature compression (module-free: safe to call from anywhere)."""
    if cfg.feature_compression == "pow":
        return jnp.power(jnp.maximum(mag, 1e-12), cfg.compression_exponent)
    if cfg.feature_compression == "log1p":
        return jnp.log1p(mag)
    return mag


class CruseNet(nn.Module):
    """Mask-estimating CRUSE network. Input mag features [B, T, F]."""

    config: CruseConfig = CruseConfig()

    def compress(self, mag: jax.Array) -> jax.Array:
        return compress_mag(mag, self.config)

    @nn.compact
    def __call__(self, feat: jax.Array, state=None, train: bool = False):
        """feat: [B, T, F] compressed magnitude. Returns (mask [B,T,F], state).

        state: None for a fresh utterance, else the tuple returned by the
        previous call (conv histories + GRU hidden) for streaming.
        """
        c = self.config
        assert feat.shape[-1] == c.in_freq, (feat.shape, c.in_freq)
        kt = c.kernel[0]
        ctx = kt - 1  # causal context frames per conv level
        streaming = state is not None
        if state is None:
            state = self.init_state(feat.shape[0], feat.dtype)
        conv_hist_in, gru_state, dec_hist_in = state
        conv_hist_out, dec_hist_out = [], []

        x = feat[..., None]  # [B, T, F, 1]
        skips = []
        # ---- encoder ----
        for li, ch in enumerate(c.channels):
            if streaming:
                # prepend carried context instead of zero padding
                x_ext = jnp.concatenate([conv_hist_in[li], x], axis=1)
            else:
                x_ext = jnp.pad(x, ((0, 0), (ctx, 0), (0, 0), (0, 0)))
            conv_hist_out.append(x_ext[:, x_ext.shape[1] - ctx :])
            x = CausalConv2d(
                features=ch,
                kernel_size=(1, c.kernel[1]),  # time handled explicitly above
                fstride=c.fstride,
                norm=True,
                act=nn.relu,
                name=f"enc_{li}",
            )(self._time_conv_view(x_ext, kt), train=train)
            if c.skip_convs:
                skip = nn.Conv(
                    ch, (1, 3), padding=((0, 0), (1, 1)), use_bias=False, name=f"skip_{li}"
                )(x)
            else:
                skip = x
            skips.append(skip)

        # ---- bottleneck ----
        b, t, f_bottleneck, ch_last = x.shape
        flat = x.reshape(b, t, f_bottleneck * ch_last)
        y, gru_state = GGRUBottleneck(groups=c.rnn_groups, name="ggru")(flat, gru_state)
        x = y.reshape(b, t, f_bottleneck, ch_last)

        # ---- decoder ----
        out_channels = list(c.channels[:-1][::-1]) + [1]
        for li, ch in enumerate(out_channels):
            level = c.num_levels - 1 - li
            x = x + skips[level]
            if streaming:
                x_ext = jnp.concatenate([dec_hist_in[li], x], axis=1)
            else:
                x_ext = jnp.pad(x, ((0, 0), (ctx, 0), (0, 0), (0, 0)))
            dec_hist_out.append(x_ext[:, x_ext.shape[1] - ctx :])
            is_last = li == len(out_channels) - 1
            if c.decoder_mode == "upsample":
                # nearest-neighbor freq upsample + causal conv (the
                # mag-CRUSE skip-upsample variant)
                target_f = self.config.freq_sizes()[level]
                x_up = jnp.repeat(x_ext, c.fstride, axis=2)[:, :, :target_f]
                x_up = jnp.pad(x_up, ((0, 0), (0, 0), (1, 1), (0, 0)))
                x = nn.Conv(ch, (kt, 3), padding="VALID", name=f"dec_{li}_conv")(x_up)
                if not is_last:
                    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                     epsilon=1e-5, name=f"dec_{li}_bn")(x)
                    x = nn.relu(x)
            else:
                x = CausalConvTranspose2dTimeMajor(
                    features=ch,
                    kernel=c.kernel,
                    fstride=c.fstride,
                    norm=not is_last,
                    act=None if is_last else nn.relu,
                    name=f"dec_{li}",
                )(x_ext, train=train)

        mask = x[..., 0]
        if c.mask_activation == "sigmoid":
            mask = nn.sigmoid(mask)
        elif c.mask_activation == "relu":
            mask = nn.relu(mask)
        new_state = (tuple(conv_hist_out), gru_state, tuple(dec_hist_out))
        if c.emit_features:
            return (mask, y), new_state  # y: bottleneck output [B, T, D]
        return mask, new_state

    @staticmethod
    def _time_conv_view(x_ext: jax.Array, kt: int) -> jax.Array:
        """Stack kt consecutive frames onto channels: [B, T+ctx, F, C] ->
        [B, T, F, C*kt], so the conv becomes kernel (1, kf) with the time
        taps expressed as channels. Keeps streaming/batch paths identical.
        """
        t_out = x_ext.shape[1] - (kt - 1)
        taps = [x_ext[:, i : i + t_out] for i in range(kt)]
        return jnp.concatenate(taps, axis=-1)

    def init_state(self, batch_size: int, dtype=jnp.float32):
        return cruse_init_state(self.config, batch_size, dtype)


def cruse_init_state(c: CruseConfig, batch_size: int, dtype=jnp.float32):
    """Fresh streaming state (module-free helper)."""
    ctx = c.kernel[0] - 1
    fs = c.freq_sizes()
    conv_hist = []
    in_chs = [1] + list(c.channels[:-1])
    for li in range(c.num_levels):
        # encoder level li consumes [B, ctx, F_li, C_li] input history
        conv_hist.append(jnp.zeros((batch_size, ctx, fs[li], in_chs[li]), dtype))
    # GGRU bottleneck state: two banks of [B, G, D/G] hidden (built directly
    # -- constructing the submodule here would escape the flax scope)
    g_shape = (batch_size, c.rnn_groups, c.bottleneck_dim // c.rnn_groups)
    gru_state = (jnp.zeros(g_shape, dtype), jnp.zeros(g_shape, dtype))
    dec_hist = []
    dec_in_chs = list(c.channels[::-1])
    for li in range(c.num_levels):
        level = c.num_levels - 1 - li
        dec_hist.append(jnp.zeros((batch_size, ctx, fs[level + 1], dec_in_chs[li]), dtype))
    return tuple(conv_hist), gru_state, tuple(dec_hist)


class CausalConvTranspose2dTimeMajor(nn.Module):
    """ConvTranspose where the causal time taps are consumed from an
    explicitly extended input [B, T+kt-1, F, C]: output frame t uses input
    frames t..t+kt-1 of the extended buffer (== causal trim of a VALID
    transposed conv). Freq axis behaves like torch ConvTranspose2d with
    padding kf//2."""

    features: int
    kernel: Tuple[int, int] = (2, 3)
    fstride: int = 2
    norm: bool = True
    act: Optional[callable] = nn.relu

    @nn.compact
    def __call__(self, x_ext: jax.Array, train: bool = False) -> jax.Array:
        kt, kf = self.kernel
        fpad = kf // 2
        x = nn.ConvTranspose(
            self.features,
            kernel_size=(kt, kf),
            strides=(1, self.fstride),
            padding="VALID",
            name="conv",
        )(x_ext)
        # x_ext had T+kt-1 frames -> VALID convT gives T+2(kt-1); the causal
        # output for frame t is at position t+kt-1 (uses ext frames t..t+kt-1)
        t_out = x_ext.shape[1] - (kt - 1)
        x = x[:, kt - 1 : kt - 1 + t_out]
        if fpad > 0:
            x = x[:, :, fpad : x.shape[2] - fpad]
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn")(x)
        if self.act is not None:
            x = self.act(x)
        return x


def enhance_spectrum(model: CruseNet, variables, spec: jax.Array, state=None):
    """Apply the model to a complex spectrum [B, T, F]: returns (enhanced
    spec, mask, state)."""
    mag = jnp.abs(spec)
    feat = model.compress(mag)
    mask, state = model.apply(variables, feat, state)
    return spec * mask.astype(spec.real.dtype), mask, state
