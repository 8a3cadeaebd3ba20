"""CRUSE + deep-filter head: magnitude mask everywhere, complex multi-frame
filtering on the lower bins (benchmark config 3, BASELINE.md).

DeepFilterNet-style composition: the CRUSE trunk enhances with a sigmoid
magnitude mask; a second head predicts causal complex multi-frame filter
coefficients from the bottleneck features and refines the low-frequency bins
(where phase matters most). Everything is causal, so the model streams
frame-by-frame: the DF application keeps a rolling buffer of the last
``2*t_dim`` masked-spectrum frames.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from cruse_tpu.models.cruse import CruseNet, CruseConfig
from cruse_tpu.models.deep_filter import deep_filter_apply, tap_offsets


@dataclasses.dataclass(frozen=True)
class CruseDfConfig:
    cruse: CruseConfig = CruseConfig(emit_features=True)
    df_bins: int = 96  # lower bins refined by deep filtering
    df_taps_t: int = 2  # past time taps (causal: offsets 0..2t)
    df_taps_f: int = 1

    def __post_init__(self):
        # TOML/reflection path: [model.args.cruse] arrives as a plain dict;
        # coerce it so the one CLI can express the nested trunk config
        if isinstance(self.cruse, dict):
            args = dict(self.cruse)
            if "channels" in args:
                args["channels"] = tuple(args["channels"])
            if "kernel" in args:
                args["kernel"] = tuple(args["kernel"])
            object.__setattr__(self, "cruse", CruseConfig(**args))
        if not self.cruse.emit_features:
            object.__setattr__(
                self, "cruse", dataclasses.replace(self.cruse, emit_features=True)
            )

    @property
    def num_taps(self) -> int:
        return (2 * self.df_taps_t + 1) * (2 * self.df_taps_f + 1)


class CruseDfNet(nn.Module):
    """feat [B, T, F] -> ((mask [B, T, F], coefs [B, T, df_bins, K, 2]), state)."""

    config: CruseDfConfig = CruseDfConfig()

    def compress(self, mag: jax.Array) -> jax.Array:
        from cruse_tpu.models.cruse import compress_mag

        return compress_mag(mag, self.config.cruse)

    @nn.compact
    def __call__(self, feat: jax.Array, state=None, train: bool = False):
        cfg = self.config
        (mask, feats), new_state = CruseNet(cfg.cruse, name="cruse")(feat, state, train)
        k = cfg.num_taps
        coefs = nn.Dense(cfg.df_bins * k * 2, name="df_head")(feats)
        coefs = coefs.reshape(*feats.shape[:-1], cfg.df_bins, k, 2) / k
        return (mask, coefs), new_state

    def init_state(self, batch_size: int, dtype=jnp.float32):
        from cruse_tpu.models.cruse import cruse_init_state

        return cruse_init_state(self.config.cruse, batch_size, dtype)


def apply_cruse_df(spec: jax.Array, mask: jax.Array, coefs: jax.Array, cfg: CruseDfConfig):
    """Full-utterance enhancement: mask everywhere, causal DF on low bins.

    spec: complex [B, T, F]; coefs [B, T, df_bins, K, 2]. Returns complex
    [B, T, F].
    """
    masked = spec * mask
    low = masked[:, :, : cfg.df_bins]
    out_r, out_i = deep_filter_apply(
        jnp.real(low),
        jnp.imag(low),
        coefs[..., 0],
        coefs[..., 1],
        cfg.df_taps_t,
        cfg.df_taps_f,
        causal=True,
    )
    refined = jax.lax.complex(out_r, out_i)
    return jnp.concatenate([refined, masked[:, :, cfg.df_bins :]], axis=2)


class DfStreamState(NamedTuple):
    spec_history: jax.Array  # [B, 2*t_dim, df_bins] complex (past masked frames)


def df_stream_init(batch_size: int, cfg: CruseDfConfig) -> DfStreamState:
    return DfStreamState(
        spec_history=jnp.zeros((batch_size, 2 * cfg.df_taps_t, cfg.df_bins), jnp.complex64)
    )


def apply_cruse_df_streaming(
    state: DfStreamState,
    spec_frame: jax.Array,  # complex [B, F] (current frame)
    mask_frame: jax.Array,  # [B, F]
    coef_frame: jax.Array,  # [B, df_bins, K, 2]
    cfg: CruseDfConfig,
):
    """Per-frame DF application with a rolling history buffer; bit-exact with
    `apply_cruse_df` (tested). Returns (enhanced frame [B, F], new state)."""
    masked = spec_frame * mask_frame
    low = masked[:, : cfg.df_bins]
    # history: oldest .. newest, then current -> frames [t - 2t .. t]
    frames = jnp.concatenate([state.spec_history, low[:, None]], axis=1)  # [B, 2t+1, bins]
    offsets = tap_offsets(cfg.df_taps_t, cfg.df_taps_f, causal=True)
    coef_c = jax.lax.complex(coef_frame[..., 0], coef_frame[..., 1])  # [B, bins, K]
    t_depth = frames.shape[1]
    out = jnp.zeros_like(low)
    for ki, (dt, df) in enumerate(offsets):
        src = frames[:, t_depth - 1 - dt]  # dt frames back
        if df > 0:
            src = jnp.pad(src, ((0, 0), (df, 0)))[:, : low.shape[-1]]
        elif df < 0:
            src = jnp.pad(src, ((0, 0), (0, -df)))[:, -df:]
        out = out + src * coef_c[..., ki]
    enhanced = jnp.concatenate([out, masked[:, cfg.df_bins :]], axis=-1)
    new_state = DfStreamState(spec_history=frames[:, 1:])
    return enhanced, new_state
