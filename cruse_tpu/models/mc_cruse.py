"""Multi-channel CRUSE: directional features -> CRUSE trunk -> reference-
channel mask.

The reference ships multi-channel *feature computers* (LPS + IPD,
train_base/acoustics/feature.py:423-611) and a multi-channel inference
strategy (base_inferencer.py:139-161) but no working MC model; this is the
intended consumer: the spatial feature stack (normalized log-power spectrum
of the reference mic + cos-IPD per mic pair) is projected to the freq width
by a learned linear front-end and enhanced by the standard causal CRUSE
trunk, with the sigmoid mask applied to the reference channel's spectrum.
Everything after the feature projection is the flagship model, so the
streaming state machinery carries over unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from cruse_tpu.models.cruse import CruseConfig, CruseNet, cruse_init_state


@dataclasses.dataclass(frozen=True)
class McCruseConfig:
    mic_pairs: Tuple[Tuple[int, int], ...] = ((0, 1), (0, 2), (0, 3))
    use_sin_ipd: bool = False
    reference_channel: int = 0
    cruse: CruseConfig = CruseConfig(in_freq=161)
    cruse_args: Optional[dict] = None  # TOML-friendly nested config:
    # [model.args.cruse_args] in_freq=161 channels=[...] builds the trunk

    def __post_init__(self):
        object.__setattr__(
            self, "mic_pairs", tuple(tuple(p) for p in self.mic_pairs)
        )
        if self.cruse_args is not None:
            args = dict(self.cruse_args)
            if "channels" in args:
                args["channels"] = tuple(args["channels"])
            object.__setattr__(self, "cruse", CruseConfig(**args))
            object.__setattr__(self, "cruse_args", None)

    @property
    def num_mics(self) -> int:
        return max(max(p) for p in self.mic_pairs) + 1

    @property
    def feature_dim(self) -> int:
        f = self.cruse.in_freq
        return f + len(self.mic_pairs) * f * (1 + int(self.use_sin_ipd))


class McCruseNet(nn.Module):
    """directional features [B, T, D] -> (mask [B, T, F] for the reference
    channel, state). D = McCruseConfig.feature_dim."""

    config: McCruseConfig = McCruseConfig()

    def compress(self, feats: jax.Array) -> jax.Array:
        # features are already normalized (LPS layer-norm + bounded IPDs)
        return feats

    @nn.compact
    def __call__(self, feats: jax.Array, state=None, train: bool = False):
        cfg = self.config
        assert feats.shape[-1] == cfg.feature_dim, (feats.shape, cfg.feature_dim)
        x = nn.Dense(cfg.cruse.in_freq, name="spatial_proj")(feats)
        x = nn.PReLU()(x)
        return CruseNet(cfg.cruse, name="cruse")(x, state, train)

    def init_state(self, batch_size: int, dtype=jnp.float32):
        return cruse_init_state(self.config.cruse, batch_size, dtype)
