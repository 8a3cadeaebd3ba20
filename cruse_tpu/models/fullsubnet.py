"""FullSubNet-style full-band + sub-band model (cIRM output).

The reference ships the FullSubNet *ops* (freq unfold + the 3-group
complexity trick, train_base/model/base_model.py:18-86, and `drop_band`,
feature.py:239-269) but no consumer model; this is the intended consumer
built to the FullSubNet recipe on top of those ops:

  full-band: laplace-normed magnitude -> stacked GRUs over time -> per-bin
             gain-ish embedding (ReLU)
  sub-band:  per-frequency units (freq_unfold of the magnitude, reflect
             padded) concatenated with the full-band output for that bin ->
             ONE shared GRU stack applied to all F units (folded into the
             batch axis -- on TPU this is a single big batched matmul per
             scan step, the MXU-friendly form of "share weights across
             bands") -> compressed cIRM (real, imag) per bin.

Training: the `fullsubnet` forward adapter (train/step.py) decompresses the
cIRM and complex-multiplies with the noisy spectrum, so all spectral/time
losses apply unchanged. For the cheap sub-band recipe, apply
`nn.subband.reduce_complexity_separately` (or `dsp.features.drop_band`) to
the unfolded units and targets in a custom step.

Streaming: GRU states thread through `state`; with
`norm="cumulative_laplace_norm"` the norm's running (sum, count) carries
too, so chunked streaming is BIT-EXACT with the full-sequence call
(tested). Offline norms (the default) are utterance-level and can't
stream exactly by construction.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from cruse_tpu.nn.gru import GRU
from cruse_tpu.nn.norms import cumulative_laplace_norm_carry, norm_wrapper
from cruse_tpu.nn.subband import freq_unfold


@dataclasses.dataclass(frozen=True)
class FullSubNetConfig:
    num_freqs: int = 257
    num_neighbors: int = 15
    fb_hidden: int = 512
    fb_layers: int = 2
    sb_hidden: int = 384
    sb_layers: int = 2
    norm: str = "offline_laplace_norm"
    look_ahead: int = 0  # output delay in frames (FullSubNet uses 2 offline)


class FullSubNet(nn.Module):
    """mag [B, T, F] -> (compressed cIRM [B, T, F, 2], state)."""

    config: FullSubNetConfig = FullSubNetConfig()

    def compress(self, mag: jax.Array) -> jax.Array:
        # normalization happens inside (laplace / cumulative norms)
        return mag

    @nn.compact
    def __call__(self, mag: jax.Array, state: Optional[dict] = None, train: bool = False):
        cfg = self.config
        b, t, f = mag.shape
        assert f == cfg.num_freqs, (f, cfg.num_freqs)
        st = state or {}
        new_state: dict[str, Any] = {}
        streaming_norm = cfg.norm == "cumulative_laplace_norm"
        if streaming_norm:
            # stateful: running (sum, count) carries across chunked calls so
            # streaming is exact (unlike the offline norms)
            def norm_with(key):
                def f(x):
                    y, new_state[key] = cumulative_laplace_norm_carry(x, st.get(key))
                    return y

                return f

            norm_mag, norm_units = norm_with("norm_mag"), norm_with("norm_units")
        else:
            norm_mag = norm_units = norm_wrapper(cfg.norm)

        # ---- full-band stage ----
        fb = norm_mag(mag)
        for li in range(cfg.fb_layers):
            fb, new_state[f"fb_{li}"] = GRU(cfg.fb_hidden, name=f"fb_gru_{li}")(
                fb, st.get(f"fb_{li}")
            )
        fb = nn.relu(nn.Dense(f, name="fb_out")(fb))  # [B, T, F]

        # ---- sub-band stage: all F units share one GRU stack ----
        sub = freq_unfold(mag, cfg.num_neighbors)  # [B, T, F, S]
        units = jnp.concatenate([sub, fb[..., None]], axis=-1)  # [B, T, F, S+1]
        units = units.transpose(0, 2, 1, 3)  # [B, F, T, S+1]
        units = norm_units(units.reshape(b * f, t, -1))  # per-unit normalization
        sb = units
        for li in range(cfg.sb_layers):
            h0 = st.get(f"sb_{li}")
            sb, h_last = GRU(cfg.sb_hidden, name=f"sb_gru_{li}")(sb, h0)
            new_state[f"sb_{li}"] = h_last
        cirm = nn.Dense(2, name="sb_out")(sb)  # [B*F, T, 2]
        cirm = cirm.reshape(b, f, t, 2).transpose(0, 2, 1, 3)  # [B, T, F, 2]
        if cfg.look_ahead > 0:
            cirm = jnp.pad(cirm, ((0, 0), (0, cfg.look_ahead), (0, 0), (0, 0)))[
                :, cfg.look_ahead :
            ]
        return cirm, new_state

    def init_state(self, batch_size: int, dtype=jnp.float32) -> dict:
        cfg = self.config
        st = {}
        for li in range(cfg.fb_layers):
            st[f"fb_{li}"] = jnp.zeros((batch_size, cfg.fb_hidden), dtype)
        for li in range(cfg.sb_layers):
            st[f"sb_{li}"] = jnp.zeros((batch_size * cfg.num_freqs, cfg.sb_hidden), dtype)
        if cfg.norm == "cumulative_laplace_norm":
            st["norm_mag"] = (jnp.zeros((batch_size,), dtype), jnp.zeros((batch_size,), dtype))
            st["norm_units"] = (
                jnp.zeros((batch_size * cfg.num_freqs,), dtype),
                jnp.zeros((batch_size * cfg.num_freqs,), dtype),
            )
        return st
