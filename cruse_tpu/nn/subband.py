"""FullSubNet sub-band ops: frequency unfold + the 3-group complexity trick.

Behavioral spec: reference train_base/model/base_model.py:18-48 (`unfold`:
overlapped sub-band units along the freq axis, reflect-padded) and :50-86
(`_reduce_complexity_separately`: rotate freq offsets across three batch
groups so every third bin trains in each group, skipping the reflect-padded
edge bins).

TPU-native design: torch's im2col `F.unfold` materializes patches through a
conv-lowering; here the sub-band window is ONE gather with a precomputed
reflect-index table (static shapes, XLA fuses the gather into consumers).
Layout is time-major [B, T, F(, S)] like the rest of the framework, not the
reference's [B, C, F, T].
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _reflect_indices(num_freqs: int, num_neighbors: int) -> np.ndarray:
    """[F, 2n+1] gather table: row f holds the reflect-padded neighborhood
    f-n .. f+n (torch 'reflect' semantics: edges not repeated)."""
    offsets = np.arange(-num_neighbors, num_neighbors + 1)
    idx = np.arange(num_freqs)[:, None] + offsets[None, :]
    idx = np.abs(idx)  # reflect at 0
    over = idx > num_freqs - 1
    idx[over] = 2 * (num_freqs - 1) - idx[over]  # reflect at F-1
    return idx


def freq_unfold(x: jax.Array, num_neighbors: int) -> jax.Array:
    """Split overlapped sub-band units along the frequency axis.

    x: [..., F] -> [..., F, 2n+1] (n < 1 -> [..., F, 1]); unit f holds bins
    f-n .. f+n with reflect padding (base_model.py:18-48 semantics).
    """
    if num_neighbors < 1:
        return x[..., None]
    num_freqs = x.shape[-1]
    idx = jnp.asarray(_reflect_indices(num_freqs, num_neighbors))
    return x[..., idx]  # one gather: [..., F, S]


def reduce_complexity_separately(
    sub_band: jax.Array, full_band: jax.Array, num_groups: int = 3
) -> jax.Array:
    """The FullSubNet sub-band training trick (base_model.py:50-86).

    Train each batch third on every third frequency (offset rotating by
    group), skipping the first/last (reflect-padded) bins; the sub-band units
    and the full-band model's output are concatenated along the tap axis.

    sub_band [B, T, F, S1], full_band [B, T, F, S2], B divisible by
    num_groups -> [B, T, F', S1+S2] where F' = (F-2)//num_groups.
    """
    b, _, f = sub_band.shape[:3]
    assert b % num_groups == 0, f"batch {b} must divide into {num_groups} groups"
    sub_b = b // num_groups
    n_sel = min(len(range(g + 1, f - 1, num_groups)) for g in range(num_groups))
    cat = jnp.concatenate([sub_band, full_band], axis=-1)  # [B, T, F, S1+S2]
    picked = []
    for g in range(num_groups):
        freq_idx = jnp.arange(g + 1, f - 1, num_groups)[:n_sel]
        picked.append(cat[g * sub_b : (g + 1) * sub_b, :, freq_idx])
    return jnp.concatenate(picked, axis=0)
