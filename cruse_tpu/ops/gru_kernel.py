"""Fused grouped-GRU sequence kernel (Pallas TPU).

The recurrence is the one part of CRUSE that XLA cannot parallelize over
time. This kernel runs the whole sequence in ONE pallas_call:

- grid = (T,) -- TPU grid steps execute sequentially, so the hidden state
  lives in a VMEM scratch buffer that persists across grid iterations (no
  HBM round-trip per step, unlike a lax.scan whose carry is re-materialized)
- per step, the pre-computed input projection block x_proj[:, t] streams in
  (Pallas double-buffers the block DMA automatically) while the recurrent
  matmul h @ w_hh runs on the MXU
- gate math matches torch (r, z, n) exactly like cruse_tpu.nn.gru.gru_scan.

Off-TPU the kernel runs in interpreter mode so CPU tests cover it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_kernel(x_ref, h0_ref, whh_ref, bhh_ref, y_ref, hlast_ref, h_scratch):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:]

    h = h_scratch[:]  # [B, G, H]
    w = whh_ref[:]  # [G, 3H, H]
    b = bhh_ref[:]  # [G, 3H]
    xp = x_ref[0]  # [B, G, 3H] (time block squeezed)

    hp = jax.lax.dot_general(
        h.transpose(1, 0, 2),  # [G, B, H]
        w.transpose(0, 2, 1),  # [G, H, 3H]
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).transpose(1, 0, 2)  # [B, G, 3H]
    gates = hp + b[None]
    h3 = h.shape[-1]
    xr, xz, xn = xp[..., :h3], xp[..., h3 : 2 * h3], xp[..., 2 * h3 :]
    hr, hz, hn = gates[..., :h3], gates[..., h3 : 2 * h3], gates[..., 2 * h3 :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h

    h_scratch[:] = h_new
    y_ref[0] = h_new
    hlast_ref[:] = h_new


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_sequence_pallas(x_proj: jax.Array, h0: jax.Array, w_hh: jax.Array,
                        b_hh: jax.Array, interpret: bool = False):
    """x_proj: [B, T, G, 3H] (input projection pre-applied), h0: [B, G, H],
    w_hh: [G, 3H, H], b_hh: [G, 3H]. Returns (y [B, T, G, H], h_last)."""
    b, t, g, h3 = x_proj.shape
    h = h3 // 3
    xt = jnp.swapaxes(x_proj, 0, 1)  # [T, B, G, 3H] -- time-major blocks

    y, h_last = pl.pallas_call(
        _gru_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, g, h3), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, g, h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, h3, h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, g, h), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, g, h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, g, h), x_proj.dtype),
            jax.ShapeDtypeStruct((b, g, h), x_proj.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((b, g, h), jnp.float32)],
        interpret=interpret,
    )(xt, h0, w_hh, b_hh)
    return jnp.swapaxes(y, 0, 1), h_last
