"""Fused grouped-GRU sequence kernel (Pallas TPU).

The recurrence is the one part of CRUSE that XLA cannot parallelize over
time. This kernel runs the whole sequence in ONE pallas_call:

- grid = (T / TS,) -- TPU grid steps execute sequentially, so the hidden
  state lives in a VMEM scratch buffer that persists across grid iterations
  (no HBM round-trip per step, unlike a lax.scan whose carry is
  re-materialized)
- TS timesteps run per grid step (statically unrolled), amortizing the
  grid/DMA bookkeeping that made the round-1 single-step variant only TIE
  the XLA scan
- everything lives in group-major [G, B, H] layout so the recurrent matmul
  needs NO per-step transposes; the recurrent weights can be held in VMEM
  as bf16 (halves their VMEM read bandwidth) with fp32 accumulation
- gate math matches torch (r, z, n) exactly like cruse_tpu.nn.gru.gru_scan.

MEASURED VERDICT (scripts/profile_tpu.py, v5e, flagship dims B=32 T=1000
G=4): XLA scan 6.03 ms vs this kernel 6.24-6.32 ms across ts=8/16 and
bf16-weight variants -- a TIE. Both paths sit on the same ~6 us/step
latency floor: the recurrence is strictly sequential and the per-step
matmul ([4,32,160]x[4,160,480]) is far too small to amortize MXU pipeline
latency, so neither DMA amortization nor weight bandwidth is the
bottleneck at these shapes. The production path therefore stays on the
XLA scan (autodiff-able, simpler); this kernel is a parity-tested,
measured experiment. It would win only at much larger per-step matmuls
(bigger batch x hidden), where the VMEM-resident state starts to matter.
Off-TPU the kernel runs in interpreter mode so CPU tests cover it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_kernel(x_ref, h0_ref, whh_ref, bhh_ref, y_ref, hlast_ref, h_scratch, *,
                ts, t_actual):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_scratch[:] = h0_ref[:]

    w = whh_ref[:]  # [G, H, 3H] (pre-transposed), possibly bf16
    b = bhh_ref[:]  # [G, B, 3H] (pre-broadcast host-side: Mosaic lowers
    # leading/no broadcasts more reliably than middle-dim expand_dims)
    h3 = b.shape[-1] // 3

    h = h_scratch[:]  # [G, B, H] fp32
    for s in range(ts):  # static unroll: TS steps per grid iteration
        xp = x_ref[s]  # [G, B, 3H]
        hp = jax.lax.dot_general(
            h.astype(w.dtype), w,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, B, 3H]
        gates = hp + b
        xr, xz, xn = xp[..., :h3], xp[..., h3 : 2 * h3], xp[..., 2 * h3 :]
        hr, hz, hn = gates[..., :h3], gates[..., h3 : 2 * h3], gates[..., 2 * h3 :]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        # padded tail steps (sequence length not a multiple of TS) must not
        # advance the carried state
        h = jnp.where(i * ts + s < t_actual, h_new, h)
        y_ref[s] = h
    h_scratch[:] = h

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        hlast_ref[:] = h


@functools.partial(
    jax.jit, static_argnames=("interpret", "time_block", "weight_dtype")
)
def gru_sequence_pallas(
    x_proj: jax.Array,
    h0: jax.Array,
    w_hh: jax.Array,
    b_hh: jax.Array,
    interpret: bool = False,
    time_block: int = 8,
    weight_dtype=None,
):
    """x_proj: [B, T, G, 3H] (input projection pre-applied), h0: [B, G, H],
    w_hh: [G, 3H, H], b_hh: [G, 3H]. Returns (y [B, T, G, H], h_last
    [B, G, H]). `weight_dtype=jnp.bfloat16` keeps the recurrent weights in
    VMEM at half width (fp32 accumulation either way)."""
    b, t, g, h3 = x_proj.shape
    h = h3 // 3
    ts = min(time_block, t)
    t_pad = (ts - t % ts) % ts
    if t_pad:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, t_pad), (0, 0), (0, 0)))
    tp = t + t_pad

    xt = x_proj.transpose(1, 2, 0, 3)  # [T, G, B, 3H] group-major blocks
    h0_g = h0.transpose(1, 0, 2)  # [G, B, H]
    w_t = jnp.swapaxes(w_hh, -1, -2)  # [G, H, 3H]: transpose ONCE, not per step
    if weight_dtype is not None:
        w_t = w_t.astype(weight_dtype)
    b_g = jnp.broadcast_to(b_hh[:, None, :], (g, b, h3))  # pre-broadcast

    y, h_last = pl.pallas_call(
        functools.partial(_gru_kernel, ts=ts, t_actual=t),
        grid=(tp // ts,),
        in_specs=[
            pl.BlockSpec((ts, g, b, h3), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, b, h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, h, h3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, b, h3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ts, g, b, h), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, b, h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, g, b, h), jnp.float32),
            jax.ShapeDtypeStruct((g, b, h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((g, b, h), jnp.float32)],
        interpret=interpret,
    )(xt, h0_g, w_t, b_g)
    y = y[:t].transpose(2, 0, 1, 3)  # [B, T, G, H]
    return y, h_last.transpose(1, 0, 2)
