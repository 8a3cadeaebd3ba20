"""Fused TFCM kernels (Pallas, TPU): a parity-tested, MEASURED experiment.

STATUS: the XLA formulation stays the production path. Measured on v5e at
MTFAA bench shapes ([16, 64, 24, 626] bf16): XLA eval stack 5.1 ms,
fused per-block kernel 5.7 ms, whole-stack single-kernel fusion 5.4 ms.
The hypothesis behind these kernels -- that the TFCM block is HBM-pass
bound (~10 passes/block in XLA vs 2 fused) -- is FALSE at MTFAA's channel
counts: wall time is dominated by the 1x1-conv contractions, which at
C=24 use ~(24/128)^2 = 3.5% of each MXU pass in ANY formulation, and XLA
already overlaps its matmuls with the elementwise passes. Fusing the
whole dilation ladder into one kernel (6 HBM passes total) therefore only
ties XLA; the floor is MXU latency, which is architectural to the model's
channel widths, not an implementation artifact. Kept as a documented
experiment with interpret-mode parity tests (tests/test_tfcm_kernel.py),
exactly like the measured GRU and deep-filter kernel experiments
(ops/gru_kernel.py, ops/deep_filter_kernel.py).

Eval mode only: with running statistics, both BatchNorms are affine and
fold into the neighboring convs (W1' = W1 * scale1 column-wise,
wd' = wd * scale2 per channel), so a block has no global reductions and
fuses end to end. Training-mode fusion would additionally need two
global-reduction phase barriers per block for the batch statistics --
moot given the eval measurement above.

Layout contract: model activations are T-minor [B, K, C, T]
(mtfaa.py docstring) and the kernel keeps that layout end to end: the 1x1
convs are K-batched dot_generals ([K,O,C] @ [K,C,T] -> [K,O,T], same MXU
cycle count as the flat form and zero transposes), the depthwise conv is
9 shifted MACs on the (K, T) axes, and time is chunked through the grid
with a causal halo of 2*dilation frames.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(x_ref, w1_ref, b1_ref, a1_ref, wd_ref, bd_ref, a2_ref,
                  w2_ref, b2_ref, out_ref, *, dilation: int, t_chunk: int):
    """One (batch, T-chunk) grid step: x_ref [1, 1, K, C, TB+2d] (left halo
    included, zero-filled before the sequence start), out_ref [1,1,K,C,TB]."""
    d = dilation
    x = x_ref[0, 0].astype(jnp.float32)            # [K, C, TB+2d]
    w1 = w1_ref[:].astype(jnp.float32)             # [K, O, C] (BN1-folded)
    w2 = w2_ref[:].astype(jnp.float32)             # [K, O, C]
    # per-channel constants arrive pre-broadcast along T: Mosaic aborts on
    # broadcasting a [C, 1] vector against a batched-dot result
    b1 = b1_ref[:].astype(jnp.float32)             # [C, TB+2d]
    bd = bd_ref[:].astype(jnp.float32)             # [C, TB]
    b2 = b2_ref[:].astype(jnp.float32)             # [C, TB]
    a1 = a1_ref[0, 0]
    a2 = a2_ref[0, 0]
    dims = (((2,), (1,)), ((0,), (0,)))            # K-batched C contraction

    # pconv1 + folded BN1: h1[k, o, t] = sum_c w1[k, o, c] x[k, c, t]
    h1 = jax.lax.dot_general(w1, x, dims, preferred_element_type=jnp.float32)
    h1 = h1 + b1                                   # [K, O, TB+2d]
    p1 = jnp.where(h1 >= 0, h1, a1 * h1)
    # causal semantics: before the sequence start the depthwise consumes
    # ZERO p1 frames (the XLA path pads p1, not x, with zeros). The halo of
    # the first chunk is zero-filled x, whose p1 is prelu(b1) != 0 -- mask.
    j = pl.program_id(1)
    tidx = jax.lax.broadcasted_iota(jnp.int32, p1.shape, 2)
    p1 = jnp.where(tidx < 2 * d - j * t_chunk, 0.0, p1)  # global t < 0

    # depthwise (3,3), time-dilated causal, freq symmetric; BN2 folded into wd
    k_len = p1.shape[0]
    t_len = t_chunk
    p1f = jnp.pad(p1, ((1, 1), (0, 0), (0, 0)))    # freq halo
    z = None
    for tap in range(9):  # (it, jf): time offset -(2-it)*d, freq jf-1
        it, jf = divmod(tap, 3)
        sl = p1f[jf : jf + k_len, :, it * d : it * d + t_len]
        term = sl * wd_ref[tap].astype(jnp.float32)  # wd [9, C, TB]
        z = term if z is None else z + term
    z = z + bd
    p2 = jnp.where(z >= 0, z, a2 * z)

    # pconv2 (+ residual), same K-batched form
    h2 = jax.lax.dot_general(w2, p2, dims, preferred_element_type=jnp.float32)
    out = h2 + b2 + x[:, :, 2 * d :]
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _fold_eval_params(w1, b1, g1, be1, m1, v1, wd, bd, g2, be2, m2, v2, eps=1e-5):
    """Fold eval-mode BN affines into the neighboring convs."""
    s1 = g1 * jax.lax.rsqrt(v1 + eps)
    w1f = w1 * s1[None, :]
    b1f = (b1 - m1) * s1 + be1
    s2 = g2 * jax.lax.rsqrt(v2 + eps)
    wdf = wd * s2[None, None, :]
    bdf = (bd - m2) * s2 + be2
    return w1f, b1f, wdf, bdf


@functools.partial(
    jax.jit, static_argnames=("dilation", "t_chunk", "interpret")
)
def fused_tfcm_block_eval(
    x, w1, b1, g1, be1, m1, v1, a1, wd, bd, g2, be2, m2, v2, a2, w2, b2,
    *, dilation: int, t_chunk: int = 256, interpret: bool = False,
):
    """Fused eval-mode TFCM block. x: [B, K, C, T] (T-minor model layout).

    Exactly TFCMBlock's eval math (running-stat BN affines folded into the
    convs); parity-tested against the XLA path. Returns [B, K, C, T]."""
    bsz, k, c, t = x.shape
    d = dilation
    w1f, b1f, wdf, bdf = _fold_eval_params(
        w1.astype(jnp.float32), b1.astype(jnp.float32), g1.astype(jnp.float32),
        be1.astype(jnp.float32), m1.astype(jnp.float32), v1.astype(jnp.float32),
        wd.astype(jnp.float32), bd.astype(jnp.float32), g2.astype(jnp.float32),
        be2.astype(jnp.float32), m2.astype(jnp.float32), v2.astype(jnp.float32),
    )
    tb = min(t_chunk, t)
    n_t = -(-t // tb)
    t_pad = n_t * tb - t
    # causal left halo of 2d zeros + overlapping chunk windows
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (2 * d, t_pad)))
    chunks = jnp.stack(
        [xp[..., j * tb : j * tb + tb + 2 * d] for j in range(n_t)], axis=1
    )  # [B, nT, K, C, TB+2d]

    grid = (bsz, n_t)
    out = pl.pallas_call(
        functools.partial(_block_kernel, dilation=d, t_chunk=tb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, k, c, tb + 2 * d), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, c), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, tb + 2 * d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((9, c, tb), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, tb), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((k, c, c), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, tb), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k, c, tb), lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_t, k, c, tb), x.dtype),
        interpret=interpret,
    )(
        chunks,
        jnp.broadcast_to(w1f.T[None], (k, c, c)),
        jnp.broadcast_to(b1f[:, None], (c, tb + 2 * d)),
        jnp.asarray(a1, jnp.float32).reshape(1, 1),
        jnp.broadcast_to(wdf.reshape(9, c)[:, :, None], (9, c, tb)),
        jnp.broadcast_to(bdf[:, None], (c, tb)),
        jnp.asarray(a2, jnp.float32).reshape(1, 1),
        jnp.broadcast_to(w2.astype(jnp.float32).T[None], (k, c, c)),
        jnp.broadcast_to(b2.astype(jnp.float32)[:, None], (c, tb)),
    )
    out = out.swapaxes(1, 2).swapaxes(2, 3)  # [B, K, C, nT, TB]
    out = out.reshape(bsz, k, c, n_t * tb)[..., :t]
    return out


# ---------------- whole-stack fusion ----------------


def _stack_kernel(x_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref,
                  a_ref, out_ref, *, dilations, halo: int, t_chunk: int):
    """One (batch, T-chunk) grid step for the FULL TFCM stack.

    x_ref [1, 1, K, C, TB+H] with H = 2*sum(dilations) halo frames. Every
    block computes at full extended width; block i's values are correct
    from extended position sum_{l<=i} 2*d_l onward, so the final [H:] slice
    is exact (validity propagates: block i+1 at position tau reads block i
    at tau-2*d_{i+1} >= sum_{l<=i} 2*d_l). For the first chunk the halo is
    zeros and every block's p1 is masked there, reproducing the XLA path's
    zero-padding of p1 (not x) before the sequence start."""
    j = pl.program_id(1)
    cur = x_ref[0, 0].astype(jnp.float32)          # [K, C, TB+H]
    t_ext = t_chunk + halo
    dims = (((2,), (1,)), ((0,), (0,)))            # K-batched C contraction
    k_len = cur.shape[0]
    tpos = jax.lax.broadcasted_iota(jnp.int32, (k_len, cur.shape[1], t_ext), 2)

    for li, d in enumerate(dilations):
        inp = cur
        w1 = w1_ref[li].astype(jnp.float32)        # [K, O, C]
        h1 = jax.lax.dot_general(w1, cur, dims, preferred_element_type=jnp.float32)
        h1 = h1 + b1_ref[li].astype(jnp.float32)   # [C, TB+H] broadcast
        a1 = a_ref[li, 0]
        p1 = jnp.where(h1 >= 0, h1, a1 * h1)
        p1 = jnp.where(tpos < halo - j * t_chunk, 0.0, p1)  # global t < 0
        # depthwise: causal left zero-pad in time, symmetric freq
        p1f = jnp.pad(p1, ((1, 1), (0, 0), (2 * d, 0)))
        z = None
        for tap in range(9):
            it, jf = divmod(tap, 3)
            sl = p1f[jf : jf + k_len, :, it * d : it * d + t_ext]
            term = sl * wd_ref[li, tap].astype(jnp.float32)
            z = term if z is None else z + term
        z = z + bd_ref[li].astype(jnp.float32)
        a2 = a_ref[li, 1]
        p2 = jnp.where(z >= 0, z, a2 * z)
        w2 = w2_ref[li].astype(jnp.float32)
        h2 = jax.lax.dot_general(w2, p2, dims, preferred_element_type=jnp.float32)
        cur = h2 + b2_ref[li].astype(jnp.float32) + inp

    out_ref[0, 0] = cur[:, :, halo:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dilations", "t_chunk", "interpret"))
def fused_tfcm_stack_eval(x, block_params, *, dilations, t_chunk: int = 192,
                          interpret: bool = False):
    """Fused eval-mode TFCM STACK: the full dilation ladder in ONE kernel
    invocation -- read the activations once, write once, versus ~10 HBM
    passes per block in the XLA formulation.

    x: [B, K, C, T]. block_params: list (per block) of dicts with keys
    w1, b1, g1, be1, m1, v1, a1, wd, bd, g2, be2, m2, v2, a2, w2, b2
    (TFCMBlock params + running stats). dilations: static tuple, e.g.
    (1, 2, 4, 8)."""
    bsz, k, c, t = x.shape
    halo = 2 * sum(dilations)
    n_l = len(dilations)
    w1s, b1s, wds, bds, w2s, b2s, sca = [], [], [], [], [], [], []
    tb = min(t_chunk, t)
    t_ext = tb + halo
    for p in block_params:
        w1f, b1f, wdf, bdf = _fold_eval_params(
            p["w1"].astype(jnp.float32), p["b1"].astype(jnp.float32),
            p["g1"].astype(jnp.float32), p["be1"].astype(jnp.float32),
            p["m1"].astype(jnp.float32), p["v1"].astype(jnp.float32),
            p["wd"].astype(jnp.float32), p["bd"].astype(jnp.float32),
            p["g2"].astype(jnp.float32), p["be2"].astype(jnp.float32),
            p["m2"].astype(jnp.float32), p["v2"].astype(jnp.float32),
        )
        w1s.append(jnp.broadcast_to(w1f.T[None], (k, c, c)))
        b1s.append(jnp.broadcast_to(b1f[:, None], (c, t_ext)))
        wds.append(jnp.broadcast_to(wdf.reshape(9, c)[:, :, None], (9, c, t_ext)))
        bds.append(jnp.broadcast_to(bdf[:, None], (c, t_ext)))
        w2s.append(jnp.broadcast_to(p["w2"].astype(jnp.float32).T[None], (k, c, c)))
        b2s.append(jnp.broadcast_to(p["b2"].astype(jnp.float32)[:, None], (c, t_ext)))
        sca.append(jnp.stack([jnp.asarray(p["a1"], jnp.float32),
                              jnp.asarray(p["a2"], jnp.float32)]))
    w1_all = jnp.stack(w1s)
    b1_all = jnp.stack(b1s)
    wd_all = jnp.stack(wds)
    bd_all = jnp.stack(bds)
    w2_all = jnp.stack(w2s)
    b2_all = jnp.stack(b2s)
    a_all = jnp.stack(sca)

    n_t = -(-t // tb)
    t_pad = n_t * tb - t
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (halo, t_pad)))
    chunks = jnp.stack(
        [xp[..., j * tb : j * tb + t_ext] for j in range(n_t)], axis=1
    )  # [B, nT, K, C, TB+H]

    out = pl.pallas_call(
        functools.partial(_stack_kernel, dilations=tuple(dilations), halo=halo,
                          t_chunk=tb),
        grid=(bsz, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, k, c, t_ext), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_l, k, c, c), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_l, c, t_ext), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_l, 9, c, t_ext), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_l, c, t_ext), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_l, k, c, c), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_l, c, t_ext), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_l, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k, c, tb), lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_t, k, c, tb), x.dtype),
        interpret=interpret,
    )(chunks, w1_all, b1_all, wd_all, bd_all, w2_all, b2_all, a_all)
    out = out.swapaxes(1, 2).swapaxes(2, 3)
    return out.reshape(bsz, k, c, n_t * tb)[..., :t]


def tfcm_stack_params(params, stats, num_layers: int):
    """Collect TFCM stack flax params/stats into fused-kernel inputs."""
    out = []
    for idx in range(num_layers):
        p = params[f"block_{idx}"]
        s = stats[f"block_{idx}"]
        out.append({
            "w1": p["pconv1_kernel"], "b1": p["pconv1_bias"],
            "g1": p["bn1"]["scale"], "be1": p["bn1"]["bias"],
            "m1": s["bn1"]["mean"], "v1": s["bn1"]["var"],
            "a1": p["prelu1"]["negative_slope"],
            "wd": p["dw_kernel"], "bd": p["dw_bias"],
            "g2": p["bn2"]["scale"], "be2": p["bn2"]["bias"],
            "m2": s["bn2"]["mean"], "v2": s["bn2"]["var"],
            "a2": p["prelu2"]["negative_slope"],
            "w2": p["pconv2_kernel"], "b2": p["pconv2_bias"],
        })
    return out
