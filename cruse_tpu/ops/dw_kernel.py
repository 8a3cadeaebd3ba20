"""Fused (3,3) time-dilated causal depthwise conv for TFCM (Pallas, TPU).

STATUS: MEASURED EXPERIMENT -- ties XLA; the einsum path stays production.
v5e, stage-0 shapes [16, 64, 24, 626] bf16, dispatch-RTT amortized
(scripts/profile_tfcm_block.py): this kernel 1.35 ms fwd+bwd vs XLA's
shift-MAC formulation 1.41 ms (~5%, within run-to-run noise).

What the experiment PROVES: the kernel performs the whole fwd+bwd in
2 reads + 2 writes + one grad read (~5x less HBM traffic than a
pass-per-tap schedule) and still lands on XLA's time -- so the stencil is
VPU-COMPUTE-bound, not HBM-bound. The block decomposition's tap scaling
(9 taps 1.30 ms, 3 taps 0.54 ms, axis irrelevant) measures VPU FMA count,
not memory passes: ~50 fp32 VPU ops/element fwd+bwd across y/dx/dwd at
~1 Top/s VPU throughput is ~1.3 ms -- exactly what both implementations
hit. Together with ops/tfcm_kernel.py (whole-block fusion, ties) and
ops/asa_kernel.py (flash ASA, loses) this closes the question from three
directions: XLA already sits on the hardware floor for TFCM's per-element
work; the config-5 gap is architectural to the model's channel widths.

The hypothesis this kernel was built to test -- that XLA spends one HBM
round-trip per tap and fusing them recovers ~4x -- is FALSE.

One residual knob: bf16 in-kernel accumulation (ACC_DTYPE) measures
1.16 ms (-18% vs XLA) -- the VPU does not double-pump bf16, and the win
is too small to justify losing fp32 accumulation in a 17-term stencil,
so fp32 stays the default and the einsum path stays production.

Structure (T-minor layout [B, K, C, T] is kept end to end; reference
lineage /root/reference/model/mtfaa.py:166-207 -- torch does this with a
grouped Conv2d):

- forward:   y[k,c,t] = sum_{it,jf} wd[it,jf,c] * xp[k+jf, c, t+it*d]
  with xp = freq-(1,1)-padded input (time already causally extended by
  the caller, matching TFCMBlock.causal_ext). One grid step per batch
  item: read xp once, 9 static-offset VMEM slices, accumulate in fp32,
  write y once.
- backward:  dx is the SAME stencil with both weight axes flipped applied
  to gp = pad(g, freq (1,1), time (2d, 2d)) -- so it reuses the forward
  kernel -- and the weight grad dwd[it,jf,c] = sum_{b,k,t} xp*g reduces
  in the same pass over data already in VMEM (per-batch partials, summed
  by XLA). Total HBM traffic fwd+bwd: 2 reads + 2 writes + g read, vs
  ~one pass per tap for the XLA formulation.

Parity: tests/test_dw_kernel.py checks fwd and grads against the einsum
reference in interpret mode (CPU) at several dilations/shapes.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dw_taps_reference(x_ext: jax.Array, wd: jax.Array, d: int) -> jax.Array:
    """The production einsum/shift-MAC formulation (TFCMBlock inner loop):
    x_ext [B, K, C, T+2d] (time causally extended), wd [3, 3, C] ->
    [B, K, C, T]."""
    k_len = x_ext.shape[1]
    t_len = x_ext.shape[-1] - 2 * d
    xp = jnp.pad(x_ext, ((0, 0), (1, 1), (0, 0), (0, 0)))
    acc = None
    for it in range(3):
        for jf in range(3):
            sl = xp[:, jf : jf + k_len, :, it * d : it * d + t_len] * wd[it, jf][:, None]
            acc = sl if acc is None else acc + sl
    return acc


_TC = 256  # time-chunk width: bounds the fp32 accumulator VMEM footprint
# accumulation dtype for the stencil. fp32 is the parity-tested default;
# CRUSE_DW_ACC=bfloat16 selects bf16 in-kernel accumulation (-18% isolated
# stencil time -- the VPU does not double-pump bf16 but saves accumulator
# traffic). Round-4 quality gate: see scripts/dw_acc_gate.py + STATUS.
ACC_DTYPE = jnp.dtype(os.environ.get("CRUSE_DW_ACC", "float32"))
if ACC_DTYPE != jnp.dtype("float32"):
    # a stray env var must never change training numerics invisibly
    import warnings

    warnings.warn(
        f"CRUSE_DW_ACC={ACC_DTYPE.name}: depthwise-stencil Pallas kernels "
        "will accumulate in a NON-DEFAULT dtype process-wide (fwd and bwd). "
        "This trades parity-tested fp32 accumulation for ~18% isolated "
        "stencil speed; gate quality with scripts/dw_acc_gate.py.",
        stacklevel=2,
    )


def _stencil_kernel(xp_ref, w_ref, y_ref, *, d: int, k_out: int, t_out: int):
    """out[k, c, t] = sum_{it, jf} w[it, jf, c] * xp[k+jf, c, t+it*d].
    T processed in static chunks so fp32 temporaries stay bounded (a
    full-width accumulator blew the 16M scoped-vmem limit at bench shapes)."""
    xp = xp_ref[0]
    c = xp.shape[1]
    for t0 in range(0, t_out, _TC):
        tl = min(_TC, t_out - t0)
        acc = None
        for it in range(3):
            for jf in range(3):
                w = w_ref[it, jf].astype(jnp.float32).reshape(1, c, 1).astype(ACC_DTYPE)
                sl = xp[jf : jf + k_out, :, t0 + it * d : t0 + it * d + tl]
                term = sl.astype(ACC_DTYPE) * w
                acc = term if acc is None else acc + term
        y_ref[0, :, :, t0 : t0 + tl] = acc.astype(y_ref.dtype)


def _bwd_kernel(gp_ref, xp_ref, wf_ref, dx_ref, dwd_ref, *, d: int,
                k_out: int, t_ext: int):
    """dx (flipped stencil on gp) + per-batch weight-grad partials.

    gp [K+2, C, T+4d]: output grad, freq (1,1) + time (2d, 2d) padded.
    xp [K+2, C, T+2d]: forward input, freq (1,1) padded (time pre-extended).
    dx [K, C, T+2d] (grad w.r.t. the time-extended input).
    dwd [3, 3, C] fp32 partials for this batch item.
    """
    gp = gp_ref[0]
    xp = xp_ref[0]
    c = xp.shape[1]
    t_len = t_ext - 2 * d  # unextended output length

    # dx: flipped stencil on gp, chunked over T like the forward kernel
    for t0 in range(0, t_ext, _TC):
        tl = min(_TC, t_ext - t0)
        acc = None
        for it in range(3):
            for jf in range(3):
                wf = wf_ref[it, jf].astype(jnp.float32).reshape(1, c, 1).astype(ACC_DTYPE)
                sl = gp[jf : jf + k_out, :, t0 + it * d : t0 + it * d + tl]
                term = sl.astype(ACC_DTYPE) * wf
                acc = term if acc is None else acc + term
        dx_ref[0, :, :, t0 : t0 + tl] = acc.astype(dx_ref.dtype)

    # weight grads in the same pass (data already in VMEM); g unpadded
    # lives at gp[1:K+1, :, 2d : 2d+t_len]
    for it in range(3):
        for jf in range(3):
            dwd = None
            for t0 in range(0, t_len, _TC):
                tl = min(_TC, t_len - t0)
                g = gp[1 : 1 + k_out, :, 2 * d + t0 : 2 * d + t0 + tl]
                xs = xp[jf : jf + k_out, :, t0 + it * d : t0 + it * d + tl]
                p = jnp.sum(xs.astype(jnp.float32) * g.astype(jnp.float32),
                            axis=(0, 2))
                dwd = p if dwd is None else dwd + p
            dwd_ref[0, it, jf] = dwd


def _call_stencil(xp, w, d: int, k_out: int, t_out: int, out_dtype,
                  interpret: bool):
    b = xp.shape[0]
    return pl.pallas_call(
        functools.partial(_stencil_kernel, d=d, k_out=k_out, t_out=t_out),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1,) + xp.shape[1:], lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k_out, xp.shape[2], t_out),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k_out, xp.shape[2], t_out), out_dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(xp, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dw_causal_tm(x_ext: jax.Array, wd: jax.Array, d: int,
                 interpret: bool = False) -> jax.Array:
    """Fused depthwise (3,3) stencil: x_ext [B, K, C, T+2d] (time causally
    extended by the caller), wd [3, 3, C] -> [B, K, C, T]. Matches
    `dw_taps_reference` (the TFCMBlock einsum path) exactly."""
    y, _ = _dw_fwd(x_ext, wd, d, interpret)
    return y


def _dw_fwd(x_ext, wd, d, interpret):
    k_len = x_ext.shape[1]
    t_len = x_ext.shape[-1] - 2 * d
    xp = jnp.pad(x_ext, ((0, 0), (1, 1), (0, 0), (0, 0)))
    y = _call_stencil(xp, wd, d, k_len, t_len, x_ext.dtype, interpret)
    return y, (x_ext, wd)


def _dw_bwd(d, interpret, res, g):
    x_ext, wd = res
    b, k_len, c, t_ext = x_ext.shape
    xp = jnp.pad(x_ext, ((0, 0), (1, 1), (0, 0), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (1, 1), (0, 0), (2 * d, 2 * d)))
    wf = wd[::-1, ::-1]
    dx, dwd_p = pl.pallas_call(
        functools.partial(_bwd_kernel, d=d, k_out=k_len, t_ext=t_ext),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1,) + gp.shape[1:], lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + xp.shape[1:], lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wf.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_len, c, t_ext), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k_len, c, t_ext), x_ext.dtype),
            jax.ShapeDtypeStruct((b, 3, 3, c), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gp, xp, wf)
    dwd = jnp.sum(dwd_p, axis=0).astype(wd.dtype)
    return dx, dwd


dw_causal_tm.defvjp(_dw_fwd, _dw_bwd)
