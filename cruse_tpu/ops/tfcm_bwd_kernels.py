"""Pallas TPU kernels for the TFCM hand-scheduled backward (ops/tfcm_train.py).

The backward of one TFCM block needs ~9 per-channel reductions (BN
scale/bias, PReLU slopes, conv biases, 9 depthwise-tap grads) that XLA
refuses to multi-output-fuse at full-graph scale -- each becomes its own
HBM pass (round-4 measurement, scripts/profile_tfcm_chain.py: +22.3 ms
over the x-grads-only backward for 24 blocks; a hand-ordered plain-XLA
backward recovers only ~3 ms). These kernels compute every reduction of a
phase in ONE pass over operands already in VMEM.

Formulation (v2 -- the v1 per-k loop was 2x SLOWER than XLA: 1024 tiny
per-row matmuls + dynamic row indexing): the (K, C) axes fold into the
sublane axis, so a [1, K, C, T] block is processed as one [K*C, T] 2-D
array. Freq-tap neighbours k+jf become STATIC sublane slices at offset
jf*C; per-channel constants are pre-tiled K times to [K*C, 1] columns.
Everything vectorizes; time is processed in static chunks to bound fp32
temporaries. The matmul-shaped pieces (dh2a, dW1/dW2, dx) stay in XLA,
which handles them well (chain attribution: +1.8 ms for all four).

  tail_bwd   in: dh2a (XLA matmul), h2   out: dh2n +
             {dgamma2, dbeta2, da2} accumulated across the grid.
  mid_bwd    in: gp (BN2-applied dh2, freq+time padded), h1   out: dh1n +
             {dwd [3,3,C], dgamma1, dbeta1, da1, dbd}.

Grid is (B,); v5e executes grid steps sequentially on one TensorCore, so
reduction outputs use constant index maps and accumulate across steps
(initialized at b == 0), the standard TPU-Pallas accumulator pattern.
Reductions accumulate fp32; big tensors stay in the model dtype (bf16 in
production). Gradient parity: tests/test_tfcm_train.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
_TC = 128  # time-chunk width (bounds fp32 temporaries to ~0.8 MB each)


def _fold_sum(row_sums, k_len: int, c: int):
    """[K*C, m] per-row totals -> [C, m] per-channel totals (XLA glue;
    inside the kernels this reshape is an invalid Mosaic relayout)."""
    return jnp.sum(row_sums.reshape(k_len, c, -1), axis=0)


def _tail_kernel(dh2a_ref, h2_ref, sm_ref, dh2n_ref, red_ref,
                 *, k_len: int, c: int, t_len: int):
    """sm_ref [8, K*C] fp32 rows: 0 mean2(tiled), 1 inv2r, 2 gamma2,
    3 beta2, 4 a2. red_ref [K*C, 8]: cols 0 dgamma2, 1 dbeta2, 2 da2
    (per-row partials; the caller folds K in XLA)."""
    b = pl.program_id(0)
    kc = k_len * c
    m2 = sm_ref[0][:, None]
    iv = sm_ref[1][:, None]
    ga = sm_ref[2][:, None]
    be = sm_ref[3][:, None]
    a2 = sm_ref[4][:, None]
    dt = dh2n_ref.dtype

    def chunk(ci, carry):
        dg, dbe, da = carry
        t0 = pl.multiple_of(ci * _TC, _TC)
        u = dh2a_ref[0, :, :, pl.ds(t0, _TC)].reshape(kc, _TC).astype(F32)
        xh = (h2_ref[0, :, :, pl.ds(t0, _TC)].reshape(kc, _TC).astype(F32) - m2) * iv
        hn = xh * ga + be
        neg = hn < 0
        dn = jnp.where(neg, a2 * u, u)
        dh2n_ref[0, :, :, pl.ds(t0, _TC)] = dn.astype(dt).reshape(k_len, c, _TC)
        dg = dg + jnp.sum(dn * xh, axis=1, keepdims=True)
        dbe = dbe + jnp.sum(dn, axis=1, keepdims=True)
        da = da + jnp.sum(jnp.where(neg, u * hn, 0.0), axis=1, keepdims=True)
        return dg, dbe, da

    zero = jnp.zeros((kc, 1), F32)
    dg, dbe, da = jax.lax.fori_loop(0, t_len // _TC, chunk, (zero, zero, zero))

    red = jnp.concatenate([dg, dbe, da, jnp.zeros((kc, 5), F32)], axis=1)

    @pl.when(b == 0)
    def _():
        red_ref[:] = red

    @pl.when(b > 0)
    def _():
        red_ref[:] = red_ref[:] + red


def tail_bwd(dh2a, h2, m2, v2, g2, be2, a2, eps: float, interpret: bool = False):
    """dh2a = g @ W2^T (computed by the caller in XLA). Returns
    (dh2n, dgamma2, dbeta2, da2); reductions fp32.

    T is zero-padded to a _TC multiple: padded columns have dh2a == 0, so
    dn == 0 there and every reduction term vanishes; dh2n is trimmed."""
    b, k_len, c, t_true = h2.shape
    t_len = -(-t_true // _TC) * _TC
    if t_len != t_true:
        padt = ((0, 0), (0, 0), (0, 0), (0, t_len - t_true))
        dh2a = jnp.pad(dh2a, padt)
        h2 = jnp.pad(h2, padt)

    def tile(v):
        return jnp.tile(v.astype(F32), k_len)

    sm = jnp.stack([
        tile(m2), tile(jax.lax.rsqrt(v2.astype(F32) + eps)),
        tile(g2), tile(be2), jnp.full((k_len * c,), a2, F32),
        jnp.zeros((k_len * c,), F32), jnp.zeros((k_len * c,), F32),
        jnp.zeros((k_len * c,), F32),
    ])
    dh2n, red = pl.pallas_call(
        functools.partial(_tail_kernel, k_len=k_len, c=c, t_len=t_len),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k_len, c, t_len), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_len, c, t_len), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k_len * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_len, c, t_len), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_len * c, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(h2.shape, h2.dtype),
            jax.ShapeDtypeStruct((k_len * c, 8), F32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dh2a, h2, sm)
    dh2n = dh2n[..., :t_true]
    folded = _fold_sum(red, k_len, c)  # [C, 8]
    return dh2n, folded[:, 0], folded[:, 1], jnp.sum(folded[:, 2])


def _mid_kernel(gp_ref, h1s_ref, wf_ref, sm_ref, dh1n_ref, dwd_ref, red_ref,
                *, k_len: int, c: int, t_len: int, d: int):
    """gp [1, K+2, C, TL+4d] (BN2-applied dh2, freq (1,1) + time (2d, 2d)
    padded, lane-padded to a _TC multiple TL). h1s [1, K, C, TL+2d] = h1
    shifted right by 2d zeros (so xe col u maps to h1s col u, with the
    leading-2d zero region needing an explicit mask after the BN
    recompute). wf_ref [16, K*C] fp32: rows it*3+jf = wd[2-it, 2-jf]
    tiled. sm rows: 0 m1, 1 inv1r, 2 gamma1, 3 beta1, 4 a1 (tiled).
    dwd_ref [K*C, 16]: cols it*3+jf partials; red cols: 0 dgamma1,
    1 dbeta1, 2 da1, 3 dbd (caller folds K in XLA)."""
    b = pl.program_id(0)
    kc = k_len * c
    m1 = sm_ref[0][:, None]
    iv = sm_ref[1][:, None]
    ga = sm_ref[2][:, None]
    be = sm_ref[3][:, None]
    a1 = sm_ref[4][:, None]
    dt = dh1n_ref.dtype

    # Mosaic requires DYNAMIC lane indices to be 128-aligned: read an
    # aligned [.., _TC+128] window at t0 and take STATIC sub-slices
    # (static unaligned offsets are fine).
    def gp2d(row0, off, t0):
        blk = gp_ref[0, :, :, pl.ds(t0, _TC + 128)]
        blk = blk.reshape((k_len + 2) * c, _TC + 128)[row0 : row0 + kc]
        return blk[:, off : off + _TC]

    def h1a_at(t0, off, mask_lead: bool):
        """prelu(bn(h1)) for xe columns [t0+off, t0+off+_TC), from the
        shifted h1s; masks the causal-pad region (xe cols < 2d are
        true zeros, not BN-transformed zeros)."""
        raw = h1s_ref[0, :, :, pl.ds(t0, _TC + 128)]
        raw = raw.reshape(kc, _TC + 128)[:, off : off + _TC].astype(F32)
        xh = (raw - m1) * iv
        hn = xh * ga + be
        ha = jnp.where(hn < 0, a1 * hn, hn)
        if mask_lead:
            cols = jax.lax.broadcasted_iota(jnp.int32, (kc, _TC), 1) + t0 + off
            ha = jnp.where(cols < 2 * d, 0.0, ha)
        return ha, xh, hn

    def chunk(ci, carry):
        dg, dbe, da, dbd, taps = carry
        t0 = pl.multiple_of(ci * _TC, _TC)
        # dh1a[k', t] = sum_{i, j} wf[i, j] gp[k'+j, t + i*d + 2d]
        # (derivation in ops/tfcm_train.py; verified against autodiff)
        acc = None
        for i in range(3):
            for j in range(3):
                w = wf_ref[i * 3 + j][:, None]
                sl = gp2d(j * c, i * d + 2 * d, t0).astype(F32)
                term = sl * w
                acc = term if acc is None else acc + term
        dh1a = acc
        # PReLU1/BN1 recompute at output cols [t0, t0+_TC) = xe cols +2d
        ha, xh, hn = h1a_at(t0, 2 * d, mask_lead=False)
        neg = hn < 0
        dn = jnp.where(neg, a1 * dh1a, dh1a)
        dh1n_ref[0, :, :, pl.ds(t0, _TC)] = dn.astype(dt).reshape(k_len, c, _TC)
        dg = dg + jnp.sum(dn * xh, axis=1, keepdims=True)
        dbe = dbe + jnp.sum(dn, axis=1, keepdims=True)
        da = da + jnp.sum(jnp.where(neg, dh1a * hn, 0.0), axis=1, keepdims=True)
        # dh2 interior rows, cols [t0, t0+_TC) -> gp cols +2d
        gos = [gp2d((2 - j) * c, 2 * d, t0).astype(F32) for j in range(3)]
        dbd = dbd + jnp.sum(gos[1], axis=1, keepdims=True)
        # dwd[it, jf] += sum_t xe[k, t + it*d] * dh2[k+1-jf, t]
        new_taps = list(taps)
        for i in range(3):
            xs = ha if i == 2 else h1a_at(t0, i * d, mask_lead=True)[0]
            for j in range(3):
                new_taps[i * 3 + j] = new_taps[i * 3 + j] + jnp.sum(
                    xs * gos[j], axis=1, keepdims=True)
        return dg, dbe, da, dbd, tuple(new_taps)

    zero = jnp.zeros((kc, 1), F32)
    init = (zero, zero, zero, zero, tuple(zero for _ in range(9)))
    dg, dbe, da, dbd, taps = jax.lax.fori_loop(0, t_len // _TC, chunk, init)

    dwd = jnp.concatenate(list(taps) + [jnp.zeros((kc, 7), F32)], axis=1)
    red = jnp.concatenate([dg, dbe, da, dbd, jnp.zeros((kc, 4), F32)], axis=1)

    @pl.when(b == 0)
    def _():
        dwd_ref[:] = dwd
        red_ref[:] = red

    @pl.when(b > 0)
    def _():
        dwd_ref[:] = dwd_ref[:] + dwd
        red_ref[:] = red_ref[:] + red


def mid_bwd(gp, h1, wd, m1, v1, g1, be1, a1, d: int, eps: float,
            interpret: bool = False):
    """gp [B, K+2, C, T+4d] = padded BN2-applied grad; h1 [B, K, C, T].
    Returns (dh1n, dwd [3,3,C], dgamma1, dbeta1, da1, dbd).

    T is zero-padded to a _TC multiple TL: padded output columns see only
    gp zeros, so dh1a == 0 and every reduction term vanishes there; dh1n
    is trimmed back to T."""
    if 4 * d > 128:
        raise ValueError(
            f"mid_bwd supports TFCM dilation d <= 32 (got d={d}): the "
            "kernel's aligned [t0, t0+_TC+128) window reads and the "
            "t_len+128 lane padding both assume 4*d <= 128. Use "
            "dw_impl='xla' (the hand-XLA backward) for larger dilations.")
    b, k_len, c, t_true = h1.shape
    kc = k_len * c
    t_len = -(-t_true // _TC) * _TC
    # lane-pad to t_len + 128 so the kernel's aligned [t0, t0+_TC+128)
    # window reads stay in range (gp comes in at T+4d)
    gp = jnp.pad(gp, ((0, 0), (0, 0), (0, 0),
                      (0, t_len + 128 - gp.shape[-1])))
    # h1 shifted right by the causal-pad width: xe col u <-> h1s col u
    h1s = jnp.pad(h1, ((0, 0), (0, 0), (0, 0),
                       (2 * d, t_len + 128 - 2 * d - t_true)))

    def tile(v):
        return jnp.tile(v.astype(F32), k_len)

    wf = wd[::-1, ::-1].reshape(9, 1, c).astype(F32)
    wf = jnp.broadcast_to(wf, (9, k_len, c)).reshape(9, kc)
    wf = jnp.concatenate([wf, jnp.zeros((7, kc), F32)], axis=0)
    sm = jnp.stack([
        tile(m1), tile(jax.lax.rsqrt(v1.astype(F32) + eps)),
        tile(g1), tile(be1), jnp.full((kc,), a1, F32),
        jnp.zeros((kc,), F32), jnp.zeros((kc,), F32), jnp.zeros((kc,), F32),
    ])
    dh1n, dwd, red = pl.pallas_call(
        functools.partial(_mid_kernel, k_len=k_len, c=c, t_len=t_len, d=d),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k_len + 2, c, gp.shape[-1]),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_len, c, h1s.shape[-1]),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, kc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kc), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_len, c, t_len), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k_len, c, t_len), h1.dtype),
            jax.ShapeDtypeStruct((kc, 16), F32),
            jax.ShapeDtypeStruct((kc, 8), F32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gp, h1s, wf, sm)
    dh1n = dh1n[..., :t_true]
    dwd_f = _fold_sum(dwd, k_len, c)  # [C, 16]
    red_f = _fold_sum(red, k_len, c)  # [C, 8]
    return (dh1n, jnp.moveaxis(dwd_f[:, :9], 1, 0).reshape(3, 3, c),
            red_f[:, 0], red_f[:, 1], jnp.sum(red_f[:, 2]), red_f[:, 3])
