"""Flash-style T-minor temporal attention for MTFAA's ASA (Pallas, TPU).

Why a custom kernel: MTFAA's axial time attention has head dims of
c_att = channels//4 = 6..12 and value dims C = 24..48. The stock TPU
flash-attention kernel pads heads to d=128 and loses 2.2x to a plain
einsum+mask formulation (measured round 2). The einsum path in turn
materializes the [B, F, T, S] logits AND softmax tensors in HBM --
~1.6 GB per encoder stage at bench shapes (B=16, F=64, T=626) -- and
XLA's autodiff saves the softmax output for the backward pass, so the
training step pays that traffic several times over.

This kernel is shaped for the model's actual geometry instead:

- everything stays in the model's T-minor layout ([BF, c, T] queries/keys,
  [BF, C, T] values) -- zero transposes in or around the kernel;
- logits are computed per (128 x 128) tile in "S-major" [S, TQ] form, so
  every softmax reduction is over SUBLANES and produces a [1, TQ] lane
  vector that broadcasts natively; no cross-lane reductions, no vector
  transposes;
- online softmax (running max / sum) keeps the full [T, S] attention
  matrix out of HBM entirely, forward and backward (flash algorithm;
  backward recomputes logits from the saved logsumexp);
- the causal band is *skipped*, not masked: query block j only visits key
  blocks lo..j, halving the matmul work vs XLA's full-T^2-then-mask;
- an optional `window` bounds the band (the block-local training
  configuration) and tightens the visited block range further.

The c-contraction (K = 6..16) underfills the MXU; that is the model's
math and is identical in any formulation. What the kernel removes is the
HBM round-trips and the masked-out half of the matmuls.

Reference lineage: the ASA block itself is absent from the reference
(/root/reference/model/mtfaa.py ships no attention; SURVEY.md §2.4) and
was built new from the MTFAA paper; this kernel accelerates our
`models/mtfaa.py:AxialSelfAttention` temporal branch.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128  # query/key tile edge (MXU-native)
_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _band_mask(i, j, window: Optional[int]):
    """[S, TQ] bool mask for key block i vs query block j: s <= t, and
    s > t - window when a window is set. i/j may be traced."""
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0) + i * BLK
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1) + j * BLK
    mask = s_ids <= t_ids
    if window is not None:
        mask = mask & (s_ids > t_ids - window)
    return mask


def _lo_block(j, window: Optional[int]):
    """First key block a query block j can see."""
    if window is None:
        return 0
    # earliest visible key for the block's first query t0 = j*BLK is
    # t0 - window + 1
    return jnp.maximum(0, (j * BLK - window + 1) // BLK)


def _hi_block(i, nb_q: int, window: Optional[int]):
    """One past the last query block that can see key block i."""
    del window  # causality alone bounds it: queries t >= i*BLK
    return nb_q


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, window, c_out):
    j = pl.program_id(1)
    q = q_ref[0]  # [cp, TQ] (pre-scaled)

    def body(i, carry):
        m, l, acc = carry
        kb = k_ref[0, :, pl.ds(i * BLK, BLK)]  # [cp, S]
        vb = v_ref[0, :, pl.ds(i * BLK, BLK)]  # [Cp, S]
        sT = jax.lax.dot_general(
            kb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [S, TQ]
        mask = _band_mask(i, j, window)
        sT = jnp.where(mask, sT, _NEG)
        m_new = jnp.maximum(m, jnp.max(sT, axis=0, keepdims=True))  # [1, TQ]
        p = jnp.where(mask, jnp.exp(sT - m_new), 0.0)  # [S, TQ]
        corr = jnp.exp(m - m_new)  # [1, TQ]
        l = l * corr + jnp.sum(p, axis=0, keepdims=True)
        pv = jax.lax.dot_general(
            vb, p.astype(vb.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Cp, TQ]
        return m_new, l, acc * corr + pv

    init = (
        jnp.full((1, BLK), _NEG, jnp.float32),
        jnp.zeros((1, BLK), jnp.float32),
        jnp.zeros((c_out, BLK), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(_lo_block(j, window), j + 1, body, init)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dD_ref, dq_ref, *, window):
    j = pl.program_id(1)
    q = q_ref[0]      # [cp, TQ]
    do = do_ref[0]    # [Cp, TQ]
    lse = lse_ref[0]  # [1, TQ]
    dD = dD_ref[0]    # [1, TQ]

    def body(i, dq_acc):
        kb = k_ref[0, :, pl.ds(i * BLK, BLK)]
        vb = v_ref[0, :, pl.ds(i * BLK, BLK)]
        sT = jax.lax.dot_general(
            kb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        mask = _band_mask(i, j, window)
        p = jnp.where(mask, jnp.exp(sT - lse), 0.0)  # [S, TQ]
        dPT = jax.lax.dot_general(
            vb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [S, TQ]
        ds = (p * (dPT - dD)).astype(kb.dtype)
        return dq_acc + jax.lax.dot_general(
            kb, ds, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [cp, TQ]

    dq = jax.lax.fori_loop(
        _lo_block(j, window), j + 1, body, jnp.zeros(dq_ref.shape[1:], jnp.float32)
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dD_ref, dk_ref, dv_ref, *,
                window, nb_q):
    i = pl.program_id(1)
    kb = k_ref[0]  # [cp, S]
    vb = v_ref[0]  # [Cp, S]

    def body(j, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, :, pl.ds(j * BLK, BLK)]    # [cp, TQ]
        do = do_ref[0, :, pl.ds(j * BLK, BLK)]  # [Cp, TQ]
        lse = lse_ref[0, :, pl.ds(j * BLK, BLK)]
        dD = dD_ref[0, :, pl.ds(j * BLK, BLK)]
        sT = jax.lax.dot_general(
            kb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        mask = _band_mask(i, j, window)
        p = jnp.where(mask, jnp.exp(sT - lse), 0.0)  # [S, TQ]
        dv_acc = dv_acc + jax.lax.dot_general(
            do, p.astype(do.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Cp, S]
        dPT = jax.lax.dot_general(
            vb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dPT - dD)).astype(q.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            q, ds, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [cp, S]
        return dk_acc, dv_acc

    dk, dv = jax.lax.fori_loop(
        i,
        _hi_block(i, nb_q, window),
        body,
        (jnp.zeros(dk_ref.shape[1:], jnp.float32),
         jnp.zeros(dv_ref.shape[1:], jnp.float32)),
    )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_ct(x, c_to: int, t_to: int):
    b, c, t = x.shape
    return jnp.pad(x, ((0, 0), (0, c_to - c), (0, t_to - t)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_tattn_tm(q, k, v, window: Optional[int] = None, interpret: bool = False):
    """Causal temporal attention, T-minor: softmax_s(q^T k / sqrt(c)) @ v.

    q, k: [BF, c, T]; v: [BF, C, T] -> out [BF, C, T]. `window` bounds each
    query to the previous `window` frames (inclusive of itself). Flash
    forward/backward: the [T, S] attention matrix never touches HBM.
    """
    out, _ = _fwd_impl(q, k, v, window, interpret)
    return out


def _fwd_impl(q, k, v, window, interpret):
    bf, c, t = q.shape
    c_v = v.shape[1]
    tp = _round_up(t, BLK)
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    cp = _round_up(c, sub)
    cvp = _round_up(c_v, sub)
    nb = tp // BLK

    scale = jnp.asarray(1.0 / (c ** 0.5), q.dtype)
    qp = _pad_ct(q * scale, cp, tp)
    kp = _pad_ct(k, cp, tp)
    vp = _pad_ct(v, cvp, tp)

    grid = (bf, nb)
    row = lambda b, j: (b, 0, 0)
    blk = lambda b, j: (b, 0, j)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, window=window, c_out=cvp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, cp, BLK), blk),
            pl.BlockSpec((1, cp, tp), row),
            pl.BlockSpec((1, cvp, tp), row),
        ],
        out_specs=[
            pl.BlockSpec((1, cvp, BLK), blk),
            pl.BlockSpec((1, 1, BLK), blk),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bf, cvp, tp), v.dtype),
            jax.ShapeDtypeStruct((bf, 1, tp), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :c_v, :t], (q, k, v, out, lse)


def _flash_fwd(q, k, v, window, interpret):
    out, res = _fwd_impl(q, k, v, window, interpret)
    return out, res


def _flash_bwd(window, interpret, residuals, g):
    q, k, v, outp, lse = residuals
    bf, c, t = q.shape
    c_v = v.shape[1]
    dtype = q.dtype
    cp, tp = outp.shape[0], outp.shape[2]
    cvp = outp.shape[1]
    sub = 16 if dtype == jnp.bfloat16 else 8
    cp = _round_up(c, sub)
    nb = tp // BLK
    scale_arr = jnp.asarray(1.0 / (c ** 0.5), dtype)
    qp = _pad_ct(q * scale_arr, cp, tp)
    kp = _pad_ct(k, cp, tp)
    vp = _pad_ct(v, cvp, tp)

    gp = _pad_ct(g.astype(jnp.float32), cvp, tp)
    # D[t] = sum_C dO * O (f32, one cheap XLA pass)
    dD = jnp.sum(gp * outp.astype(jnp.float32), axis=1, keepdims=True)  # [BF,1,tp]
    gp = gp.astype(vp.dtype)

    row = lambda b, x: (b, 0, 0)
    blk = lambda b, x: (b, 0, x)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, window=window),
        grid=(bf, nb),
        in_specs=[
            pl.BlockSpec((1, cp, BLK), blk),
            pl.BlockSpec((1, cp, tp), row),
            pl.BlockSpec((1, cvp, tp), row),
            pl.BlockSpec((1, cvp, BLK), blk),
            pl.BlockSpec((1, 1, BLK), blk),
            pl.BlockSpec((1, 1, BLK), blk),
        ],
        out_specs=pl.BlockSpec((1, cp, BLK), blk),
        out_shape=jax.ShapeDtypeStruct((bf, cp, tp), jnp.float32),
        interpret=interpret,
    )(qp, kp, vp, gp, lse, dD)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, window=window, nb_q=nb),
        grid=(bf, nb),
        in_specs=[
            pl.BlockSpec((1, cp, tp), row),
            pl.BlockSpec((1, cp, BLK), blk),
            pl.BlockSpec((1, cvp, BLK), blk),
            pl.BlockSpec((1, cvp, tp), row),
            pl.BlockSpec((1, 1, tp), row),
            pl.BlockSpec((1, 1, tp), row),
        ],
        out_specs=[
            pl.BlockSpec((1, cp, BLK), blk),
            pl.BlockSpec((1, cvp, BLK), blk),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bf, cp, tp), jnp.float32),
            jax.ShapeDtypeStruct((bf, cvp, tp), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, gp, lse, dD)

    scale = 1.0 / (c ** 0.5)
    # qp was pre-scaled by `scale`, so d(q)/d(q_scaled) adds one factor
    dq = (dq[:, :c, :t] * scale).astype(dtype)
    dk = dk[:, :c, :t].astype(dtype)
    dv = dv[:, :c_v, :t].astype(dtype)
    return dq, dk, dv


flash_tattn_tm.defvjp(_flash_fwd, _flash_bwd)


def xla_tattn_tm(q, k, v, window: Optional[int] = None):
    """Reference XLA formulation (full logits + mask) for parity tests.
    Matches models/mtfaa.py's full-causal temporal attention."""
    c = q.shape[1]
    logits = jnp.einsum("bct,bcs->bts", q, k) / (c ** 0.5)
    t = q.shape[-1]
    ti = jnp.arange(t)
    mask = ti[:, None] >= ti[None, :]
    if window is not None:
        mask = mask & (ti[None, :] > ti[:, None] - window)
    logits = jnp.where(mask[None], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bts,bcs->bct", attn, v)
