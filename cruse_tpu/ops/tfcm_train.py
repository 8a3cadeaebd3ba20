"""Hand-scheduled training pass for one TFCM block (round-4 perf work).

Why this exists: the windowed-MTFAA train step spends 60.6 ms in the TFCM
backward for a 12.8 ms forward (scripts/profile_step_anatomy.py). The
controlled chain harness (scripts/profile_tfcm_chain.py) attributes the
blowup to parameter gradients: with 24 blocks in one graph XLA stops
multi-output-fusing the ~9 per-channel reductions per block (BN scale/bias,
PReLU slopes, conv biases, 9 depthwise tap grads) -- each becomes its own
full HBM pass over [B, K, C, T] activations:

    chain fwd                    3.7 ms
    chain fwd+bwd (x grads)     10.0 ms
    chain fwd+bwd (all grads)   32.3 ms   <- 22.3 ms of param-grad passes

This module wraps the block in jax.custom_vjp with a hand-written backward
arranged in the minimal 3-phase structure forced by the two BatchNorm
global-mean barriers:

    phase A (tail):  dh2a, dh2n + all BN2/PReLU2/pconv2 reductions
    phase B (mid):   BN2-apply -> depthwise-stencil vjp -> dh1a, dh1n +
                     BN1/PReLU1 reductions
    phase C (head):  BN1-apply -> dW1, db1, dx

Phases are written so each big tensor is touched once per phase; the
per-channel reductions of one phase share operands and sit adjacent so XLA
can multi-output-fuse them inside a small subgraph (and, if it still
refuses, the phase maps 1:1 onto a Pallas kernel -- see
ops/dw_kernel.py for the fused stencil used by phase B).

Semantics: exactly TFCMBlock's math (models/mtfaa.py:244-291) in train
mode with batch statistics -- forward parity is bit-level against the
einsum path modulo reassociation; gradients match autodiff to bf16
tolerance (tests/test_tfcm_train.py). The batch-stat outputs (bm1, bv1,
bm2, bv2) feed the running-stat EMA in the caller and MUST be wrapped in
stop_gradient there: the custom backward treats their cotangents as zero
(running statistics never sit on the loss path).

Reference lineage: /root/reference/model/mtfaa.py:166-207 (TFCM blocks,
BN2d + PReLU + grouped depthwise conv); this file reimplements the
training pass TPU-natively, it is not a translation.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _stencil(xe: jax.Array, wd: jax.Array, d: int, k_len: int, t_len: int) -> jax.Array:
    """9-tap shifted-MAC depthwise conv on the time-extended input
    xe [B, K, C, T+2d] -> [B, K, C, T] (causal time taps, symmetric freq)."""
    xp = jnp.pad(xe, ((0, 0), (1, 1), (0, 0), (0, 0)))
    acc = None
    for it in range(3):
        for jf in range(3):
            sl = xp[:, jf : jf + k_len, :, it * d : it * d + t_len] * wd[it, jf][:, None]
            acc = sl if acc is None else acc + sl
    return acc


def _bn_train_fwd(h: jax.Array, scale: jax.Array, bias: jax.Array, eps: float):
    """BatchNormC train-mode math (models/mtfaa.py BatchNormC), returning
    the normalized output and the fp32 batch stats."""
    hf = h.astype(jnp.float32)
    mean = jnp.mean(hf, axis=(0, 1, 3))
    var = jnp.mean(jnp.square(hf), axis=(0, 1, 3)) - jnp.square(mean)
    inv = (jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)).astype(h.dtype)
    out = (h - mean.astype(h.dtype)[:, None]) * inv[:, None] + bias.astype(h.dtype)[:, None]
    return out, mean, var


def _prelu(h: jax.Array, a: jax.Array) -> jax.Array:
    return jnp.where(h >= 0, h, a.astype(h.dtype) * h)


Params = Tuple[jax.Array, ...]  # (w1,b1,g1,be1,a1,wd,bd,g2,be2,a2,w2,b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def tfcm_block_train(x: jax.Array, params: Params, d: int, eps: float = 1e-5,
                     impl: str = "xla"):
    """One TFCM block, train mode, with a hand-scheduled backward.

    x [B, K, C, T] (T-minor), params as in TFCMBlock. Returns
    (y, new_hist [B,K,C,2d], bm1, bv1, bm2, bv2). Wrap the last five
    outputs in stop_gradient at the call site (their cotangents are
    ignored by the custom backward)."""
    out, _res = _fwd(x, params, d, eps, fold="fold" in impl)
    return out


def _fwd(x, params, d: int, eps: float, fold: bool = False):
    w1, b1, g1, be1, a1, wd, bd, g2, be2, a2, w2, b2 = params
    k_len, t_len = x.shape[1], x.shape[3]
    if fold:
        # Round-5 lever (VERDICT r4 item 1b): BN1's batch stats commute
        # with the 1x1 contraction -- mean(h1) = mean(x) @ W1 + b1 and
        # E[h1^2] needs only the tiny CxC Gram of x -- so the first matmul
        # can emit the NORMALIZED activation directly (rsqrt scale folded
        # into W1's columns, shift into the bias). This deletes the
        # unnormalized h1 materialization, its stats read-pass, and the
        # separate normalize pass; the backward gets xh1 for free (it is
        # exactly the saved pre-affine output). Costs one extra MXU matmul
        # over x (the Gram) + one reduce. BN2 cannot fold this way: the
        # stencil's 9 taps would need 45 shifted-pair correlations.
        f32 = jnp.float32
        n = x.shape[0] * k_len * t_len
        w1f = w1.astype(f32)
        b1f = b1.astype(f32)
        mu_x = jnp.mean(x.astype(f32), axis=(0, 1, 3))  # [Cin]
        gram = jnp.einsum("bkct,bket->ce", x, x,
                          preferred_element_type=f32) / n  # [Cin, Cin]
        m1 = mu_x @ w1f + b1f  # [C]
        e2 = (jnp.einsum("ce,co,eo->o", gram, w1f, w1f)
              + 2.0 * b1f * (mu_x @ w1f) + jnp.square(b1f))
        v1 = e2 - jnp.square(m1)
        inv1r = jax.lax.rsqrt(v1 + eps)  # [C] fp32
        w1n = (w1f * inv1r[None, :]).astype(x.dtype)
        b1n = ((b1f - m1) * inv1r).astype(x.dtype)
        xh1 = jnp.einsum("bkct,co->bkot", x, w1n) + b1n[:, None]  # == (h1-m)/sigma
        h1n = xh1 * g1.astype(x.dtype)[:, None] + be1.astype(x.dtype)[:, None]
        h1_res = xh1  # backward consumes xh1 directly (fold=True)
    else:
        h1 = jnp.einsum("bkct,co->bkot", x, w1) + b1[:, None]
        h1n, m1, v1 = _bn_train_fwd(h1, g1, be1, eps)
        h1_res = h1
    h1a = _prelu(h1n, a1)
    xe = jnp.pad(h1a, ((0, 0), (0, 0), (0, 0), (2 * d, 0)))
    h2 = _stencil(xe, wd, d, k_len, t_len) + bd[:, None]
    h2n, m2, v2 = _bn_train_fwd(h2, g2, be2, eps)
    h2a = _prelu(h2n, a2)
    y_core = jnp.einsum("bkct,co->bkot", h2a, w2) + b2[:, None]
    y = y_core + x
    new_hist = xe[..., xe.shape[-1] - 2 * d :]
    out = (y, new_hist, m1, v1, m2, v2)
    res = (x, h1_res, h2, m1, v1, m2, v2, params)
    return out, res


def _vjp_fwd(x, params, d: int, eps: float, impl: str = "xla"):
    return _fwd(x, params, d, eps, fold="fold" in impl)


def _vjp_bwd(d: int, eps: float, impl: str, res, cots):
    if impl.startswith("pallas"):
        return _vjp_bwd_kernels(d, eps, res, cots,
                                interpret=impl.endswith("interpret"))
    if "merged" in impl:
        return _vjp_bwd_merged(d, eps, res, cots, fold="fold" in impl)
    return _vjp_bwd_xla(d, eps, res, cots, fold="fold" in impl)


def _multi_sum(operands):
    """All per-channel reductions of one phase as ONE variadic lax.reduce
    over axes (0,1,3): a single HLO op the fusion pass cannot split back
    into per-output HBM passes. In the full training graph XLA defuses
    independent `jnp.sum`s into ~270 separate multiply_reduce launches per
    step (23.5 ms, scripts/trace_lines.py --ops); in isolation it fuses
    them fine, which is why the isolated chain harness never showed this.
    Operands are cast to f32 in the generator so the converts fuse with
    their elementwise producers."""
    ops = tuple(o.astype(jnp.float32) for o in operands)
    inits = tuple(jnp.float32(0) for _ in ops)

    def comp(accs, vals):
        return tuple(a + v for a, v in zip(accs, vals))

    return jax.lax.reduce(ops, inits, comp, (0, 1, 3))


def _vjp_bwd_merged(d: int, eps: float, res, cots, fold: bool):
    """_vjp_bwd_xla with each phase's per-channel/tap reductions merged
    into one variadic reduce (see _multi_sum). Math identical; only the
    reduction grouping differs. The new_hist/stat cotangents are treated
    as zero (callers stop-gradient those outputs -- module contract)."""
    x, h1, h2, m1, v1, m2, v2, params = res
    w1, b1, g1, be1, a1, wd, bd, g2, be2, a2, w2, b2 = params
    g = cots[0]
    dt = x.dtype
    b, k_len, c, t_len = x.shape
    n = b * k_len * t_len

    # ---- phase A: tail (reads g, h2) ----
    inv2r = jax.lax.rsqrt(v2 + eps)
    xh2 = ((h2.astype(jnp.float32) - m2[:, None]) * inv2r[:, None]).astype(dt)
    h2n = xh2 * g2.astype(dt)[:, None] + be2.astype(dt)[:, None]
    h2a = _prelu(h2n, a2)
    dh2a = jnp.einsum("bkot,co->bkct", g, w2)
    neg2 = h2n < 0
    dh2n = jnp.where(neg2, a2.astype(dt) * dh2a, dh2a)
    dg2, dbe2, da2v, db2 = _multi_sum(
        (dh2n * xh2, dh2n,
         jnp.where(neg2, dh2a * h2n, jnp.zeros_like(h2n)), g))
    da2 = jnp.sum(da2v)
    dw2 = jnp.einsum("bkct,bkot->co", h2a, g).astype(jnp.float32)

    # ---- phase B: mid (BN2-apply -> stencil vjp -> BN1/PReLU1 partials) ----
    s2 = (inv2r * g2.astype(jnp.float32)).astype(dt)
    dh2 = s2[:, None] * (
        dh2n
        - (dbe2 / n).astype(dt)[:, None]
        - xh2 * (dg2 / n).astype(dt)[:, None]
    )
    gp = jnp.pad(dh2, ((0, 0), (1, 1), (0, 0), (2 * d, 2 * d)))
    t_ext = t_len + 2 * d
    wf = wd[::-1, ::-1]
    acc = None
    for it in range(3):
        for jf in range(3):
            sl = gp[:, jf : jf + k_len, :, it * d : it * d + t_ext] * wf[it, jf][:, None]
            acc = sl if acc is None else acc + sl
    dxe = acc
    inv1r = jax.lax.rsqrt(v1 + eps)
    if fold:
        xh1 = h1
    else:
        xh1 = ((h1.astype(jnp.float32) - m1[:, None]) * inv1r[:, None]).astype(dt)
    h1n = xh1 * g1.astype(dt)[:, None] + be1.astype(dt)[:, None]
    h1a = _prelu(h1n, a1)
    xe = jnp.pad(h1a, ((0, 0), (0, 0), (0, 0), (2 * d, 0)))
    xp = jnp.pad(xe, ((0, 0), (1, 1), (0, 0), (0, 0)))
    dh1a = dxe[..., 2 * d :]
    neg1 = h1n < 0
    dh1n = jnp.where(neg1, a1.astype(dt) * dh1a, dh1a)
    taps = tuple(xp[:, jf : jf + k_len, :, it * d : it * d + t_len] * dh2
                 for it in range(3) for jf in range(3))
    outs = _multi_sum(taps + (
        dh1n * xh1, dh1n,
        jnp.where(neg1, dh1a * h1n, jnp.zeros_like(h1n)), dh2))
    dwd = jnp.stack(outs[:9]).reshape(3, 3, c)
    dg1, dbe1, da1v, dbd = outs[9], outs[10], outs[11], outs[12]
    da1 = jnp.sum(da1v)

    # ---- phase C: head (BN1-apply -> dW1, db1, dx) ----
    s1 = (inv1r * g1.astype(jnp.float32)).astype(dt)
    dh1 = s1[:, None] * (
        dh1n
        - (dbe1 / n).astype(dt)[:, None]
        - xh1 * (dg1 / n).astype(dt)[:, None]
    )
    db1 = jnp.sum(dh1.astype(jnp.float32), axis=(0, 1, 3))
    dw1 = jnp.einsum("bkct,bkot->co", x, dh1).astype(jnp.float32)
    dx = jnp.einsum("bkot,co->bkct", dh1, w1) + g

    dparams = (
        dw1.astype(w1.dtype), db1.astype(b1.dtype),
        dg1.astype(g1.dtype), dbe1.astype(be1.dtype), da1.astype(a1.dtype),
        dwd.astype(wd.dtype), dbd.astype(bd.dtype),
        dg2.astype(g2.dtype), dbe2.astype(be2.dtype), da2.astype(a2.dtype),
        dw2.astype(w2.dtype), db2.astype(b2.dtype),
    )
    return dx, dparams


def _vjp_bwd_kernels(d: int, eps: float, res, cots, interpret: bool):
    """Kernel-backed 3-phase backward: tail + mid reductions run in the
    Pallas kernels (one HBM pass each), phase C (BN1-apply, dW1, db1, dx)
    stays in XLA. The new_hist and batch-stat cotangents are treated as
    zero (the caller stop-gradients those outputs)."""
    from cruse_tpu.ops.tfcm_bwd_kernels import mid_bwd, tail_bwd

    x, h1, h2, m1, v1, m2, v2, params = res
    w1, b1, g1, be1, a1, wd, bd, g2, be2, a2, w2, b2 = params
    g = cots[0]
    dt = x.dtype
    b, k_len, c, t_len = x.shape
    n = b * k_len * t_len

    # matmul-shaped grads stay in XLA (cheap there; the kernels carry the
    # reduction clusters XLA defuses)
    dh2a = jnp.einsum("bkot,co->bkct", g, w2)
    db2 = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 3))

    dh2n, dg2, dbe2, da2 = tail_bwd(
        dh2a, h2, m2, v2, g2, be2, a2, eps, interpret=interpret)

    # dW2 needs h2a; recompute elementwise (fuses into the dot operand)
    inv2r_e = jax.lax.rsqrt(v2 + eps)
    xh2_e = ((h2.astype(jnp.float32) - m2[:, None]) * inv2r_e[:, None]).astype(dt)
    h2n_e = xh2_e * g2.astype(dt)[:, None] + be2.astype(dt)[:, None]
    h2a_e = jnp.where(h2n_e >= 0, h2n_e, a2.astype(dt) * h2n_e)
    dw2 = jnp.einsum("bkct,bkot->co", h2a_e, g).astype(jnp.float32)

    # BN2-apply (elementwise, fuses) + pad straight into the mid kernel's
    # expected layout
    inv2r = jax.lax.rsqrt(v2 + eps)
    xh2 = ((h2.astype(jnp.float32) - m2[:, None]) * inv2r[:, None]).astype(dt)
    s2 = (inv2r * g2.astype(jnp.float32)).astype(dt)
    dh2 = s2[:, None] * (
        dh2n
        - (dbe2 / n).astype(dt)[:, None]
        - xh2 * (dg2 / n).astype(dt)[:, None]
    )
    gp = jnp.pad(dh2, ((0, 0), (1, 1), (0, 0), (2 * d, 2 * d)))

    dh1n, dwd, dg1, dbe1, da1, dbd = mid_bwd(
        gp, h1, wd, m1, v1, g1, be1, a1, d, eps, interpret=interpret)

    # phase C: BN1-apply -> dW1, db1, dx (XLA: matmul grads are cheap)
    inv1r = jax.lax.rsqrt(v1 + eps)
    xh1 = ((h1.astype(jnp.float32) - m1[:, None]) * inv1r[:, None]).astype(dt)
    s1 = (inv1r * g1.astype(jnp.float32)).astype(dt)
    dh1 = s1[:, None] * (
        dh1n
        - (dbe1 / n).astype(dt)[:, None]
        - xh1 * (dg1 / n).astype(dt)[:, None]
    )
    db1 = jnp.sum(dh1.astype(jnp.float32), axis=(0, 1, 3))
    dw1 = jnp.einsum("bkct,bkot->co", x, dh1).astype(jnp.float32)
    dx = jnp.einsum("bkot,co->bkct", dh1, w1) + g

    dparams = (
        dw1.astype(w1.dtype), db1.astype(b1.dtype),
        dg1.astype(g1.dtype), dbe1.astype(be1.dtype), da1.astype(a1.dtype),
        dwd.astype(wd.dtype), dbd.astype(bd.dtype),
        dg2.astype(g2.dtype), dbe2.astype(be2.dtype), da2.astype(a2.dtype),
        dw2.astype(w2.dtype), db2.astype(b2.dtype),
    )
    return dx, dparams


def _vjp_bwd_xla(d: int, eps: float, res, cots, fold: bool = False):
    """3-phase hand-scheduled backward. Stat AND new_hist cotangents are
    treated as zero (module contract: callers stop-gradient those outputs
    -- models/mtfaa.py:376-381). Round-5 finding: honoring g_hist cost a
    full-tensor dynamic-update-slice per block in the production graph
    (~20 DUS/step, ~5 ms) to add a cotangent that is concretely all-zero;
    the kernels backward already ignored it. With fold=True the residual
    slot carries xh1 (the already-normalized pre-affine activation the
    folded forward emits) instead of the raw h1."""
    x, h1, h2, m1, v1, m2, v2, params = res
    w1, b1, g1, be1, a1, wd, bd, g2, be2, a2, w2, b2 = params
    g = cots[0]
    dt = x.dtype
    b, k_len, c, t_len = x.shape
    n = b * k_len * t_len

    # ---- phase A: tail (reads g, h2) ----
    inv2r = jax.lax.rsqrt(v2 + eps)  # [C] fp32
    xh2 = ((h2.astype(jnp.float32) - m2[:, None]) * inv2r[:, None]).astype(dt)
    h2n = xh2 * g2.astype(dt)[:, None] + be2.astype(dt)[:, None]
    h2a = _prelu(h2n, a2)
    dh2a = jnp.einsum("bkot,co->bkct", g, w2)
    neg2 = h2n < 0
    dh2n = jnp.where(neg2, a2.astype(dt) * dh2a, dh2a)
    # shared-operand reductions, adjacent for multi-output fusion
    da2 = jnp.sum(jnp.where(neg2, dh2a * h2n, jnp.zeros_like(h2n)).astype(jnp.float32))
    dg2 = jnp.sum((dh2n * xh2).astype(jnp.float32), axis=(0, 1, 3))
    dbe2 = jnp.sum(dh2n.astype(jnp.float32), axis=(0, 1, 3))
    db2 = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 3))
    dw2 = jnp.einsum("bkct,bkot->co", h2a, g).astype(jnp.float32)

    # ---- phase B: mid (BN2-apply -> stencil vjp -> BN1/PReLU1 partials) ----
    s2 = (inv2r * g2.astype(jnp.float32)).astype(dt)  # d h2n / d h2 scale
    dh2 = s2[:, None] * (
        dh2n
        - (dbe2 / n).astype(dt)[:, None]
        - xh2 * (dg2 / n).astype(dt)[:, None]
    )
    dbd = jnp.sum(dh2.astype(jnp.float32), axis=(0, 1, 3))
    # stencil vjp: dxe = flipped stencil on dh2; dwd = per-tap correlations
    gp = jnp.pad(dh2, ((0, 0), (1, 1), (0, 0), (2 * d, 2 * d)))
    t_ext = t_len + 2 * d
    wf = wd[::-1, ::-1]
    acc = None
    for it in range(3):
        for jf in range(3):
            sl = gp[:, jf : jf + k_len, :, it * d : it * d + t_ext] * wf[it, jf][:, None]
            acc = sl if acc is None else acc + sl
    dxe = acc
    # dwd: tap correlations between xe (recomputed) and dh2
    inv1r = jax.lax.rsqrt(v1 + eps)
    if fold:  # the folded forward saved xh1 itself -- no recompute pass
        xh1 = h1
    else:
        xh1 = ((h1.astype(jnp.float32) - m1[:, None]) * inv1r[:, None]).astype(dt)
    h1n = xh1 * g1.astype(dt)[:, None] + be1.astype(dt)[:, None]
    h1a = _prelu(h1n, a1)
    xe = jnp.pad(h1a, ((0, 0), (0, 0), (0, 0), (2 * d, 0)))
    xp = jnp.pad(xe, ((0, 0), (1, 1), (0, 0), (0, 0)))
    dwd_rows = []
    for it in range(3):
        for jf in range(3):
            sl = xp[:, jf : jf + k_len, :, it * d : it * d + t_len]
            dwd_rows.append(jnp.sum((sl * dh2).astype(jnp.float32), axis=(0, 1, 3)))
    dwd = jnp.stack(dwd_rows).reshape(3, 3, c)
    dh1a = dxe[..., 2 * d :]
    neg1 = h1n < 0
    dh1n = jnp.where(neg1, a1.astype(dt) * dh1a, dh1a)
    da1 = jnp.sum(jnp.where(neg1, dh1a * h1n, jnp.zeros_like(h1n)).astype(jnp.float32))
    dg1 = jnp.sum((dh1n * xh1).astype(jnp.float32), axis=(0, 1, 3))
    dbe1 = jnp.sum(dh1n.astype(jnp.float32), axis=(0, 1, 3))

    # ---- phase C: head (BN1-apply -> dW1, db1, dx) ----
    s1 = (inv1r * g1.astype(jnp.float32)).astype(dt)
    dh1 = s1[:, None] * (
        dh1n
        - (dbe1 / n).astype(dt)[:, None]
        - xh1 * (dg1 / n).astype(dt)[:, None]
    )
    db1 = jnp.sum(dh1.astype(jnp.float32), axis=(0, 1, 3))
    dw1 = jnp.einsum("bkct,bkot->co", x, dh1).astype(jnp.float32)
    dx = jnp.einsum("bkot,co->bkct", dh1, w1) + g

    dparams = (
        dw1.astype(w1.dtype), db1.astype(b1.dtype),
        dg1.astype(g1.dtype), dbe1.astype(be1.dtype), da1.astype(a1.dtype),
        dwd.astype(wd.dtype), dbd.astype(bd.dtype),
        dg2.astype(g2.dtype), dbe2.astype(be2.dtype), da2.astype(a2.dtype),
        dw2.astype(w2.dtype), db2.astype(b2.dtype),
    )
    return dx, dparams


tfcm_block_train.defvjp(_vjp_fwd, _vjp_bwd)
