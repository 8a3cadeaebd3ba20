"""Bisect the isolated windowed ASA (fwd+bwd, production shapes, 3 encoder
sites) into its pieces. profile_asa_micro.py showed the tiny-K logits
einsum is NOT the cost (3.5 ms fwd+bwd all sites); this finds what is.

Variants (each a surgical ablation of AxialSelfAttention's batch path):
  full        the production module
  no_fattn    frequency attention removed (isolates time attention)
  no_tattn    time attention removed (isolates freq attention + projs)
  lin_sm      softmax replaced by masked scaling (same tensors, no exp/max/
              sum passes) -> softmax differential
  no_mask     mask/where removed (band mask only baked as multiply)
  proj_only   q/k/v projections only

Usage: python scripts/profile_asa_bisect.py [variant ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_cache = os.environ.get("CRUSE_TPU_TEST_CACHE", "/root/.cache/cruse_tpu_jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B, T, W = 16, 626, 126
ITERS = 20
DT = jnp.bfloat16
SITES = [(64, 24), (32, 32), (16, 48)]


def asa(x, params, variant):
    """Production windowed-ASA math (mtfaa.py AxialSelfAttention batch path,
    state=None, causal, window=W) with ablation switches."""
    b, f, c, t = x.shape
    c_att = max(c // 4, 1)
    (wqf, bqf, wkf, bkf, wvf, bvf, wqt, bqt, wkt, bkt, wvt, bvt) = params

    def proj(u, wgt, bias):
        return jnp.einsum("bkct,co->bkot", u, wgt) + bias[:, None]

    inv_scale = jnp.asarray(1.0 / np.sqrt(c_att), x.dtype)

    if variant == "proj_only":
        return (proj(x, wqf, bqf).sum() + proj(x, wkf, bkf).sum()
                + proj(x, wvf, bvf).sum() + proj(x, wqt, bqt).sum()
                + proj(x, wkt, bkt).sum() + proj(x, wvt, bvt).sum())

    def softmax(logits, axis):
        if variant == "lin_sm":
            return logits * jnp.asarray(1e-3, logits.dtype)
        if variant in ("bf16_sm", "fast"):
            # bf16 exp, f32 sum accumulation: max is exact in bf16, the
            # probs carry ~0.4% relative noise (quality-gated)
            m = jax.lax.stop_gradient(jnp.max(logits, axis=axis, keepdims=True))
            e = jnp.exp(logits - m)
            s = jnp.sum(e.astype(jnp.float32), axis=axis, keepdims=True)
            return e * (1.0 / s).astype(e.dtype)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=axis).astype(logits.dtype)

    # --- frequency attention ---
    if variant in ("tmajor_f", "fast"):
        # T-leading layout: the production einsums batch over the MINOR T
        # axis (bad lowering); transpose to [b,t,k,c], do clean batched
        # matmuls, transpose back.
        qf = proj(x, wqf, bqf)
        kf = proj(x, wkf, bkf)
        vf = proj(x, wvf, bvf)
        qt_ = jnp.transpose(qf, (0, 3, 1, 2))  # [b,t,k,ca]
        kt_ = jnp.transpose(kf, (0, 3, 1, 2))
        vt_ = jnp.transpose(vf, (0, 3, 1, 2))  # [b,t,k,c]
        logits = jnp.einsum("btkc,btqc->btkq", qt_, kt_) * inv_scale
        attn = softmax(logits, -1)
        xf = jnp.einsum("btkq,btqc->btkc", attn, vt_)
        x = x + jnp.transpose(xf, (0, 2, 3, 1))
    elif variant != "no_fattn":
        qf = proj(x, wqf, bqf)
        kf = proj(x, wkf, bkf)
        vf = proj(x, wvf, bvf)
        logits = jnp.einsum("bkct,bqct->bkqt", qf, kf) * inv_scale
        attn = softmax(logits, 2)
        x = x + jnp.einsum("bkqt,bqct->bkct", attn, vf)

    if variant == "no_tattn":
        return jnp.sum(x.astype(jnp.float32) ** 2)

    # --- windowed time attention (two-block trick) ---
    qt = proj(x, wqt, bqt)
    kt = proj(x, wkt, bkt)
    vt = proj(x, wvt, bvt)
    w = min(W, t)
    nb = -(-t // w)
    pad_t = nb * w - t
    q_p = jnp.pad(qt, ((0, 0), (0, 0), (0, 0), (0, pad_t)))
    k_p = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (0, pad_t)))
    v_p = jnp.pad(vt, ((0, 0), (0, 0), (0, 0), (0, pad_t)))
    qb = q_p.reshape(b, f, c_att, nb, w)
    kb = k_p.reshape(b, f, c_att, nb, w)
    vb = v_p.reshape(b, f, c, nb, w)
    kprev = jnp.pad(kb, ((0, 0), (0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :, :nb]
    vprev = jnp.pad(vb, ((0, 0), (0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :, :nb]
    k2 = jnp.concatenate([kprev, kb], axis=4)
    v2 = jnp.concatenate([vprev, vb], axis=4)
    logits = jnp.einsum("bfcnw,bfcns->bfnws", qb, k2) * inv_scale
    wi = jnp.arange(w)[:, None]
    si = jnp.arange(2 * w)[None, :]
    band = (si > wi) & (si <= wi + w)
    if variant == "no_mask":
        logits = logits * band.astype(logits.dtype)[None, None, None]
    else:
        first = si >= w
        mask = jnp.where(jnp.arange(nb)[:, None, None] == 0, band & first, band)
        logits = jnp.where(mask[None, None], logits, jnp.asarray(-1e9, logits.dtype))
    attn = softmax(logits, -1)
    xt = jnp.einsum("bfnws,bfcns->bfcnw", attn, v2)
    xt = xt.reshape(b, f, c, nb * w)[..., :t]
    x = x + xt
    return jnp.sum(x.astype(jnp.float32) ** 2)


def measure(variant):
    rng = np.random.default_rng(0)
    data = []
    for f, c in SITES:
        ca = max(c // 4, 1)
        x = jnp.asarray(rng.standard_normal((B, f, c, T)), DT) * 0.1

        def r(*shape):
            return jnp.asarray(rng.standard_normal(shape), DT) * 0.2
        params = (r(c, ca), r(ca), r(c, ca), r(ca), r(c, c), r(c),
                  r(c, ca), r(ca), r(c, ca), r(ca), r(c, c), r(c))
        data.append((x, params))

    def one(data, seed):
        tot = jnp.float32(0.0)
        for x, params in data:
            val, grads = jax.value_and_grad(
                lambda xx, pp: asa(xx, pp, variant).astype(jnp.float32) * 1e-6
            , argnums=(0, 1))(x * (1 + 1e-9 * seed), params)
            gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in
                       jax.tree_util.tree_leaves(grads))
            tot = tot + val + 1e-12 * gsum
        return tot

    @jax.jit
    def loop(data):
        def body(i, acc):
            return acc + one(data, acc)
        return lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(data))
    times = []
    for rep in range(3):
        fresh = [(x * (1 + 1e-4 * (rep + 1)), p) for x, p in data]
        float(fresh[0][0].ravel()[0])
        t0 = time.perf_counter()
        float(loop(fresh))
        times.append(time.perf_counter() - t0)
    dt = min(times) / ITERS
    print(f"{variant:10s} {dt * 1e3:7.2f} ms (fwd+bwd, 3 sites)", flush=True)


ALL = ["full", "no_fattn", "no_tattn", "lin_sm", "no_mask", "proj_only",
       "tmajor_f", "bf16_sm", "fast"]

if __name__ == "__main__":
    for v in sys.argv[1:] or ALL:
        measure(v)
