"""Weight-only int8 quantization for deployment artifacts.

Per-output-channel symmetric int8 on the large weight tensors (conv / dense /
RNN kernels), fp32 for everything small (biases, norm scales, running stats).
Dequantization happens INSIDE the jitted graph, so exported artifacts
(`tools/export.py --quantize int8`) and serving closures keep the int8 bytes
as their baked constants: ~4x smaller blobs and ~4x less parameter HBM
residency, with the int8->fp convert+scale fused into the consumers by XLA.

This is beyond the reference: its deployment path exports ONNX and leaves
quantization to the downstream runtime (/root/reference/test/test_model.py
exports only fp32 traces). Here the quantized model is a first-class,
parity-tested artifact of the one framework.

Representation: a quantized leaf replaces the weight array in the pytree with
a dict {"__q8__": int8[..., C], "__q8_scale__": f32[1, ..., C]} (scale keeps
dims so dequant is one broadcast multiply). `dequantize_tree` is traceable and
is the identity on unquantized trees, so call sites can apply it
unconditionally.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax
import jax.numpy as jnp

Q_KEY = "__q8__"
SCALE_KEY = "__q8_scale__"

# Leaves smaller than this stay fp32: quantizing a 100-float bias saves
# nothing and risks precision where it is cheapest to keep.
DEFAULT_MIN_SIZE = 2048


def is_quantized_leaf(node: Any) -> bool:
    return isinstance(node, Mapping) and Q_KEY in node and SCALE_KEY in node


def _quantize_array(w: np.ndarray) -> dict:
    """Symmetric per-output-channel int8 (channel = last axis, Flax kernel
    convention: Dense [in, out], Conv [kh, kw, in, out], GRU [in, hidden])."""
    w = np.asarray(w, np.float32)
    amax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return {Q_KEY: jnp.asarray(q), SCALE_KEY: jnp.asarray(scale, jnp.float32)}


def quantize_tree(tree: Any, *, min_size: int = DEFAULT_MIN_SIZE) -> Any:
    """Quantize every float leaf with ndim >= 2 and size >= min_size.

    1-D leaves (biases, norm scales/offsets, BN running stats) and small
    kernels pass through untouched. Idempotent: already-quantized leaves are
    left as-is.
    """
    if is_quantized_leaf(tree):
        return tree
    if isinstance(tree, Mapping):
        return {k: quantize_tree(v, min_size=min_size) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(quantize_tree(v, min_size=min_size) for v in tree)
    leaf = tree
    if hasattr(leaf, "ndim") and hasattr(leaf, "dtype"):
        if leaf.ndim >= 2 and leaf.size >= min_size and np.dtype(leaf.dtype).kind == "f":
            return _quantize_array(np.asarray(leaf))
    return leaf


def dequantize_tree(tree: Any, dtype=jnp.float32) -> Any:
    """Traceable inverse: identity on unquantized nodes, so every consumer
    can call it unconditionally before `model.apply`."""
    if is_quantized_leaf(tree):
        return tree[Q_KEY].astype(dtype) * tree[SCALE_KEY].astype(dtype)
    if isinstance(tree, Mapping):
        return {k: dequantize_tree(v, dtype) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(dequantize_tree(v, dtype) for v in tree)
    return tree


def quantize_variables(variables: Mapping, *, min_size: int = DEFAULT_MIN_SIZE) -> dict:
    """Quantize the 'params' collection only; batch_stats and other
    collections keep full precision (they are tiny and stateful)."""
    out = dict(variables)
    if "params" in out:
        out["params"] = quantize_tree(out["params"], min_size=min_size)
    return out


def quantization_report(tree: Any) -> dict:
    """{'leaves_quantized', 'leaves_kept', 'bytes_fp32', 'bytes_quantized'} —
    for the export log line."""
    report = {"leaves_quantized": 0, "leaves_kept": 0, "bytes_fp32": 0, "bytes_quantized": 0}

    def walk(node):
        if is_quantized_leaf(node):
            n = node[Q_KEY].size
            report["leaves_quantized"] += 1
            report["bytes_fp32"] += 4 * n
            report["bytes_quantized"] += n + 4 * node[SCALE_KEY].size
            return
        if isinstance(node, Mapping):
            for v in node.values():
                walk(v)
            return
        if isinstance(node, (list, tuple)):
            for v in node:
                walk(v)
            return
        if hasattr(node, "size") and hasattr(node, "dtype"):
            nbytes = int(node.size) * np.dtype(node.dtype).itemsize
            report["leaves_kept"] += 1
            report["bytes_fp32"] += nbytes
            report["bytes_quantized"] += nbytes

    walk(tree)
    return report
