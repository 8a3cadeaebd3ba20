"""Self-contained deployment artifacts: save/load the `.jaxexport` container.

The reference's deployment story is exporter + runtime consumer: it traces
modules to ONNX/torchscript blobs (reference `test/test_model.py:348-379`)
which a serving host runs WITHOUT the training code. The TPU-native analogue
here is a zip container around `jax.export` graphs plus JSON metadata, so a
consumer needs only jax + this small loader — no model classes, no configs,
no checkpoints:

  meta.json    {"format": "cruse-tpu-artifact/1", "kind": "offline"|"streaming",
                "sr", "n_fft", "hop_length", "batch",
                "length" (offline), "num_mics" (multi-mic streaming), ...}
  graph.bin    offline:   enhanced [B, L]        = call(noisy [B, L])
  step.bin     streaming: (out [B, hop], state') = call(state, hop [B(,M), hop])
  init.bin     streaming: state                  = call()

`init.bin` is the piece that makes the streaming blob self-contained: the
carried stream state is an opaque pytree whose structure depends on the model
family, so the initial carry is itself shipped as a no-arg exported graph —
the consumer never constructs it.

Raw (container-less) `jax.export` blobs from older exports still load as
offline artifacts with empty metadata.

The streaming carry is a `StreamState` namedtuple whose serialization is
registered HERE (not in `cruse_tpu.infer.streaming`) so this file alone is
enough to deserialize step.bin/init.bin — a consumer that copies artifact.py
out of the package needs only jax. `streaming.py` imports the type from here.
"""
from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Any, NamedTuple

FORMAT = "cruse-tpu-artifact/1"


class StreamState(NamedTuple):
    """Per-hop streaming carry (built by `cruse_tpu.infer.streaming`, shipped
    opaquely inside streaming containers as the exported init graph's output).
    """

    input_tail: Any  # [B(, M), n_fft - hop] analysis-buffer samples
    ola_tail: Any  # [B, n_fft - hop] synthesis overlap-add tail
    model_state: Any  # opaque model-family pytree


try:  # registration is what lets jax.export round-trip the carry pytree
    import jax as _jax

    _jax.export.register_namedtuple_serialization(
        StreamState, serialized_name="cruse_tpu.infer.streaming.StreamState"
    )
except (ImportError, AttributeError):  # older jax without namedtuple support
    pass


# ---------------- save ----------------


def save_offline(path: str, graph_blob: bytes, meta: dict) -> None:
    meta = dict(meta, format=FORMAT, kind="offline")
    _write_container(path, meta, {"graph.bin": graph_blob})


def save_streaming(path: str, step_blob: bytes, init_blob: bytes, meta: dict) -> None:
    meta = dict(meta, format=FORMAT, kind="streaming")
    _write_container(path, meta, {"step.bin": step_blob, "init.bin": init_blob})


def _write_container(path: str, meta: dict, blobs: dict) -> None:
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1, sort_keys=True))
        for name, blob in blobs.items():
            zf.writestr(name, blob)


# ---------------- load ----------------


class OfflineArtifact:
    """enhance(noisy [B, L]) -> enhanced [B, L], fixed exported shapes."""

    kind = "offline"

    def __init__(self, graph, meta: dict):
        self._graph = graph
        self.meta = meta

    @property
    def input_shape(self):
        return tuple(self._graph.in_avals[0].shape)

    def enhance(self, noisy):
        return self._graph.call(noisy)


class StreamingArtifact:
    """init_state() -> carry; step(carry, hop [B(,M), hop]) -> (out, carry)."""

    kind = "streaming"

    def __init__(self, step, init, meta: dict):
        self._step = step
        self._init = init
        self.meta = meta

    @property
    def hop_shape(self):
        return tuple(self._step.in_avals[-1].shape)

    def init_state(self):
        return self._init.call()

    def prime(self, state, samples):
        """Pre-fill the analysis buffer with the utterance's first
        ``n_fft - hop`` samples so step outputs are time-aligned with the
        offline path (mirrors StreamingEnhancer.prime — a pure pytree
        replace, so it needs no exported graph and works on any container).
        """
        import jax.numpy as jnp

        tail = state.input_tail
        samples = jnp.asarray(samples, tail.dtype)
        assert samples.shape == tail.shape, (samples.shape, tail.shape)
        return state._replace(input_tail=samples)

    def step(self, state, hop_samples):
        return self._step.call(state, hop_samples)


def load(path: str):
    """Load a container (or a bare legacy jax.export blob) from disk."""
    from jax import export as jexport

    path = os.path.abspath(os.path.expanduser(path))
    if not zipfile.is_zipfile(path):  # legacy bare blob: offline graph only
        with open(path, "rb") as fh:
            return OfflineArtifact(jexport.deserialize(fh.read()), {})
    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("meta.json").decode("utf-8"))
        if meta.get("format") != FORMAT:
            raise ValueError(f"not a {FORMAT} container: {path} ({meta.get('format')!r})")
        kind = meta.get("kind")  # .get: malformed containers fall through to
        if kind == "offline":    # the ValueError below, not a KeyError
            return OfflineArtifact(jexport.deserialize(zf.read("graph.bin")), meta)
        if kind == "streaming":
            return StreamingArtifact(
                jexport.deserialize(zf.read("step.bin")),
                jexport.deserialize(zf.read("init.bin")),
                meta,
            )
    raise ValueError(f"unknown artifact kind {kind!r} in {path}")
