"""Concurrent-stream serving harness: many live sessions, one device step.

Production streaming enhancement is throughput-bound by how many concurrent
streams share the chip (bench: 256 streams sustain ~62k-80k x realtime
aggregate while a single stream is latency-bound). This server multiplexes
up to ``max_streams`` independent sessions into ONE jitted per-hop step:

- fixed slot layout (static shapes: the step compiles once)
- `open()` claims a slot and resets its state; `close()` frees it
- `feed(sid, samples)` buffers arbitrary-sized input per session
- `step()` runs one hop for ALL slots (idle slots process zeros and their
  state writes are masked off), returning the per-session enhanced hops

The reference has no serving layer at all (its inferencer is offline batch,
base_inferencer.py:164-196); this is the TPU-native one built on the same
StreamingEnhancer per-hop program.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig
from cruse_tpu.infer.streaming import StreamingEnhancer


class StreamingServer:
    def __init__(self, model, variables, cfg: StftConfig, max_streams: int = 64):
        self.enhancer = StreamingEnhancer(model, variables, cfg)
        self.max_streams = max_streams
        self.hop = cfg.hop_length
        self._state = self.enhancer.init_state(max_streams)
        self._fresh = self.enhancer.init_state(1)  # template for slot resets
        self._active = np.zeros(max_streams, bool)
        self._buffers: Dict[int, np.ndarray] = {}
        self._step = jax.jit(self._step_impl)

    # ---- session management ----

    def open(self) -> int:
        free = np.flatnonzero(~self._active)
        if len(free) == 0:
            raise RuntimeError(f"all {self.max_streams} stream slots busy")
        sid = int(free[0])
        self._active[sid] = True
        self._buffers[sid] = np.zeros(0, np.float32)
        # reset the slot's state to fresh
        self._state = jax.tree_util.tree_map(
            lambda full, fresh: full.at[sid].set(fresh[0]), self._state, self._fresh
        )
        return sid

    def close(self, sid: int) -> None:
        self._active[sid] = False
        self._buffers.pop(sid, None)

    def feed(self, sid: int, samples: np.ndarray) -> None:
        assert self._active[sid], f"stream {sid} is not open"
        self._buffers[sid] = np.concatenate(
            [self._buffers[sid], np.asarray(samples, np.float32).ravel()]
        )

    def ready(self, sid: int) -> bool:
        return self._active[sid] and len(self._buffers[sid]) >= self.hop

    # ---- the batched device step ----

    def _step_impl(self, state, hops, active):
        out, new_state = self.enhancer._step_impl(state, hops)
        # idle slots keep their (fresh) state so a later `open` starts clean
        keep = lambda n, o: jnp.where(
            active.reshape((-1,) + (1,) * (n.ndim - 1)), n, o
        )
        new_state = jax.tree_util.tree_map(keep, new_state, state)
        return out, new_state

    def step(self) -> Dict[int, np.ndarray]:
        """One hop for every session with >= hop buffered samples. Returns
        {sid: enhanced hop}. Sessions without enough input are skipped (their
        slots process zeros but neither consume input nor advance state)."""
        hops = np.zeros((self.max_streams, self.hop), np.float32)
        stepped: List[int] = []
        for sid, buf in self._buffers.items():
            if len(buf) >= self.hop:
                hops[sid] = buf[: self.hop]
                self._buffers[sid] = buf[self.hop :]
                stepped.append(sid)
        if not stepped:
            return {}
        active = np.zeros(self.max_streams, bool)
        active[stepped] = True
        out, self._state = self._step(self._state, jnp.asarray(hops), jnp.asarray(active))
        out_np = np.asarray(out)
        return {sid: out_np[sid] for sid in stepped}

    def run_session(self, wav: np.ndarray, sid: Optional[int] = None) -> np.ndarray:
        """Convenience: push one utterance through a (new) session and return
        everything enhanced so far. Other sessions keep running unaffected."""
        own = sid is None
        if own:
            sid = self.open()
        self.feed(sid, wav)
        outs = []
        while self.ready(sid):
            res = self.step()
            if sid in res:
                outs.append(res[sid])
        if own:
            self.close(sid)
        return np.concatenate(outs) if outs else np.zeros(0, np.float32)
