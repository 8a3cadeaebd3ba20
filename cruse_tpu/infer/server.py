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
    def __init__(self, model, variables, cfg: StftConfig, max_streams: int = 64,
                 mesh=None):
        """With `mesh`, the stream slots shard over the mesh's data axes:
        N chips each carry max_streams/N sessions' state and the one jitted
        step advances them all SPMD (pod-scale concurrent serving; the
        per-slot session API is unchanged)."""
        self.enhancer = StreamingEnhancer(model, variables, cfg)
        self.mesh = mesh
        if mesh is not None:
            n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                                 if a != "model"]))
            assert max_streams % n_dev == 0, (
                f"max_streams={max_streams} must divide over the mesh's "
                f"{n_dev} data-axis devices")
        self.max_streams = max_streams
        self.hop = cfg.hop_length
        # multi-mic sessions buffer [M, samples] and emit the reference mic
        self._mics = (model.config.num_mics if self.enhancer._is_mc else 0)
        self._state = self._place(self.enhancer.init_state(max_streams))
        self._fresh = self.enhancer.init_state(1)  # template for slot resets
        self._active = np.zeros(max_streams, bool)
        self._buffers: Dict[int, np.ndarray] = {}
        self._step = jax.jit(self._step_impl)

    def _place(self, tree):
        """Shard a slot-major pytree over the mesh (identity without one)."""
        if self.mesh is None:
            return tree
        from cruse_tpu.parallel.mesh import shard_batch

        return shard_batch(self.mesh, tree)

    # ---- session management ----

    def open(self) -> int:
        free = np.flatnonzero(~self._active)
        if len(free) == 0:
            raise RuntimeError(f"all {self.max_streams} stream slots busy")
        sid = int(free[0])
        self._active[sid] = True
        self._buffers[sid] = np.zeros(
            (self._mics, 0) if self._mics else 0, np.float32)
        # reset the slot's state to fresh (re-placed so the slot axis keeps
        # its mesh sharding after the scatter). A leaf's leading dim may be
        # slots*rep (FullSubNet's folded sub-band units): the fresh template
        # (batch=1) then has leading dim rep, and the slot owns rows
        # [sid*rep, (sid+1)*rep).
        def reset_slot(full, fresh):
            rep = full.shape[0] // self.max_streams
            return jax.lax.dynamic_update_slice_in_dim(
                full, fresh.astype(full.dtype), sid * rep, axis=0
            )

        self._state = self._place(jax.tree_util.tree_map(
            reset_slot, self._state, self._fresh
        ))
        return sid

    def close(self, sid: int) -> None:
        self._active[sid] = False
        self._buffers.pop(sid, None)

    def drain(self, sid: int) -> np.ndarray:
        """Flush a session's remaining buffered input: zero-pad the final
        partial hop, run the needed steps, and return the enhanced samples
        for exactly the input that was still buffered (so feed+drain yields
        output the same length as the input, modulo the stream's inherent
        one-frame assembly delay). The session stays open."""
        assert self._active[sid], f"stream {sid} is not open"
        pending = self._buffers[sid].shape[-1]
        if pending == 0:
            return np.zeros(0, np.float32)
        pad = (-pending) % self.hop
        if pad:
            self.feed(sid, np.zeros(
                (self._mics, pad) if self._mics else pad, np.float32))
        outs = []
        while self.ready(sid):
            res = self.step(only=(sid,))  # other sessions' hops stay queued
            outs.append(res[sid])
        return np.concatenate(outs)[:pending]

    def feed(self, sid: int, samples: np.ndarray) -> None:
        assert self._active[sid], f"stream {sid} is not open"
        samples = np.asarray(samples, np.float32)
        if self._mics:
            assert samples.ndim == 2 and samples.shape[0] == self._mics, (
                f"multi-mic stream expects [M={self._mics}, k] samples, "
                f"got {samples.shape}")
        else:
            samples = samples.ravel()
        self._buffers[sid] = np.concatenate(
            [self._buffers[sid], samples], axis=-1
        )

    def ready(self, sid: int) -> bool:
        return self._active[sid] and self._buffers[sid].shape[-1] >= self.hop

    # ---- the batched device step ----

    def _step_impl(self, state, hops, active):
        out, new_state = self.enhancer._step_impl(state, hops)

        # idle slots keep their (fresh) state so a later `open` starts clean.
        # State leaves are slot-major but may carry a per-slot factor in the
        # leading dim (FullSubNet folds its F sub-band units into it:
        # [slots*F, hidden]), so the mask expands by that factor.
        def keep(n, o):
            rep = n.shape[0] // self.max_streams
            a = jnp.repeat(active, rep) if rep > 1 else active
            return jnp.where(a.reshape((-1,) + (1,) * (n.ndim - 1)), n, o)

        new_state = jax.tree_util.tree_map(keep, new_state, state)
        return out, new_state

    def step(self, only=None) -> Dict[int, np.ndarray]:
        """One hop for every session with >= hop buffered samples. Returns
        {sid: enhanced hop}. Sessions without enough input are skipped (their
        slots process zeros but neither consume input nor advance state).
        `only` restricts the step to a subset of session ids (used by
        `drain` so flushing one session leaves the others' queues alone)."""
        hop_shape = ((self.max_streams, self._mics, self.hop)
                     if self._mics else (self.max_streams, self.hop))
        hops = np.zeros(hop_shape, np.float32)
        stepped: List[int] = []
        for sid, buf in self._buffers.items():
            if only is not None and sid not in only:
                continue
            if buf.shape[-1] >= self.hop:
                hops[sid] = buf[..., : self.hop]
                self._buffers[sid] = buf[..., self.hop :]
                stepped.append(sid)
        if not stepped:
            return {}
        active = np.zeros(self.max_streams, bool)
        active[stepped] = True
        out, self._state = self._step(
            self._state, self._place(jnp.asarray(hops)), self._place(jnp.asarray(active))
        )
        out_np = np.asarray(out)
        return {sid: out_np[sid] for sid in stepped}

    def ready_sessions(self) -> List[int]:
        """Session ids with at least one full hop buffered."""
        return [sid for sid, buf in self._buffers.items()
                if buf.shape[-1] >= self.hop]

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


class MultiModelServer:
    """Serve several enhancement models concurrently with priority-aware
    dispatch.

    Each registered model owns a StreamingServer pool (one compiled batched
    per-hop program); a session is opened against a model name and carries a
    priority. `step()` dispatches the pools that have ready work in urgency
    order -- most-urgent ready session first, ties broken least-recently-
    served -- and `max_dispatches` bounds how many compiled programs run per
    call, so under load the high-priority sessions keep their hop cadence
    while best-effort sessions absorb the backlog. (The reference's
    inferencer is offline batch with a single model,
    base_inferencer.py:164-196; per-session model selection and priority
    dispatch are serving-layer features the TPU rebuild adds.)
    """

    def __init__(self):
        self._pools: Dict[str, StreamingServer] = {}
        self._priority: Dict[tuple, int] = {}  # (model_name, sid) -> priority
        self._last_served: Dict[str, int] = {}
        self._clock = 0

    def add_model(self, name: str, model, variables, cfg: StftConfig,
                  max_streams: int = 16, mesh=None) -> None:
        assert name not in self._pools, f"model {name!r} already registered"
        self._pools[name] = StreamingServer(model, variables, cfg, max_streams,
                                            mesh=mesh)
        self._last_served[name] = 0

    @property
    def models(self) -> List[str]:
        return list(self._pools)

    def open(self, model_name: str, priority: int = 0):
        """Claim a session slot on `model_name`'s pool. Higher priority is
        served first when dispatches are rationed. Returns an opaque handle."""
        sid = self._pools[model_name].open()
        handle = (model_name, sid)
        self._priority[handle] = priority
        return handle

    def close(self, handle) -> None:
        name, sid = handle
        self._pools[name].close(sid)
        self._priority.pop(handle, None)

    def feed(self, handle, samples: np.ndarray) -> None:
        name, sid = handle
        self._pools[name].feed(sid, samples)

    def ready(self, handle) -> bool:
        name, sid = handle
        return self._pools[name].ready(sid)

    def drain(self, handle) -> np.ndarray:
        name, sid = handle
        return self._pools[name].drain(sid)

    def _urgency(self, name: str):
        ready = self._pools[name].ready_sessions()
        if not ready:
            return None
        return max(self._priority.get((name, sid), 0) for sid in ready)

    def step(self, max_dispatches: Optional[int] = None) -> Dict[tuple, np.ndarray]:
        """Run the batched hop for up to `max_dispatches` pools with ready
        sessions (all of them when None), most urgent first. Returns
        {handle: enhanced hop} across every pool stepped this call."""
        self._clock += 1
        ranked = sorted(
            ((u, name) for name in self._pools
             if (u := self._urgency(name)) is not None),
            key=lambda t: (-t[0], self._last_served[t[1]]),
        )
        if max_dispatches is not None:
            ranked = ranked[:max_dispatches]
        out: Dict[tuple, np.ndarray] = {}
        for _, name in ranked:
            self._last_served[name] = self._clock
            for sid, hop in self._pools[name].step().items():
                out[(name, sid)] = hop
        return out
