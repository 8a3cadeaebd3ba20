"""Batch inferencer: enhancement strategies + RTF measurement + wav output.

Mirror of BaseInferencer (train_base/inferencer/base_inferencer.py:23-196):
config-driven model/checkpoint load, per-utterance enhancement via a named
strategy method, range warning, int16 scaling at 0.8 FS, RTF logging, wav
writing. Strategies cover the reference's `multi_channel_mag_to_mag` plus
single-channel magnitude-mask and cIRM paths.
"""
from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft, istft, istft_mag_phase, mc_stft
from cruse_tpu.dsp.mask import (
    decompress_cirm,
    complex_mul,
    envelope_postfilter,
    postfilter_sin,
)
from cruse_tpu.data.wavio import write_wav, to_int16_scaled
from cruse_tpu.nn.quantize import dequantize_tree
from cruse_tpu.utils.logger import log


@dataclasses.dataclass
class InferencerConfig:
    type: str = "mag_to_mag"  # strategy method name
    sr: int = 16000
    stft: StftConfig = StftConfig(n_fft=320, hop_length=160)
    output_dir: str = "enhanced"
    reference_channel: int = 0
    # optional mask post-filter on magnitude-mask strategies ("sin" |
    # "envelope", dsp/mask.py; the reference applied these in its listening
    # experiments, utils/utils.py:345-362, but never exposed them)
    postfilter: Optional[str] = None


class BatchInferencer:
    """Enhance an iterable of (noisy, name) pairs with a trained model.

    With `mesh` (a jax.sharding Mesh), `run_batched` shards each utterance
    batch over the mesh's data axes: multi-chip SPMD enhancement from the
    same strategies. The reference enhances strictly one utterance per
    forward on one device (base_inferencer.py:171-190)."""

    def __init__(self, model, variables, config: InferencerConfig, mesh=None):
        self.model = model
        self.variables = variables
        self.cfg = config
        self.mesh = mesh
        assert hasattr(self, config.type), f"Not implemented Inferencer type: {config.type}"
        self._strategy = jax.jit(getattr(self, config.type))
        self.enhanced_dir = Path(config.output_dir).expanduser().absolute()
        self.enhanced_dir.mkdir(parents=True, exist_ok=True)
        self.rtf_history: list[float] = []

    # ---- strategies (each: [B(, C), L] noisy -> [B, L] enhanced) ----

    def auto(self, noisy: jax.Array) -> jax.Array:
        """Model-agnostic strategy: route through the same forward adapter
        the trainer uses (works for mask, deep-filter, and complex models)."""
        variables = dequantize_tree(self.variables)
        from cruse_tpu.train.step import forward_for_model

        spec = stft(noisy, self.cfg.stft)
        ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        enhanced_ri, _ = forward_for_model(self.model)(
            variables["params"], variables.get("batch_stats", {}), ri, train=False
        )
        return istft((enhanced_ri[..., 0], enhanced_ri[..., 1]), self.cfg.stft,
                     length=noisy.shape[-1])

    def _postfilter(self, mask: jax.Array) -> jax.Array:
        if self.cfg.postfilter is None:
            return mask
        if self.cfg.postfilter == "sin":
            return postfilter_sin(mask)
        if self.cfg.postfilter == "envelope":
            return envelope_postfilter(mask)
        raise ValueError(f"unknown postfilter {self.cfg.postfilter!r}")

    def mag_to_mag(self, noisy: jax.Array) -> jax.Array:
        """Magnitude in, masked magnitude out, noisy phase reconstruction."""
        variables = dequantize_tree(self.variables)
        spec = stft(noisy, self.cfg.stft)
        feat = self.model.compress(jnp.abs(spec))
        mask, _ = self.model.apply(variables, feat)
        mag = jnp.abs(spec) * self._postfilter(mask)
        phase = jnp.angle(spec)
        return istft_mag_phase(mag, phase, self.cfg.stft, length=noisy.shape[-1])

    def complex_mask(self, noisy: jax.Array) -> jax.Array:
        """Model emits a compressed cIRM [B, T, F, 2]; decompress and apply."""
        variables = dequantize_tree(self.variables)
        spec = stft(noisy, self.cfg.stft)
        feat = self.model.compress(jnp.abs(spec))
        crm, _ = self.model.apply(variables, feat)
        crm = decompress_cirm(crm)
        r, i = complex_mul(jnp.real(spec), jnp.imag(spec), crm[..., 0], crm[..., 1])
        return istft((r, i), self.cfg.stft, length=noisy.shape[-1])

    def multi_channel_directional(self, noisy: jax.Array) -> jax.Array:
        """[B, M, L]: LPS+IPD directional features -> McCruseNet mask on the
        reference channel (the MC model the reference implies but never
        shipped; feature math = feature.py:423-611)."""
        variables = dequantize_tree(self.variables)
        from cruse_tpu.dsp.features import directional_features_from_ri

        cfg = self.model.config
        specs = mc_stft(noisy, self.cfg.stft)  # [B, M, T, F]
        ri = jnp.stack([jnp.real(specs), jnp.imag(specs)], axis=-1)
        feats = directional_features_from_ri(
            ri, cfg.mic_pairs, cfg.reference_channel, cfg.use_sin_ipd
        )
        mask, _ = self.model.apply(variables, feats)
        ref = specs[:, cfg.reference_channel]
        return istft(ref * self._postfilter(mask), self.cfg.stft, length=noisy.shape[-1])

    def multi_channel_mag_to_mag(self, noisy: jax.Array) -> jax.Array:
        """[B, C, L]: model sees all channel mags, output uses the reference
        channel's phase (base_inferencer.py:139-161)."""
        variables = dequantize_tree(self.variables)
        specs = mc_stft(noisy, self.cfg.stft)  # [B, C, T, F]
        mags = jnp.abs(specs)
        enhanced_mag, _ = self.model.apply(variables, self.model.compress(mags))
        ref = specs[:, self.cfg.reference_channel]
        phase = jnp.angle(ref)
        return istft_mag_phase(enhanced_mag, phase, self.cfg.stft, length=noisy.shape[-1])

    def enhance_long(self, noisy: jax.Array, chunk_seconds: float = 30.0) -> jax.Array:
        """Memory-bounded enhancement of arbitrarily long audio: process 50%-
        overlapping chunks with the batch strategy and stitch with averaged
        overlap (the reference's `overlap_cat` chunking, feature.py:172-191).

        noisy: [B, L]. Causal models give identical interiors per chunk; the
        averaged overlap suppresses boundary transients. With a mesh, the
        chunks themselves become the sharded batch dimension — one SPMD
        dispatch enhances the whole recording across the chips (time-axis
        parallelism via the 50% overlap instead of halo exchange).
        """
        from cruse_tpu.dsp.features import overlap_cat

        sr = self.cfg.sr
        chunk = int(chunk_seconds * sr)
        chunk -= chunk % (2 * self.cfg.stft.hop_length)  # even + hop-aligned
        length = noisy.shape[-1]
        if length <= chunk:
            return self._strategy(noisy)
        hop = chunk // 2
        # zero-pad so chunks tile exactly at 50% overlap (overlap_cat's contract)
        num_hops = -(-(length - chunk) // hop)  # ceil
        padded_len = num_hops * hop + chunk
        noisy = jnp.pad(noisy, ((0, 0), (0, padded_len - length)))
        starts = [i * hop for i in range(num_hops + 1)]
        if self.mesh is not None:
            from cruse_tpu.parallel.mesh import shard_batch

            n_dev = int(
                np.prod([self.mesh.shape[a] for a in self.mesh.axis_names if a != "model"])
            )
            b = noisy.shape[0]
            # [n_starts, B, chunk] -> flatten to the sharded batch dim,
            # padded to a device multiple (extra rows repeat chunk 0)
            tiles = jnp.stack(
                [jax.lax.dynamic_slice_in_dim(noisy, s, chunk, axis=-1) for s in starts]
            )
            n = len(starts) * b
            pad_rows = (-n) % n_dev
            flat = tiles.reshape(n, *tiles.shape[2:])
            if pad_rows:
                # modular indexing: pad_rows can exceed n (short recording on
                # a wide mesh), so cycle the real rows rather than slice
                flat = jnp.concatenate([flat, flat[jnp.arange(pad_rows) % n]])
            out = self._strategy(shard_batch(self.mesh, flat))[:n]
            outs = [out[i * b : (i + 1) * b] for i in range(len(starts))]
        else:
            outs = [
                self._strategy(jax.lax.dynamic_slice_in_dim(noisy, s, chunk, axis=-1))
                for s in starts
            ]
        stitched = overlap_cat(outs)
        return stitched[..., :length]

    # ---- drivers ----

    def run_batched(
        self,
        wavs: list,
        names: list,
        batch_size: Optional[int] = None,
        write: bool = True,
    ) -> list:
        """Throughput-mode corpus enhancement: pad utterances to one
        hop-aligned length, stack into fixed-size batches, and (when a mesh
        was given) shard each batch over the mesh's data axes so N chips
        enhance N slices of the batch in one SPMD dispatch.

        wavs: list of [L] (or [C, L] for multi-channel strategies) float
        arrays; outputs are trimmed back to each utterance's true length.
        Returns the same (name, enhanced int16, rtf) tuples as __call__,
        where rtf is the batch's wall time over its summed audio seconds.
        """
        assert len(wavs) == len(names) and wavs, "empty corpus"
        n_dev = 1
        if self.mesh is not None:
            n_dev = int(
                np.prod([self.mesh.shape[a] for a in self.mesh.axis_names if a != "model"])
            )
        if batch_size is None:
            batch_size = max(n_dev, min(len(wavs), 8))
        batch_size = -(-batch_size // n_dev) * n_dev  # multiple of the data axes
        hop = self.cfg.stft.hop_length
        lengths = [w.shape[-1] for w in wavs]
        padded_len = -(-max(lengths) // hop) * hop
        stacked = np.stack(
            [np.pad(np.asarray(w, np.float32),
                    [(0, 0)] * (w.ndim - 1) + [(0, padded_len - w.shape[-1])])
             for w in wavs]
        )
        results = []
        for start in range(0, len(wavs), batch_size):
            chunk = stacked[start : start + batch_size]
            real = chunk.shape[0]
            if real < batch_size:  # ragged tail: repeat the last row, trim after
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], batch_size - real, axis=0)]
                )
            noisy = jnp.asarray(chunk)
            if self.mesh is not None:
                from cruse_tpu.parallel.mesh import shard_batch

                noisy = shard_batch(self.mesh, noisy)
            t1 = time.time()
            enhanced = np.asarray(self._strategy(noisy))
            t2 = time.time()
            secs = sum(lengths[start : start + real]) / self.cfg.sr
            rtf = (t2 - t1) / secs
            self.rtf_history.append(rtf)
            log(f"batch [{start}:{start + real}] x{padded_len / self.cfg.sr:.1f}s, "
                f"rtf: {rtf}")
            for i in range(real):
                name = names[start + i]
                out = enhanced[i, : lengths[start + i]]
                if (np.abs(out) > 1).any():
                    log(f"Warning: enhanced is not in the range [-1, 1], {name}")
                scaled = to_int16_scaled(out)
                if write:
                    write_wav(str(self.enhanced_dir / f"{name}.wav"), scaled, self.cfg.sr)
                results.append((name, scaled, rtf))
        return results

    def __call__(self, dataloader: Iterable, write: bool = True) -> list:
        """dataloader yields dicts {"noisy": [1(, C), L], "name": [str]}.
        Returns list of (name, enhanced np.int16, rtf)."""
        results = []
        for batch in dataloader:
            noisy = jnp.asarray(batch["noisy"])
            name = batch["name"][0] if isinstance(batch.get("name"), (list, tuple)) else batch.get("name", "utt")
            t1 = time.time()
            enhanced = np.asarray(self._strategy(noisy))
            t2 = time.time()
            enhanced = enhanced[0]
            if (np.abs(enhanced) > 1).any():
                log(f"Warning: enhanced is not in the range [-1, 1], {name}")
            scaled = to_int16_scaled(enhanced)
            rtf = (t2 - t1) / (len(enhanced) / self.cfg.sr)
            self.rtf_history.append(rtf)
            log(f"{name}, rtf: {rtf}")
            if write:
                write_wav(str(self.enhanced_dir / f"{name}.wav"), scaled, self.cfg.sr)
            results.append((name, scaled, rtf))
        return results
