"""Synthetic-mixing dataset: host-side selection/crop, device-side mixing.

Equivalent of the reference `SynDataset` (dataset/dataset.py:49-264, with the
truncated `__getitem__`/`snr_mix` tail restored -- SURVEY.md §2.9 item 5).
The host side concatenates randomly-chosen files with silence gaps to the
target length and crops (numpy, runs in the input pipeline); the actual
mixing runs on device via `cruse_tpu.data.mixer.mix_batch`.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.data.manifest import load_manifest, offset_and_limit, parse_snr_range
from cruse_tpu.data.mixer import MixerConfig, mix_batch
from cruse_tpu.data.wavio import read_wav


@dataclasses.dataclass
class SynMixConfig:
    clean_manifest: str = ""
    noise_manifest: str = ""
    rir_manifest: str = ""
    rir_noise_manifest: str = ""
    clean_offset: int = 0
    clean_limit: Optional[int] = None
    noise_offset: int = 0
    noise_limit: Optional[int] = None
    rir_offset: int = 0
    rir_limit: Optional[int] = None
    snr_range: tuple = (-5, 20)
    reverb_proportion: float = 0.0
    reverb_noise_proportion: float = 0.0
    silence_length: float = 0.2  # seconds between concatenated clips
    target_db_fs: float = -25.0
    target_db_fs_floating: float = 10.0
    sub_sample_seconds: float = 3.0
    sr: int = 16000
    dataset_length: Optional[int] = None
    batch_size: int = 32
    rir_max_seconds: float = 0.5  # static RIR pad length for device batching
    eq_proportion: float = 0.0
    num_mics: int = 1  # >1: multi-channel batches (noisy [B, M, L]) via the
    # free-field delay simulator (mixer.mix_batch_mc) for MC models
    mc_max_delay: float = 8.0
    # image-source room simulation for the MC path (mixer.mix_batch_mc_room):
    # per-example random shoebox, speech + noise as separate in-room sources,
    # real IPD structure; free-field stays the fast default
    mc_room: bool = False
    # MEASURED array RIRs for the MC path (mixer.mix_batch_mc_rir): manifests
    # of multichannel wavs ([num_mics, R] each; extra channels are dropped).
    # Speech and noise draw independent entries (two source positions seen by
    # the same array). Takes precedence over mc_room; noise manifest defaults
    # to the speech one.
    mc_rir_manifest: str = ""
    mc_rir_noise_manifest: str = ""
    mc_room_t60: tuple = (0.2, 0.6)
    mc_room_max_order: int = 1
    mc_mic_spacing: float = 0.05
    # array geometry for the room path: "linear" (x-axis, mc_mic_spacing),
    # "circular" (mc_array_radius, xy-plane), or "custom" (mc_mic_positions
    # = [[x, y, z], ...] offsets from the array center in meters)
    mc_array_geometry: str = "linear"
    mc_array_radius: float = 0.05
    mc_mic_positions: tuple = ()
    seed: int = 0
    valid_mode: bool = False
    use_native_io: bool = True  # threaded C++ decode/resample/crop when built
    native_threads: int = 8


class SynMixDataset:
    """Iterable over device-ready batches {"noisy", "clean"} (+ names in
    valid mode)."""

    def __init__(self, config: SynMixConfig):
        self.cfg = config
        c = config
        self.clean_list = offset_and_limit(load_manifest(c.clean_manifest), c.clean_offset, c.clean_limit)
        self.noise_list = offset_and_limit(load_manifest(c.noise_manifest), c.noise_offset, c.noise_limit)
        self.rir_list = (
            offset_and_limit(load_manifest(c.rir_manifest), c.rir_offset, c.rir_limit)
            if c.rir_manifest
            else []
        )
        self.rir_noise_list = load_manifest(c.rir_noise_manifest) if c.rir_noise_manifest else []
        assert self.clean_list, "empty clean manifest"
        assert self.noise_list, "empty noise manifest"
        parse_snr_range(c.snr_range)  # validates [low, high]; the device
        # mixer draws uniformly over the same integer range (mixer.py)
        self.length = int(c.dataset_length) if c.dataset_length else len(self.clean_list)
        self._epoch = 0  # advances the default mixing key across epochs
        self._rir_cache: dict = {}  # path -> decoded [M, rir_len] (read-only)
        self._rir_cache_bytes = 0  # byte-budgeted (see _select_rir_mc)
        self.rng = np.random.default_rng(c.seed)
        self.sub_len = int(c.sub_sample_seconds * c.sr)
        self.rir_len = int(c.rir_max_seconds * c.sr)
        self.mixer_cfg = MixerConfig(
            sr=c.sr,
            snr_range=tuple(c.snr_range),
            target_db_fs=c.target_db_fs,
            target_db_fs_floating=c.target_db_fs_floating,
            reverb_proportion=c.reverb_proportion,
            reverb_noise_proportion=c.reverb_noise_proportion,
            eq_proportion=c.eq_proportion,
        )
        self.mc_rir_list = (
            load_manifest(c.mc_rir_manifest) if c.mc_rir_manifest else []
        )
        self.mc_rir_noise_list = (
            load_manifest(c.mc_rir_noise_manifest)
            if c.mc_rir_noise_manifest
            else self.mc_rir_list
        )
        self._mc_measured = bool(self.mc_rir_list) and c.num_mics > 1
        self._build_mixers()

    def set_snr_range(self, snr_range) -> None:
        """Point-in-training SNR override (curriculum learning: start easy,
        anneal toward the full range). Rebuilds the jitted mix closures --
        they bake ``mixer_cfg`` at trace time, so mutating it in place would
        silently keep serving the stale compiled range."""
        parse_snr_range(snr_range)
        if tuple(snr_range) == self.mixer_cfg.snr_range:
            return
        self.mixer_cfg = dataclasses.replace(
            self.mixer_cfg, snr_range=tuple(snr_range))
        self._build_mixers()

    def _build_mixers(self) -> None:
        c = self.cfg
        if c.num_mics > 1:
            if self._mc_measured:
                from cruse_tpu.data.mixer import mix_batch_mc_rir

                self._mc_mix = jax.jit(
                    lambda k, cl, n, rc, rn: mix_batch_mc_rir(
                        k, cl, n, self.mixer_cfg, rc, rn
                    )
                )
            elif c.mc_room:
                from cruse_tpu.data.mixer import RoomConfig, mix_batch_mc_room

                room = RoomConfig(sr=c.sr, t60=tuple(c.mc_room_t60),
                                  max_order=int(c.mc_room_max_order),
                                  mic_spacing=c.mc_mic_spacing,
                                  array_geometry=c.mc_array_geometry,
                                  array_radius=c.mc_array_radius,
                                  mic_positions=tuple(
                                      tuple(p) for p in c.mc_mic_positions))
                self._mc_mix = jax.jit(
                    lambda k, cl, n: mix_batch_mc_room(k, cl, n, self.mixer_cfg,
                                                       room, c.num_mics)
                )
            else:
                from cruse_tpu.data.mixer import mix_batch_mc

                self._mc_mix = jax.jit(
                    lambda k, cl, n: mix_batch_mc(k, cl, n, self.mixer_cfg,
                                                  c.num_mics, c.mc_max_delay)
                )
        # one jitted mix closure per (rir, rir_noise) presence combination
        self._mix_fns = {
            (False, False): jax.jit(lambda k, c, n: mix_batch(k, c, n, self.mixer_cfg)),
            (True, False): jax.jit(lambda k, c, n, r: mix_batch(k, c, n, self.mixer_cfg, r)),
            (False, True): jax.jit(
                lambda k, c, n, rn: mix_batch(k, c, n, self.mixer_cfg, None, rn)
            ),
            (True, True): jax.jit(
                lambda k, c, n, r, rn: mix_batch(k, c, n, self.mixer_cfg, r, rn)
            ),
        }

    def __len__(self):
        return self.length

    # ---- host-side selection (dataset.py:147-213 behavior) ----

    def _select_concat(self, file_list: List[str], target_length: int, start=None) -> np.ndarray:
        """Concatenate random files with silence gaps to >= target_length,
        then random-crop to target_length."""
        silence = np.zeros(int(self.cfg.sr * self.cfg.silence_length), np.float32)
        pieces = [] if start is None else [start]
        total = 0 if start is None else len(start)
        while total < target_length:
            f = file_list[self.rng.integers(len(file_list))]
            wav, _ = read_wav(f, sr=self.cfg.sr)
            if wav.ndim == 2:
                wav = wav[self.rng.integers(wav.shape[0])]
            pieces.append(wav)
            total += len(wav)
            if total < target_length:
                gap = silence[: min(len(silence), target_length - total)]
                pieces.append(gap)
                total += len(gap)
        y = np.concatenate(pieces)
        if len(y) > target_length:
            idx = self.rng.integers(len(y) - target_length + 1)
            y = y[idx : idx + target_length]
        return y.astype(np.float32)

    def _select_rir(self, rir_list: List[str]) -> np.ndarray:
        """Pad/crop a random RIR to the static device length; zeros = none."""
        rir = np.zeros(self.rir_len, np.float32)
        if rir_list:
            wav, _ = read_wav(rir_list[self.rng.integers(len(rir_list))], sr=self.cfg.sr)
            if wav.ndim == 2:
                wav = wav[0]
            n = min(len(wav), self.rir_len)
            rir[:n] = wav[:n]
        return rir

    def _select_rir_mc(self, rir_list: List[str]) -> np.ndarray:
        """A random measured array RIR, padded/cropped to the static device
        shape [num_mics, rir_len]. The file must carry at least num_mics
        channels; extra channels are dropped.

        Decoded RIRs are cached per path: the corpus is small and immutable
        and every batch draws 2*B of them, so re-reading + resampling from
        disk each step would serialize real host work into the batch loop."""
        path = rir_list[self.rng.integers(len(rir_list))]
        cached = self._rir_cache.get(path)
        if cached is not None:
            return cached
        m = self.cfg.num_mics
        out = np.zeros((m, self.rir_len), np.float32)
        wav, _ = read_wav(path, sr=self.cfg.sr, mono=False)
        if wav.ndim == 1:
            wav = wav[None, :]
        assert wav.shape[0] >= m, (
            f"measured RIR has {wav.shape[0]} channels < num_mics={m}")
        n = min(wav.shape[1], self.rir_len)
        out[:, :n] = wav[:m, :n]
        out.setflags(write=False)
        # cap by BYTES, not entries: entry size scales with mics * rir_len
        # (a 0.5 s 4-mic 16 kHz entry is 4*8000*4 = 128 KB)
        if self._rir_cache_bytes + out.nbytes <= 512 * 1024 * 1024:
            self._rir_cache[path] = out
            self._rir_cache_bytes += out.nbytes
        return out

    def _native_select(self, file_list: List[str], b: int):
        """Fast path: the C++ assembler does the FULL reference selection
        (random files + silence gaps + random crop, dataset.py:147-203) on
        its thread pool; only unreadable-pool rows fall back to python."""
        from cruse_tpu.data import native

        gap_len = int(self.cfg.sr * self.cfg.silence_length)
        batch, ok = native.assemble_batch(
            file_list, b, self.sub_len, gap_len, self.cfg.sr,
            seed=int(self.rng.integers(2**62)), threads=self.cfg.native_threads,
        )
        for i in range(b):
            if not ok[i]:
                batch[i] = self._select_concat(file_list, self.sub_len)
        return batch

    def host_batch(self):
        """Assemble one host-side batch of raw (clean, noise, rir) arrays."""
        b = self.cfg.batch_size
        use_native = False
        if self.cfg.use_native_io:
            try:
                from cruse_tpu.data import native

                use_native = native.available()
            except Exception:
                use_native = False
        if use_native:
            clean = self._native_select(self.clean_list, b)
            noise = self._native_select(self.noise_list, b)
        else:
            clean = np.stack([self._select_concat(self.clean_list, self.sub_len) for _ in range(b)])
            noise = np.stack([self._select_concat(self.noise_list, self.sub_len) for _ in range(b)])
        rir = (
            np.stack([self._select_rir(self.rir_list) for _ in range(b)])
            if self.rir_list and self.cfg.reverb_proportion > 0
            else None
        )
        rir_noise = (
            np.stack([self._select_rir(self.rir_noise_list) for _ in range(b)])
            if self.rir_noise_list and self.cfg.reverb_noise_proportion > 0
            else None
        )
        return clean, noise, rir, rir_noise

    def batches(self, num_batches: Optional[int] = None, key=None) -> Iterator[dict]:
        """Yield jitted-mixed device batches."""
        steps = num_batches if num_batches is not None else max(1, self.length // self.cfg.batch_size)
        if key is None:
            # distinct mixing randomness per epoch (re-)iteration
            key = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed), self._epoch)
            self._epoch += 1
        for i in range(steps):
            key, sub = jax.random.split(key)
            clean, noise, rir, rir_noise = self.host_batch()
            if self.cfg.num_mics > 1:
                if self._mc_measured:
                    b = self.cfg.batch_size
                    rir_c = np.stack(
                        [self._select_rir_mc(self.mc_rir_list) for _ in range(b)])
                    rir_n = np.stack(
                        [self._select_rir_mc(self.mc_rir_noise_list) for _ in range(b)])
                    noisy, target = self._mc_mix(
                        sub, jnp.asarray(clean), jnp.asarray(noise),
                        jnp.asarray(rir_c), jnp.asarray(rir_n))
                else:
                    noisy, target = self._mc_mix(
                        sub, jnp.asarray(clean), jnp.asarray(noise))
                batch = {"noisy": noisy, "clean": target}
                if self.cfg.valid_mode:
                    batch["name"] = [
                        f"synth_{i:05d}_{j:03d}" for j in range(self.cfg.batch_size)
                    ]
                yield batch
                continue
            args = [sub, jnp.asarray(clean), jnp.asarray(noise)]
            if rir is not None:
                args.append(jnp.asarray(rir))
            if rir_noise is not None:
                args.append(jnp.asarray(rir_noise))
            mix = self._mix_fns[(rir is not None, rir_noise is not None)]
            noisy, target = mix(*args)
            batch = {"noisy": noisy, "clean": target}
            if self.cfg.valid_mode:
                batch["name"] = [f"synth_{i:05d}_{j:03d}" for j in range(self.cfg.batch_size)]
            yield batch
