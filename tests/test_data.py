"""Data pipeline: wav IO round trip, mixing invariants, manifests, dataset."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cruse_tpu.data.wavio import read_wav, write_wav, to_int16_scaled
from cruse_tpu.data.manifest import load_manifest, parse_snr_range, offset_and_limit, write_manifest
from cruse_tpu.data.mixer import MixerConfig, mix_single, mix_batch, add_reverb, fft_convolve
from cruse_tpu.data.dataset import SynMixDataset, SynMixConfig


def test_wav_roundtrip(tmp_path, rng):
    y = np.clip(rng.standard_normal(16000) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, y, 16000)
    back, sr = read_wav(p)
    assert sr == 16000
    # write scales by 32767, read divides by 32768 -> ~2 LSB worst case
    np.testing.assert_allclose(back, y, atol=1e-4)


def test_wav_resample(tmp_path, rng):
    y = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    p = str(tmp_path / "b.wav")
    write_wav(p, y, 8000)
    back, sr = read_wav(p, sr=16000)
    assert sr == 16000
    assert abs(len(back) - 16000) <= 2


def test_int16_scaling(rng):
    y = rng.standard_normal(1000).astype(np.float32)
    s = to_int16_scaled(y)
    assert s.dtype == np.int16
    assert np.abs(s).max() <= int(0.8 * 32767) + 1


def test_manifest(tmp_path):
    paths = [f"/x/{i}.wav" for i in range(10)]
    mp = str(tmp_path / "m.txt")
    write_manifest(paths, mp)
    assert load_manifest(mp) == paths
    assert offset_and_limit(paths, 2, 3) == paths[2:5]
    assert parse_snr_range([-5, -3]) == [-5, -4, -3]
    with pytest.raises(AssertionError):
        parse_snr_range([5, 3])


def test_fft_convolve_matches_numpy(rng):
    x = rng.standard_normal(500).astype(np.float32)
    h = rng.standard_normal(64).astype(np.float32)
    ours = np.asarray(fft_convolve(jnp.asarray(x), jnp.asarray(h)))
    ref = np.convolve(x, h)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_add_reverb_early_target(rng):
    sr = 16000
    clean = rng.standard_normal(sr).astype(np.float32)
    rir = np.zeros(3200, np.float32)
    rir[100] = 1.0  # direct path
    rir[2000] = 0.5  # late reflection beyond 50 ms predelay
    reverberant, early = add_reverb(jnp.asarray(clean), jnp.asarray(rir), 50.0, sr)
    # early target excludes the late reflection
    direct_only = np.zeros_like(clean)
    direct_only[100:] = clean[:-100]
    np.testing.assert_allclose(np.asarray(early), direct_only, atol=1e-3)
    assert np.abs(np.asarray(reverberant) - np.asarray(early)).max() > 0.01


def test_mix_single_snr_and_level(rng):
    cfg = MixerConfig(snr_range=(5, 5), target_db_fs=-25.0, target_db_fs_floating=0.0)
    clean = jnp.asarray(rng.standard_normal(16000).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal(16000).astype(np.float32))
    noisy, target = mix_single(jax.random.PRNGKey(0), clean, noise, cfg)
    noisy, target = np.asarray(noisy), np.asarray(target)
    # mixed level == -25 dBFS
    db = 20 * np.log10(np.sqrt(np.mean(noisy**2)))
    assert abs(db - (-25.0)) < 0.5
    # achieved SNR == 5 dB (clean part is `target` scaled)
    noise_part = noisy - target
    snr = 10 * np.log10(np.sum(target**2) / np.sum(noise_part**2))
    assert abs(snr - 5.0) < 0.5
    assert np.abs(noisy).max() <= 0.99 + 1e-5


def test_mix_batch_distinct_examples(rng):
    cfg = MixerConfig(snr_range=(-5, 20))
    clean = jnp.asarray(rng.standard_normal((4, 8000)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((4, 8000)).astype(np.float32))
    noisy, target = jax.jit(lambda k, c, n: mix_batch(k, c, n, cfg))(
        jax.random.PRNGKey(1), clean, noise
    )
    assert noisy.shape == (4, 8000)
    # per-example randomness: SNRs differ across batch
    snrs = []
    for i in range(4):
        noise_part = np.asarray(noisy[i]) - np.asarray(target[i])
        snrs.append(10 * np.log10(np.sum(np.asarray(target[i]) ** 2) / np.sum(noise_part**2)))
    assert np.std(snrs) > 0.5


def _make_corpus(tmp_path, rng, n=4, seconds=1.0, sr=16000):
    paths = []
    for i in range(n):
        y = (rng.standard_normal(int(seconds * sr)) * 0.3).astype(np.float32)
        p = str(tmp_path / f"wav_{i}.wav")
        write_wav(p, y, sr)
        paths.append(p)
    mf = str(tmp_path / "manifest.txt")
    write_manifest(paths, mf)
    return mf


def test_syn_mix_dataset(tmp_path, rng):
    clean_mf = _make_corpus(tmp_path / "clean", rng)
    noise_mf = _make_corpus(tmp_path / "noise", rng)
    ds = SynMixDataset(
        SynMixConfig(
            clean_manifest=clean_mf,
            noise_manifest=noise_mf,
            sub_sample_seconds=2.0,  # forces concat+silence (clips are 1 s)
            batch_size=3,
            dataset_length=6,
        )
    )
    batches = list(ds.batches(num_batches=2))
    assert len(batches) == 2
    for b in batches:
        assert b["noisy"].shape == (3, 32000)
        assert b["clean"].shape == (3, 32000)
        assert np.isfinite(np.asarray(b["noisy"])).all()
    # different batches must differ
    assert np.abs(np.asarray(batches[0]["noisy"]) - np.asarray(batches[1]["noisy"])).max() > 1e-4


def test_epoch_reiteration_uses_fresh_mix_randomness(tmp_path, rng):
    """Re-entering batches() (a new epoch) must not replay the same SNR/
    level/augmentation draws (the device key advances per epoch)."""
    clean_mf = _make_corpus(tmp_path / "c2", rng)
    noise_mf = _make_corpus(tmp_path / "n2", rng)
    ds = SynMixDataset(
        SynMixConfig(clean_manifest=clean_mf, noise_manifest=noise_mf,
                     sub_sample_seconds=1.0, batch_size=2, seed=3)
    )
    e1 = next(iter(ds.batches(num_batches=1)))
    e2 = next(iter(ds.batches(num_batches=1)))
    # host file picks may coincide, but mixing randomness must differ: the
    # achieved output levels (dBFS jitter) will not match across epochs
    l1 = np.sqrt(np.mean(np.asarray(e1["noisy"]) ** 2, axis=1))
    l2 = np.sqrt(np.mean(np.asarray(e2["noisy"]) ** 2, axis=1))
    assert np.abs(l1 - l2).max() > 1e-5


def test_rir_noise_is_applied(tmp_path, rng):
    """reverb_noise_proportion must actually reverberate the noise."""
    from cruse_tpu.data.mixer import MixerConfig, mix_batch
    cfg_on = MixerConfig(snr_range=(5, 5), target_db_fs=-25.0,
                         target_db_fs_floating=0.0, reverb_noise_proportion=1.0)
    cfg_off = MixerConfig(snr_range=(5, 5), target_db_fs=-25.0,
                          target_db_fs_floating=0.0, reverb_noise_proportion=0.0)
    clean = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    rir_noise = np.zeros((2, 1600), np.float32)
    rir_noise[:, 0] = 1.0
    rir_noise[:, 800] = 0.7  # strong echo
    key = jax.random.PRNGKey(0)
    on, _ = mix_batch(key, clean, noise, cfg_on, None, jnp.asarray(rir_noise))
    off, _ = mix_batch(key, clean, noise, cfg_off, None, jnp.asarray(rir_noise))
    assert np.abs(np.asarray(on) - np.asarray(off)).max() > 1e-3


def test_dataset_passes_rir_noise(tmp_path, rng):
    """SynMixDataset wires rir_noise manifests through to the mixer."""
    clean_mf = _make_corpus(tmp_path / "c3", rng)
    noise_mf = _make_corpus(tmp_path / "n3", rng)
    # build echoing RIR wavs
    rirs = []
    for i in range(2):
        r = np.zeros(1600, np.float32)
        r[0] = 1.0
        r[700 + 100 * i] = 0.6
        p = str(tmp_path / f"rirn_{i}.wav")
        write_wav(p, r, 16000)
        rirs.append(p)
    rn_mf = str(tmp_path / "rn.txt")
    write_manifest(rirs, rn_mf)

    common = dict(clean_manifest=clean_mf, noise_manifest=noise_mf,
                  sub_sample_seconds=1.0, batch_size=2, seed=5,
                  rir_noise_manifest=rn_mf)
    ds_on = SynMixDataset(SynMixConfig(**common, reverb_noise_proportion=1.0))
    ds_off = SynMixDataset(SynMixConfig(**common, reverb_noise_proportion=0.0))
    b_on = next(iter(ds_on.batches(num_batches=1)))
    b_off = next(iter(ds_off.batches(num_batches=1)))
    assert np.abs(np.asarray(b_on["noisy"]) - np.asarray(b_off["noisy"])).max() > 1e-4


def test_mc_room_mixer_shapes_and_spatial_structure():
    """Image-source room mixer (mixer.mix_batch_mc_room): shapes, finiteness,
    determinism per key, and real spatial structure -- inter-mic coherence
    below 1 (reverb decorrelates) but well above 0 (shared sources), and the
    target is the early-reflection speech at the reference mic."""
    import jax
    import jax.numpy as jnp

    from cruse_tpu.data.mixer import MixerConfig, RoomConfig, mix_batch_mc_room

    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    clean = jnp.asarray(
        (np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
         ).astype(np.float32)[None].repeat(2, 0))
    noise = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.3)
    cfg = MixerConfig(snr_range=(5, 15))
    room = RoomConfig()
    f = jax.jit(lambda k, c, n: mix_batch_mc_room(k, c, n, cfg, room, 4))
    key = jax.random.PRNGKey(3)
    noisy, target = f(key, clean, noise)
    assert noisy.shape == (2, 4, 16000) and target.shape == (2, 16000)
    assert bool(jnp.isfinite(noisy).all()) and bool(jnp.isfinite(target).all())
    # determinism
    noisy2, target2 = f(key, clean, noise)
    np.testing.assert_allclose(np.asarray(noisy), np.asarray(noisy2), atol=1e-6)
    # different key -> different room
    noisy3, _ = f(jax.random.PRNGKey(4), clean, noise)
    assert not np.allclose(np.asarray(noisy), np.asarray(noisy3), atol=1e-3)
    # spatial structure: mics correlated but not identical
    a = np.asarray(noisy[0, 0]); b = np.asarray(noisy[0, 1])
    rho = np.dot(a - a.mean(), b - b.mean()) / (len(a) * a.std() * b.std())
    assert 0.1 < abs(rho) < 0.999, rho
    # target correlates with the clean source (it's the early speech)
    c0 = np.asarray(clean[0]); tg = np.asarray(target[0])
    xc = np.correlate(tg - tg.mean(), c0 - c0.mean(), "full")
    peak = xc.max() / (len(c0) * tg.std() * c0.std() + 1e-12)
    assert peak > 0.5, peak


def test_syn_dataset_mc_room_batches(tmp_path, rng):
    """SynMixDataset with mc_room=true yields [B, M, L] reverberant batches."""
    from cruse_tpu.data.dataset import SynMixDataset, SynMixConfig

    clean_mf = _make_corpus(tmp_path / "c3", rng)
    noise_mf = _make_corpus(tmp_path / "n3", rng)
    ds = SynMixDataset(SynMixConfig(
        clean_manifest=clean_mf,
        noise_manifest=noise_mf,
        snr_range=(0, 10), sub_sample_seconds=0.5, sr=16000, batch_size=2,
        num_mics=3, mc_room=True, mc_room_t60=(0.2, 0.4),
    ))
    batch = next(iter(ds.batches(num_batches=1)))
    assert batch["noisy"].shape == (2, 3, 8000)
    assert batch["clean"].shape == (2, 8000)
    assert bool(np.isfinite(np.asarray(batch["noisy"])).all())


def test_room_array_geometries():
    """Array geometries: custom positions matching the linear layout
    reproduce the linear output exactly; a circular array differs; the
    direct-path TDOA between two well-separated custom mics stays within
    the physical bound |d|/c."""
    import jax
    import jax.numpy as jnp

    from cruse_tpu.data.mixer import (MixerConfig, RoomConfig, _array_offsets,
                                      mix_single_mc_room)

    rng = np.random.default_rng(1)
    clean = jnp.asarray(rng.standard_normal(8000).astype(np.float32) * 0.1)
    noise = jnp.asarray(rng.standard_normal(8000).astype(np.float32) * 0.1)
    cfg = MixerConfig(snr_range=(20, 25))
    key = jax.random.PRNGKey(7)

    linear = RoomConfig()
    spacing = linear.mic_spacing
    same_as_linear = RoomConfig(
        array_geometry="custom",
        mic_positions=tuple((float((m - 1.5) * spacing), 0.0, 0.0) for m in range(4)),
    )
    circular = RoomConfig(array_geometry="circular", array_radius=0.1)

    out_lin, tgt_lin = mix_single_mc_room(key, clean, noise, cfg, linear, 4)
    out_cus, tgt_cus = mix_single_mc_room(key, clean, noise, cfg, same_as_linear, 4)
    np.testing.assert_allclose(np.asarray(out_lin), np.asarray(out_cus), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tgt_lin), np.asarray(tgt_cus), atol=1e-6)

    out_cir, _ = mix_single_mc_room(key, clean, noise, cfg, circular, 4)
    assert out_cir.shape == (4, 8000)
    assert not np.allclose(np.asarray(out_lin), np.asarray(out_cir), atol=1e-3)
    # circular offsets live on the configured circle
    offs = np.asarray(_array_offsets(6, circular))
    np.testing.assert_allclose(np.linalg.norm(offs[:, :2], axis=-1), 0.1, atol=1e-6)
    assert np.all(offs[:, 2] == 0)

    # physical TDOA bound: mics 0.5 m apart -> |lag| <= 0.5/343*16000 ~ 23.3
    # samples on the direct path (strongest cross-correlation peak)
    wide = RoomConfig(
        array_geometry="custom",
        mic_positions=((0.0, -0.25, 0.0), (0.0, 0.25, 0.0)),
        late_tail=False, t60=(0.2, 0.25),
    )
    out2, _ = mix_single_mc_room(jax.random.PRNGKey(11), clean, noise, cfg, wide, 2)
    a, b = np.asarray(out2[0]), np.asarray(out2[1])
    xc = np.correlate(a, b, "full")
    lag = np.argmax(np.abs(xc)) - (len(a) - 1)
    assert abs(lag) <= 30, lag

    with pytest.raises(AssertionError):
        _array_offsets(3, wide)  # 2 custom positions cannot serve 3 mics
    with pytest.raises(ValueError):
        _array_offsets(2, RoomConfig(array_geometry="spiral"))


def test_mix_single_mc_rir_measured_delays(rng):
    """Measured-RIR MC mixing: pure-delay array RIRs must reproduce the
    clean signal delayed per mic (common scale), and the early target must
    drop reflections beyond predelay_ms."""
    from cruse_tpu.data.mixer import MixerConfig, mix_single_mc_rir

    sr = 16000
    l = 4000
    clean = (rng.standard_normal(l) * 0.3).astype(np.float32)
    silence = np.zeros(l, np.float32)  # noise source off
    delays = [13, 16, 19]
    rir_c = np.zeros((3, 1600), np.float32)
    for m, d in enumerate(delays):
        rir_c[m, d] = 1.0
    # a reflection 60 ms after the direct path on the reference mic --
    # beyond predelay (50 ms), so the early target must exclude it
    rir_c[0, delays[0] + int(0.060 * sr)] = 0.8
    rir_n = np.zeros((3, 1600), np.float32)
    rir_n[:, 0] = 1.0

    cfg = MixerConfig(snr_range=(0, 0), target_db_fs=-25.0,
                      target_db_fs_floating=0.0, sr=sr)
    noisy, target = mix_single_mc_rir(
        jax.random.PRNGKey(0), jnp.asarray(clean), jnp.asarray(silence), cfg,
        jnp.asarray(rir_c), jnp.asarray(rir_n))
    noisy, target = np.asarray(noisy), np.asarray(target)
    assert noisy.shape == (3, l) and target.shape == (l,)

    # noise source is silent -> each mic is the (scaled) delayed clean plus
    # the mic-0 reflection; mics 1..2 are pure delays
    peak = np.max(np.abs(clean)) + cfg.eps
    for m in (1, 2):
        scale = noisy[m, delays[m] + 100] / (clean[100] / peak)
        np.testing.assert_allclose(
            noisy[m, delays[m]:], scale * clean[: l - delays[m]] / peak,
            atol=1e-4 * abs(scale))
    # the early target equals the delayed clean WITHOUT the late reflection
    scale_t = target[delays[0] + 100] / (clean[100] / peak)
    np.testing.assert_allclose(
        target[delays[0]:], scale_t * clean[: l - delays[0]] / peak,
        atol=1e-4 * abs(scale_t))
    # while the reference-mic noisy keeps it
    late = delays[0] + int(0.060 * sr)
    assert np.abs(noisy[0, late:] - noisy[0, delays[0]:l - late + delays[0]]).max() > 1e-3


def test_syn_dataset_measured_mc_rir(tmp_path, rng):
    """SynMixDataset with mc_rir_manifest yields [B, M, L] batches carrying
    the measured inter-mic delay structure."""
    from cruse_tpu.data.dataset import SynMixDataset, SynMixConfig
    from cruse_tpu.data.manifest import write_manifest

    clean_mf = _make_corpus(tmp_path / "c4", rng)
    noise_mf = _make_corpus(tmp_path / "n4", rng)
    paths = []
    for i in range(3):
        r = np.zeros((3, 1200), np.float32)
        base = 30 + int(rng.integers(20))
        for m in range(3):
            r[m, base + 4 * m] = 0.9
            r[m, base + 4 * m + 300] = 0.25
        p = str(tmp_path / f"mc_rir_{i}.wav")
        write_wav(p, r, 16000)
        paths.append(p)
    mf = str(tmp_path / "mc_rir.txt")
    write_manifest(paths, mf)

    ds = SynMixDataset(SynMixConfig(
        clean_manifest=clean_mf, noise_manifest=noise_mf,
        snr_range=(0, 10), sub_sample_seconds=0.5, sr=16000, batch_size=2,
        num_mics=3, mc_rir_manifest=mf,
    ))
    assert ds._mc_measured
    batch = next(iter(ds.batches(num_batches=1)))
    assert batch["noisy"].shape == (2, 3, 8000)
    assert batch["clean"].shape == (2, 8000)
    noisy = np.asarray(batch["noisy"])
    assert np.isfinite(noisy).all()
    # the 4-sample inter-mic spacing shows up as the dominant TDOA between
    # adjacent mics (speech and noise RIRs share the array geometry)
    a, b = noisy[0, 0], noisy[0, 1]
    xc = np.correlate(a, b, "full")
    lag = np.argmax(np.abs(xc)) - (len(a) - 1)
    assert abs(lag + 4) <= 1 or abs(lag - 4) <= 1, lag


def test_room_sampler_covers_whole_interior():
    """Source/array positions span the FULL room interior [0.5, L-0.5]
    (a round-3 review caught the sampler confined to the upper half of
    every dimension, biasing all mc_room training geometry)."""
    import jax
    from cruse_tpu.data.mixer import RoomConfig, _sample_shoebox

    # fixed-size room so absolute mic positions are comparable across draws
    room = RoomConfig(room_lx=(6.0, 6.0), room_ly=(6.0, 6.0), room_lz=(3.0, 3.0))
    centers = []
    for i in range(100):
        _, _, mics, _ = _sample_shoebox(jax.random.PRNGKey(i), 2, room)
        centers.append(np.asarray(mics).mean(axis=0))
    centers = np.stack(centers)  # [100, 3]
    # x and y interiors are [0.5, 5.5]; under the old bug centers never went
    # below 3.0. P(all 100 draws in the upper half) ~ 0.5^100 when fixed.
    assert centers[:, 0].min() < 3.0 and centers[:, 1].min() < 3.0
    assert centers[:, 0].max() > 3.0 and centers[:, 1].max() > 3.0
    # still off the walls
    assert centers[:, :2].min() >= 0.5 - 0.2  # array offsets extend slightly


def test_set_snr_range_rebuilds_mixers(tmp_path, rng):
    """Curriculum hook: set_snr_range must change the ACHIEVED mixing SNR
    (the jitted mix closures bake the config at trace time, so a naive
    in-place mutation would silently keep the stale compiled range)."""
    clean_mf = _make_corpus(tmp_path / "clean", rng)
    noise_mf = _make_corpus(tmp_path / "noise", rng)
    ds = SynMixDataset(
        SynMixConfig(
            clean_manifest=clean_mf,
            noise_manifest=noise_mf,
            sub_sample_seconds=1.0,
            batch_size=2,
            snr_range=(0, 0),
            reverb_proportion=0.0,
            eq_proportion=0.0,
        )
    )

    def achieved_snr(batch):
        noisy, target = np.asarray(batch["noisy"]), np.asarray(batch["clean"])
        noise_part = noisy - target
        return 10 * np.log10(
            np.sum(target**2, -1) / (np.sum(noise_part**2, -1) + 1e-12))

    b0 = next(iter(ds.batches(num_batches=1)))
    assert np.abs(achieved_snr(b0) - 0.0).max() < 0.5

    ds.set_snr_range((20, 20))
    b1 = next(iter(ds.batches(num_batches=1)))
    assert np.abs(achieved_snr(b1) - 20.0).max() < 0.5

    import pytest

    with pytest.raises(Exception):
        ds.set_snr_range((10,))  # not a [low, high] pair
