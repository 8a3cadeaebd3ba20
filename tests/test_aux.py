"""Aux subsystems: collectives, RT60, spectral pipeline, misc utils, pallas GRU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cruse_tpu.parallel import collectives as coll
from cruse_tpu.dsp.rt60 import estimate_rt60, rt60_by_band, suppress_late_reflections, schroeder_decay_db
from cruse_tpu.dsp.pipeline import SpectralPipeline
from cruse_tpu.utils import misc
from cruse_tpu.ops.gru_kernel import gru_sequence_pallas
from cruse_tpu.nn.gru import gru_scan


def test_collectives_under_shard_map():
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devices = np.asarray(jax.devices()[:4])
    mesh = Mesh(devices, ("data",))
    x = jnp.arange(4.0)

    def body(x):
        return coll.all_reduce_sum(x, "data")

    out = shard_map(body, mesh=mesh, in_specs=P("data"), out_specs=P("data"))(x)
    np.testing.assert_allclose(np.asarray(out), [6.0, 6.0, 6.0, 6.0])

    def metrics_body(x):
        return coll.average_metrics({"m": x[0]}, "data")["m"]

    out = shard_map(metrics_body, mesh=mesh, in_specs=P("data"), out_specs=P())(x)
    np.testing.assert_allclose(float(out), 1.5)


def test_world_size_rank():
    assert coll.world_size() == 8  # virtual mesh from conftest
    assert coll.rank() == 0
    assert coll.tree_structures_match({"a": 1}, {"a": 2})
    assert not coll.tree_structures_match({"a": 1}, {"b": 1})


def test_rt60_synthetic_decay():
    sr = 16000
    rng = np.random.default_rng(0)
    rt_true = 0.4
    t = np.arange(int(sr * 1.2)) / sr
    env = 10 ** (-3.0 * t / rt_true)  # -60 dB at rt_true
    rir = rng.standard_normal(len(t)) * env
    est = estimate_rt60(rir, sr, band=1000.0)
    assert abs(est - rt_true) / rt_true < 0.25
    bands = rt60_by_band(rir, sr)
    assert set(bands) == {125.0, 250.0, 500.0, 1000.0, 2000.0, 4000.0}


def test_schroeder_monotone():
    rir = np.exp(-np.arange(1000) / 100.0)
    edc = schroeder_decay_db(rir)
    assert edc[0] == pytest.approx(0.0, abs=1e-6)
    assert (np.diff(edc) <= 1e-9).all()


def test_suppress_late():
    sr = 16000
    rir = np.ones(sr // 2)
    out = suppress_late_reflections(rir, sr, rt60=0.2, offset_ms=5.0)
    assert out[0] == 1.0
    assert out[-1] < 0.05


def test_spectral_pipeline_modes(rng):
    pipe = SpectralPipeline()
    wav = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32) * 0.1)
    feats = pipe.analyze(wav)
    assert feats["mag"].shape == feats["phase"].shape
    # mag mode with unity gain reconstructs
    out = pipe.apply_mask(feats, jnp.ones_like(feats["mag"]))
    rec = np.asarray(pipe.synthesize(out, length=8000))
    np.testing.assert_allclose(rec, np.asarray(wav), atol=1e-3)
    # mapping mode passes through components
    ri = jnp.stack([feats["real"], feats["imag"]], axis=-1)
    out2 = pipe_m = SpectralPipeline(mask_mode="mapping").apply_mask(feats, ri)
    np.testing.assert_allclose(np.asarray(out2["real"]), np.asarray(feats["real"]))
    # complex mode runs
    crm = jnp.zeros_like(ri)
    out3 = SpectralPipeline(mask_mode="complex").apply_mask(feats, crm)
    assert np.isfinite(np.asarray(out3["real"])).all()


def test_misc_utils(tmp_path, rng):
    assert misc.check_nan({"a": jnp.asarray([1.0, np.nan])}, "x")
    assert not misc.check_nan({"a": jnp.asarray([1.0])})
    assert misc.str2bool("yes") and not misc.str2bool("0")
    with pytest.raises(ValueError):
        misc.str2bool("maybe")
    p = str(tmp_path / "log.csv")
    misc.write_csv_row(p, ["a", 1])
    misc.write_csv_row(p, ["b", 2])
    assert open(p).read().count("\n") == 2
    w = misc.as_windowed(np.arange(10), 4, 2)
    assert w.shape == (4, 4)
    np.testing.assert_array_equal(w[1], [2, 3, 4, 5])
    padded = misc.pad_1d([np.ones(3), np.ones(5)])
    assert padded.shape == (2, 5)
    mask = misc.get_mask_from_lengths(jnp.asarray([2, 4]), 5)
    np.testing.assert_array_equal(np.asarray(mask[0]), [True, True, False, False, False])
    info = misc.device_info()
    assert info["num_devices"] == 8


def test_pallas_gru_matches_scan(rng):
    b, t, g, h = 2, 10, 2, 8
    x_proj = jnp.asarray(rng.standard_normal((b, t, g, 3 * h)).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((b, g, h)).astype(np.float32))
    w_hh = jnp.asarray(rng.standard_normal((g, 3 * h, h)).astype(np.float32) * 0.1)
    b_hh = jnp.asarray(rng.standard_normal((g, 3 * h)).astype(np.float32) * 0.1)
    y_ref, h_ref = gru_scan(x_proj, h0, w_hh, b_hh)
    y_pal, h_pal = gru_sequence_pallas(x_proj, h0, w_hh, b_hh, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), atol=1e-5)
