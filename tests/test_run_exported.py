"""Artifact container + code-free consumer: the deployment round trip.

The reference's deployment contract is exporter -> blob -> runtime consumer
(ONNX / torchscript, reference test/test_model.py:348-379). Here:
`cruse_tpu/infer/artifact.py` containers (jax.export graphs + metadata) and
`tools/run_exported.py` (enhances wavs from the artifact alone — no config,
checkpoint, or model code).
"""
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cruse_tpu.dsp.stft import StftConfig, stft, istft
from cruse_tpu.infer import artifact as artifact_lib
from cruse_tpu.models import CruseNet, CruseConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_forward():
    scfg = StftConfig(n_fft=320, hop_length=160)
    model = CruseNet(CruseConfig(in_freq=161, channels=(2, 4, 4, 8), rnn_groups=4))
    feat = model.compress(jnp.abs(stft(jnp.zeros((1, 4800)), scfg)))
    variables = model.init(jax.random.PRNGKey(0), feat)

    def forward(noisy):
        spec = stft(noisy, scfg)
        mask, _ = model.apply(variables, model.compress(jnp.abs(spec)))
        return istft(spec * mask, scfg, length=noisy.shape[-1])

    return model, variables, forward


def test_offline_artifact_roundtrip(tmp_path, rng):
    from jax import export as jexport

    _, _, forward = _tiny_forward()
    x = jnp.asarray(rng.standard_normal((1, 4800)).astype(np.float32) * 0.1)
    blob = jexport.export(jax.jit(forward))(x).serialize()
    path = str(tmp_path / "m.jaxexport")
    artifact_lib.save_offline(path, blob, {"sr": 16000, "model": "tiny-cruse"})

    art = artifact_lib.load(path)
    assert art.kind == "offline"
    assert art.meta["sr"] == 16000 and art.meta["format"] == artifact_lib.FORMAT
    assert art.input_shape == (1, 4800)
    np.testing.assert_allclose(
        np.asarray(art.enhance(x)), np.asarray(forward(x)), atol=1e-5)


def test_legacy_bare_blob_loads(tmp_path, rng):
    from jax import export as jexport

    _, _, forward = _tiny_forward()
    x = jnp.zeros((1, 4800), jnp.float32)
    path = str(tmp_path / "bare.jaxexport")
    with open(path, "wb") as f:
        f.write(jexport.export(jax.jit(forward))(x).serialize())
    art = artifact_lib.load(path)
    assert art.kind == "offline" and art.meta == {}
    assert art.enhance(x).shape == (1, 4800)


def test_streaming_artifact_roundtrip(tmp_path, rng):
    from jax import export as jexport
    from cruse_tpu.infer.streaming import StreamingEnhancer

    model, variables, _ = _tiny_forward()
    scfg = StftConfig(n_fft=320, hop_length=160, center=False)
    enhancer = StreamingEnhancer(model, variables, scfg)
    state = enhancer.init_state(2)
    hop = jnp.zeros((2, 160), jnp.float32)
    step_blob = jexport.export(jax.jit(enhancer._step_impl))(state, hop).serialize()
    init_blob = jexport.export(jax.jit(lambda: enhancer.init_state(2)))().serialize()
    path = str(tmp_path / "s.jaxexport")
    artifact_lib.save_streaming(path, step_blob, init_blob,
                                {"sr": 16000, "hop_length": 160, "num_mics": None})

    art = artifact_lib.load(path)
    assert art.kind == "streaming"
    assert art.hop_shape == (2, 160)
    # exported init + step match the live enhancer hop-for-hop
    a_state = art.init_state()
    e_state = enhancer.init_state(2)
    for h in range(4):
        x = jnp.asarray(rng.standard_normal((2, 160)).astype(np.float32) * 0.1)
        a_out, a_state = art.step(a_state, x)
        e_out, e_state = enhancer.step(e_state, x)
        np.testing.assert_allclose(np.asarray(a_out), np.asarray(e_out), atol=1e-5)


def test_streaming_container_standalone_consumer(tmp_path, rng):
    """artifact.py ALONE (loaded by file path in a fresh process, without
    importing the cruse_tpu package) deserializes and drives a streaming
    container — the self-containedness its docstring promises. Regression
    for the round-3 advisor finding: StreamState serialization used to be
    registered in streaming.py, so a standalone consumer failed with
    'unregistered type' unless the whole model stack was imported."""
    from jax import export as jexport
    from cruse_tpu.infer.streaming import StreamingEnhancer

    model, variables, _ = _tiny_forward()
    scfg = StftConfig(n_fft=320, hop_length=160, center=False)
    enhancer = StreamingEnhancer(model, variables, scfg)
    state = enhancer.init_state(1)
    hop = jnp.zeros((1, 160), jnp.float32)
    step_blob = jexport.export(jax.jit(enhancer._step_impl))(state, hop).serialize()
    init_blob = jexport.export(jax.jit(lambda: enhancer.init_state(1)))().serialize()
    path = str(tmp_path / "s.jaxexport")
    artifact_lib.save_streaming(path, step_blob, init_blob,
                                {"sr": 16000, "n_fft": 320, "hop_length": 160})

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys, importlib.util, numpy as np\n"
        "assert 'cruse_tpu' not in sys.modules\n"
        f"spec = importlib.util.spec_from_file_location('artifact_standalone', "
        f"{os.path.join(REPO, 'cruse_tpu', 'infer', 'artifact.py')!r})\n"
        "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)\n"
        "assert 'cruse_tpu' not in sys.modules, 'loader must not pull the package'\n"
        f"art = m.load({path!r})\n"
        "st = art.init_state()\n"
        "st = art.prime(st, np.zeros((1, 160), np.float32))\n"
        "out, st = art.step(st, np.zeros((1, 160), np.float32))\n"
        "assert out.shape == (1, 160), out.shape\n"
        "print('STANDALONE_OK')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", CRUSE_TPU_COMPILE_CACHE="1")
    res = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "STANDALONE_OK" in res.stdout


def test_streaming_artifact_primed_alignment(tmp_path, rng):
    """The consumer recipe (prime with the first n_fft-hop samples, ceil-pad
    the hop count) reproduces StreamingEnhancer.run()'s time-aligned output
    and covers the full signal. Regression for the round-3 advisor findings
    (unprimed one-hop delay + floored hop count)."""
    from jax import export as jexport
    from cruse_tpu.infer.streaming import StreamingEnhancer

    model, variables, _ = _tiny_forward()
    scfg = StftConfig(n_fft=320, hop_length=160, center=False)
    enhancer = StreamingEnhancer(model, variables, scfg)
    state = enhancer.init_state(1)
    hop = jnp.zeros((1, 160), jnp.float32)
    step_blob = jexport.export(jax.jit(enhancer._step_impl))(state, hop).serialize()
    init_blob = jexport.export(jax.jit(lambda: enhancer.init_state(1)))().serialize()
    path = str(tmp_path / "s.jaxexport")
    artifact_lib.save_streaming(path, step_blob, init_blob,
                                {"sr": 16000, "n_fft": 320, "hop_length": 160})
    art = artifact_lib.load(path)

    # a length that is NOT hop-aligned past the prime, so ceil matters:
    # 4000 = 160 (prime) + 24*160, then chop 70 samples off the end
    wav = (rng.standard_normal((1, 3930)) * 0.1).astype(np.float32)
    prime_len, hop_len = 320 - 160, 160
    n_hops = -(-(wav.shape[-1] - prime_len) // hop_len)
    feed = np.zeros((1, prime_len + n_hops * hop_len), np.float32)
    feed[..., : wav.shape[-1]] = wav
    st = art.prime(art.init_state(), jnp.asarray(feed[..., :prime_len]))
    outs = []
    for h in range(n_hops):
        lo = prime_len + h * hop_len
        o, st = art.step(st, jnp.asarray(feed[..., lo : lo + hop_len]))
        outs.append(np.asarray(o))
    got = np.concatenate(outs, axis=-1)

    ref = np.asarray(enhancer.run(jnp.asarray(feed)))  # primed, time-aligned
    assert got.shape == ref.shape == (1, n_hops * hop_len)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # full coverage: the padded feed spans every input sample
    assert prime_len + n_hops * hop_len >= wav.shape[-1]


@pytest.mark.slow
def test_export_then_run_exported_cli(tmp_path):
    """Full producer->consumer flow in subprocesses: train-free checkpoint ->
    tools/export.py (offline + streaming containers) -> tools/run_exported.py
    enhances wavs from the artifacts alone."""
    from cruse_tpu.data.wavio import write_wav
    from cruse_tpu.train.step import StepConfig, init_train_state
    from cruse_tpu.train.checkpoint import save_checkpoint

    scfg = StftConfig(n_fft=320, hop_length=160)
    model = CruseNet(CruseConfig(in_freq=161, channels=(2, 4, 4, 8), rnn_groups=4))
    feat = model.compress(jnp.abs(stft(jnp.zeros((1, 4800)), scfg)))
    state = init_train_state(model, StepConfig(stft=scfg), jax.random.PRNGKey(0), feat)
    save_checkpoint(tmp_path / "ck", state, epoch=1, best_score=0.0)
    ckpt = str(tmp_path / "ck" / "model_0001")

    cfg = tmp_path / "m.toml"
    cfg.write_text(
        "[meta]\nexperiment_name='exp'\n"
        "[acoustics]\nn_fft=320\nhop_length=160\nwin_length=320\nsr=16000\n"
        "[model]\npath='cruse_tpu.models.cruse.CruseConfig'\n"
        "[model.args]\nin_freq=161\nchannels=[2,4,4,8]\nrnn_groups=4\n"
    )
    wav_dir = tmp_path / "in"
    os.makedirs(wav_dir)
    rng = np.random.default_rng(0)
    t = np.arange(8000) / 16000.0
    for name in ["u1", "u2"]:
        wav = (0.2 * np.sin(2 * np.pi * 220 * t)
               + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
        write_wav(str(wav_dir / f"{name}.wav"), (wav * 16000).astype(np.int16), 16000)

    def run(tool, argv):
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys, runpy; "
            f"sys.argv = [{tool!r}] + {list(map(str, argv))!r}; "
            f"runpy.run_path({os.path.join(REPO, 'tools', tool)!r}, run_name='__main__')"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu", CRUSE_TPU_COMPILE_CACHE="1")
        return subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                              capture_output=True, text=True, timeout=600)

    off = str(tmp_path / "off.jaxexport")
    res = run("export.py", ["-C", cfg, "-M", ckpt, "-O", off, "--seconds", "1.0"])
    assert res.returncode == 0, res.stderr[-2000:]
    out_dir = tmp_path / "out_off"
    res = run("run_exported.py", ["-A", off, "-I", wav_dir, "-O", out_dir])
    assert res.returncode == 0, res.stderr[-2000:]
    assert sorted(p.name for p in out_dir.glob("*.wav")) == ["u1.wav", "u2.wav"]

    strm = str(tmp_path / "strm.jaxexport")
    res = run("export.py", ["-C", cfg, "-M", ckpt, "-O", strm, "--streaming"])
    assert res.returncode == 0, res.stderr[-2000:]
    out_dir2 = tmp_path / "out_strm"
    res = run("run_exported.py", ["-A", strm, "-I", wav_dir, "-O", out_dir2])
    assert res.returncode == 0, res.stderr[-2000:]
    assert sorted(p.name for p in out_dir2.glob("*.wav")) == ["u1.wav", "u2.wav"]
    # enhanced audio is non-trivial (not silence) in both modes
    from cruse_tpu.data.wavio import read_wav
    for d in (out_dir, out_dir2):
        y, _ = read_wav(str(d / "u1.wav"))
        assert float(np.abs(y).max()) > 1e-4
