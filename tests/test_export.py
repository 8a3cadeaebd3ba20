"""Deployability: AOT lowering + jax.export serialize/deserialize round trip.

The reference tests ONNX export and torchscript trace/script of its modules
(test/test_model.py:348-379, SURVEY.md §4); the TPU-native equivalents are
(a) AOT lowering of the jitted enhancement graph and (b) `jax.export`
serialization with a reload-and-run check.
"""
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft, istft
from cruse_tpu.models import CruseNet, CruseConfig


def _enhance_fn():
    scfg = StftConfig(n_fft=320, hop_length=160)
    model = CruseNet(CruseConfig(in_freq=161, channels=(4, 8, 8, 16), rnn_groups=4))
    wav = jnp.zeros((1, 8000))
    feat = model.compress(jnp.abs(stft(wav, scfg)))
    variables = model.init(jax.random.PRNGKey(0), feat)

    def forward(noisy):
        spec = stft(noisy, scfg)
        mask, _ = model.apply(variables, model.compress(jnp.abs(spec)))
        return istft(spec * mask, scfg, length=noisy.shape[-1])

    return forward


def test_aot_lowering():
    forward = _enhance_fn()
    lowered = jax.jit(forward).lower(jnp.zeros((1, 8000)))
    compiled = lowered.compile()
    text = lowered.as_text()
    assert "func.func public @main" in text or "module" in text
    out = compiled(jnp.zeros((1, 8000)))
    assert out.shape == (1, 8000)
    # compiled cost analysis exists (perf introspection hook)
    cost = compiled.cost_analysis()
    assert cost is not None


def test_export_serialize_roundtrip(rng):
    from jax import export as jexport

    forward = _enhance_fn()
    x = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32) * 0.1)
    exported = jexport.export(jax.jit(forward))(x)
    blob = exported.serialize()
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    reloaded = jexport.deserialize(blob)
    out_direct = np.asarray(forward(x))
    out_exported = np.asarray(reloaded.call(x))
    np.testing.assert_allclose(out_exported, out_direct, atol=1e-5)


def test_gru_module_export(rng):
    """Module-level export (the reference exports GroupedGRU to ONNX)."""
    from jax import export as jexport
    from cruse_tpu.nn.gru import GroupedGRU

    model = GroupedGRU(hidden_size=16, num_layers=2, groups=4)
    x = jnp.asarray(rng.standard_normal((1, 10, 16)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    fn = jax.jit(lambda x: model.apply(v, x)[0])
    exported = jexport.export(fn)(x)
    out = np.asarray(jexport.deserialize(exported.serialize()).call(x))
    np.testing.assert_allclose(out, np.asarray(fn(x)), atol=1e-6)


def test_streaming_step_export(rng):
    """The per-hop streaming step exports with its carried state pytree and
    reproduces the live step exactly after a serialize/deserialize round
    trip (tools/export.py --streaming path)."""
    from jax import export as jexport
    from cruse_tpu.infer.streaming import StreamingEnhancer

    scfg = StftConfig(n_fft=320, hop_length=160, center=False)
    model = CruseNet(CruseConfig(in_freq=161, channels=(4, 8, 8, 16), rnn_groups=4))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 161)))
    enh = StreamingEnhancer(model, variables, scfg)

    state = enh.init_state(1)
    hop = jnp.asarray(rng.standard_normal((1, 160)).astype(np.float32) * 0.1)
    exported = jexport.export(jax.jit(enh._step_impl))(state, hop)
    reloaded = jexport.deserialize(exported.serialize())

    out_live, state_live = enh.step(state, hop)
    out_exp, state_exp = reloaded.call(state, hop)
    np.testing.assert_allclose(np.asarray(out_exp), np.asarray(out_live), atol=1e-6)
    # carried state advances identically -> a second hop matches too
    hop2 = jnp.asarray(rng.standard_normal((1, 160)).astype(np.float32) * 0.1)
    out2_live, _ = enh.step(state_live, hop2)
    out2_exp, _ = reloaded.call(state_exp, hop2)
    np.testing.assert_allclose(np.asarray(out2_exp), np.asarray(out2_live), atol=1e-6)
