"""Weight-only int8 quantization: error bounds, passthrough rules, and
end-to-end parity of quantized serving through the batch and streaming paths.

Beyond-reference feature (the reference exports fp32 ONNX only,
/root/reference/test/test_model.py); quality gates here are the contract.
"""
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.models import CruseNet, CruseConfig
from cruse_tpu.nn.quantize import (
    dequantize_tree,
    is_quantized_leaf,
    quantization_report,
    quantize_tree,
    quantize_variables,
)


def _model_and_vars(in_freq=161):
    model = CruseNet(CruseConfig(in_freq=in_freq, channels=(4, 8, 8, 16), rnn_groups=4))
    feat = jnp.zeros((1, 8, in_freq))
    variables = model.init(jax.random.PRNGKey(0), feat)
    return model, variables


def _snr_db(ref, test):
    ref, test = np.asarray(ref, np.float64), np.asarray(test, np.float64)
    err = np.sum((ref - test) ** 2)
    return 10 * np.log10(np.sum(ref**2) / max(err, 1e-300))


def test_roundtrip_error_bound(rng):
    w = rng.standard_normal((64, 96)).astype(np.float32)
    q = quantize_tree({"kernel": w}, min_size=1024)["kernel"]
    assert is_quantized_leaf(q)
    assert q["__q8__"].dtype == jnp.int8
    back = np.asarray(dequantize_tree(q))
    # symmetric per-output-channel: |err| <= scale/2 = amax/254 per column
    bound = np.abs(w).max(axis=0, keepdims=True) / 254.0 + 1e-7
    assert (np.abs(back - w) <= bound).all()


def test_small_and_1d_leaves_pass_through(rng):
    tree = {
        "bias": rng.standard_normal(4096).astype(np.float32),  # 1-D: keep
        "tiny": rng.standard_normal((8, 8)).astype(np.float32),  # small: keep
        "big": rng.standard_normal((64, 64)).astype(np.float32),  # quantize
        "step": np.int32(7),  # non-float: keep
    }
    q = quantize_tree(tree, min_size=2048)
    assert q["bias"] is tree["bias"] and q["tiny"] is tree["tiny"]
    assert q["step"] is tree["step"]
    assert is_quantized_leaf(q["big"])
    # idempotent
    q2 = quantize_tree(q, min_size=2048)
    assert q2["big"]["__q8__"] is q["big"]["__q8__"]


def test_dequantize_is_identity_on_fp_trees(rng):
    tree = {"a": {"k": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)},
            "b": (jnp.zeros(3), jnp.ones(2))}
    out = dequantize_tree(tree)
    assert out["a"]["k"] is tree["a"]["k"]
    assert out["b"][1] is tree["b"][1]


def test_quantization_report_counts_bytes(rng):
    tree = {"w": rng.standard_normal((128, 128)).astype(np.float32),
            "b": rng.standard_normal(128).astype(np.float32)}
    rep = quantization_report(quantize_tree(tree, min_size=1024))
    assert rep["leaves_quantized"] == 1 and rep["leaves_kept"] == 1
    # 128*128 int8 + 128 f32 scales + 128 f32 bias vs all-fp32
    assert rep["bytes_quantized"] < 0.35 * rep["bytes_fp32"]


def test_cruse_forward_parity_int8(rng):
    """Quantized weights change the mask by < -30 dB relative to fp32."""
    model, variables = _model_and_vars()
    qvars = quantize_variables(variables)
    rep = quantization_report(qvars["params"])
    assert rep["leaves_quantized"] > 0

    feat = jnp.asarray(rng.standard_normal((2, 16, 161)).astype(np.float32))
    mask_fp, _ = model.apply(variables, feat)
    mask_q, _ = model.apply(dequantize_tree(qvars), feat)
    assert np.isfinite(np.asarray(mask_q)).all()
    assert _snr_db(mask_fp, mask_q) > 30.0


def test_streaming_serves_quantized_variables(rng):
    """StreamingEnhancer dequantizes in-graph: int8 variables stream and
    track the fp32 stream closely."""
    from cruse_tpu.dsp.stft import StftConfig
    from cruse_tpu.infer.streaming import StreamingEnhancer

    cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    model, variables = _model_and_vars()
    wav = rng.standard_normal((1, 4800)).astype(np.float32) * 0.1

    fp = np.asarray(StreamingEnhancer(model, variables, cfg).run(jnp.asarray(wav)))
    q = np.asarray(
        StreamingEnhancer(model, quantize_variables(variables), cfg).run(jnp.asarray(wav))
    )
    assert np.isfinite(q).all()
    assert _snr_db(fp, q) > 25.0


def test_batch_inferencer_serves_quantized_variables(rng):
    from cruse_tpu.dsp.stft import StftConfig
    from cruse_tpu.infer.batch import BatchInferencer, InferencerConfig

    model, variables = _model_and_vars()
    icfg = InferencerConfig(type="mag_to_mag", stft=StftConfig(n_fft=320, hop_length=160),
                            output_dir="/tmp/q8_enh")
    wav = jnp.asarray(rng.standard_normal((1, 4800)).astype(np.float32) * 0.1)
    fp = np.asarray(BatchInferencer(model, variables, icfg).mag_to_mag(wav))
    q = np.asarray(
        BatchInferencer(model, quantize_variables(variables), icfg).mag_to_mag(wav)
    )
    assert _snr_db(fp, q) > 25.0


def test_exported_artifact_shrinks(tmp_path, rng):
    """jax.export blobs with int8-baked weights shrink by ~the params
    savings (~4x on params; this tiny model's blob is graph-dominated, so
    assert the shrink against the report's byte accounting instead)."""
    from jax import export as jexport
    from cruse_tpu.dsp.stft import StftConfig, stft, istft

    scfg = StftConfig(n_fft=320, hop_length=160)
    model, variables = _model_and_vars()
    qvars = quantize_variables(variables)
    wav = jnp.zeros((1, 4800), jnp.float32)

    def fwd(v):
        def forward(noisy):
            vv = dequantize_tree(v)
            spec = stft(noisy, scfg)
            mask, _ = model.apply(vv, model.compress(jnp.abs(spec)))
            return istft(spec * mask, scfg, length=noisy.shape[-1])

        return forward

    blob_fp = jexport.export(jax.jit(fwd(variables)))(wav).serialize()
    blob_q = jexport.export(jax.jit(fwd(qvars)))(wav).serialize()
    rep = quantization_report(qvars["params"])
    saved = rep["bytes_fp32"] - rep["bytes_quantized"]
    assert saved > 0
    assert (len(blob_fp) - len(blob_q)) > 0.6 * saved, (len(blob_fp), len(blob_q), saved)
    out = jexport.deserialize(blob_q).call(wav)
    assert out.shape == wav.shape
