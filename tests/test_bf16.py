"""bf16 inference mode: quality bound vs the fp32 reference path.

bench.py defaults to bf16 model compute (fp32 DSP); this pins down what that
costs: the bf16-masked waveform must stay within tight agreement of the
fp32-masked waveform.
"""
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft, istft
from cruse_tpu.models import CruseNet, CruseConfig
from cruse_tpu.losses.sisnr import si_snr


def test_bf16_mask_quality(rng):
    cfg = StftConfig(n_fft=320, hop_length=160)
    model = CruseNet(CruseConfig(in_freq=161, channels=(4, 8, 8, 16)))
    wav = jnp.asarray((rng.standard_normal((2, 16000)) * 0.1).astype(np.float32))
    spec = stft(wav, cfg)
    feat = model.compress(jnp.abs(spec))
    v32 = jax.jit(model.init)(jax.random.PRNGKey(0), feat)
    v16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), v32)

    mask32, _ = jax.jit(model.apply)(v32, feat)
    mask16, _ = jax.jit(model.apply)(v16, feat.astype(jnp.bfloat16))
    mask16 = mask16.astype(jnp.float32)
    assert float(jnp.abs(mask32 - mask16).mean()) < 0.01

    out32 = istft(spec * mask32, cfg, length=16000)
    out16 = istft(spec * mask16, cfg, length=16000)
    agreement = float(si_snr(out16, out32))
    assert agreement > 25.0, f"bf16 vs fp32 agreement only {agreement:.1f} dB"
