"""SpectralPipeline: cached STFT feature bundle + masking-mode dispatch.

Equivalent of the reference `PreProcess` object (utils/utils.py:365-455):
one STFT, cached (real, imag, mag, phase) views, log features, masking modes
(magnitude / complex / direct mapping), and reconstruction.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft, istft, istft_mag_phase
from cruse_tpu.dsp.mask import decompress_cirm, complex_mul


@dataclasses.dataclass
class SpectralPipeline:
    cfg: StftConfig = StftConfig(n_fft=320, hop_length=160)
    mask_mode: str = "mag"  # "mag" | "complex" | "mapping"

    def analyze(self, wav: jax.Array) -> dict:
        """[B, L] -> {"spec", "real", "imag", "mag", "phase"} (all [B, T, F])."""
        spec = stft(wav, self.cfg)
        real, imag = jnp.real(spec), jnp.imag(spec)
        mag = jnp.sqrt(real**2 + imag**2 + 1e-12)
        phase = jnp.arctan2(imag, real)
        return {"spec": spec, "real": real, "imag": imag, "mag": mag, "phase": phase}

    def log_features(self, feats: dict, eps: float = 1e-8) -> jax.Array:
        return jnp.log(feats["mag"] + eps)

    def apply_mask(self, feats: dict, model_out) -> dict:
        """Route the model output by masking mode (utils/utils.py:417-433):
        - mag: real-valued gain on the magnitude, noisy phase kept
        - complex: compressed cIRM [.., 2] decompressed and complex-applied
        - mapping: model output IS the enhanced (real, imag) pair
        Returns {"real", "imag"} enhanced components."""
        if self.mask_mode == "mag":
            mag = feats["mag"] * model_out
            return {
                "real": mag * jnp.cos(feats["phase"]),
                "imag": mag * jnp.sin(feats["phase"]),
            }
        if self.mask_mode == "complex":
            crm = decompress_cirm(model_out)
            r, i = complex_mul(feats["real"], feats["imag"], crm[..., 0], crm[..., 1])
            return {"real": r, "imag": i}
        if self.mask_mode == "mapping":
            return {"real": model_out[..., 0], "imag": model_out[..., 1]}
        raise ValueError(f"unknown mask mode {self.mask_mode!r}")

    def reference_target(self, clean_wav: jax.Array, domain: str = "time"):
        """Training-target prep (utils/utils.py:435-441): time waveform or
        freq components."""
        if domain == "time":
            return clean_wav
        feats = self.analyze(clean_wav)
        return jnp.stack([feats["real"], feats["imag"]], axis=-1)

    def synthesize(self, enhanced: dict, length: int | None = None) -> jax.Array:
        return istft((enhanced["real"], enhanced["imag"]), self.cfg, length=length)
