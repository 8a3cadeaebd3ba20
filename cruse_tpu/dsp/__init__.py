"""DSP / acoustics layer (L0): pure-function signal math, shared by all models.

TPU-native equivalent of the reference's ``train_base/acoustics`` package:
STFT/iSTFT are fused strided matmuls against windowed DFT bases (one MXU
matmul instead of frame loops), filterbanks are precomputed matrices applied
as einsums, and recursive filters (biquads) run under ``lax.scan``.
"""

from cruse_tpu.dsp.windows import get_window  # noqa: F401
from cruse_tpu.dsp.stft import (  # noqa: F401
    StftConfig,
    stft,
    istft,
    mc_stft,
    mag_phase,
)
