"""Data pipeline (Lx): manifest-driven synthetic noisy/clean mixing.

Host side does only file IO and segment selection (numpy); everything after
raw waveforms -- RIR convolution, SNR scaling, dBFS jitter, EQ augmentation,
clipping guard -- is a jitted device function driven by `jax.random` keys
(cruse_tpu.data.mixer), replacing the reference's truncated host-side
`snr_mix` (dataset/dataset.py:235-264) and fixing its missing tail.
"""

from cruse_tpu.data.manifest import load_manifest, parse_snr_range, offset_and_limit  # noqa: F401
from cruse_tpu.data.mixer import MixerConfig, mix_batch, add_reverb, fft_convolve  # noqa: F401
from cruse_tpu.data.dataset import SynMixDataset, SynMixConfig  # noqa: F401
