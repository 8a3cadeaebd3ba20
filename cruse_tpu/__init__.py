"""cruse_tpu: TPU-native monaural speech-enhancement framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Okrio/CRUSE
reference stack (see SURVEY.md). Layers (bottom to top):

- ``cruse_tpu.dsp``      -- STFT/iSTFT, ERB & PQMF filterbanks, biquads, masks, VAD (L0)
- ``cruse_tpu.nn``       -- causal conv blocks, grouped GRU/linear, streaming norms (L1)
- ``cruse_tpu.models``   -- CRUSE, DFSMN, deep-filter, MTFAA, BSRNN model zoo (L2)
- ``cruse_tpu.losses``   -- SI-SNR, spectral losses, gradient-norm balancer (L3)
- ``cruse_tpu.data``     -- manifest-driven synthetic mixing, on-device augmentation (Lx)
- ``cruse_tpu.train``    -- jit/pjit trainer, checkpointing, config registry (L4)
- ``cruse_tpu.infer``    -- batch + streaming-causal inference with RTF measurement (L5)
- ``cruse_tpu.metrics``  -- SI-SDR in JAX; PESQ/STOI host bridges (L3)
- ``cruse_tpu.parallel`` -- device mesh, shardings, collectives
- ``cruse_tpu.ops``      -- Pallas TPU kernels for the hot ops
- ``cruse_tpu.utils``    -- logging, timing, config IO
"""

__version__ = "0.1.0"
