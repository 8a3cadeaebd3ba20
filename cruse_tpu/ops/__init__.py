"""Pallas TPU kernels for the hot ops.

Kernels fall back to interpreter mode off-TPU so the test suite (virtual CPU
mesh) exercises identical code paths.
"""

from cruse_tpu.ops.gru_kernel import gru_sequence_pallas  # noqa: F401
from cruse_tpu.ops.deep_filter_kernel import deep_filter_pallas  # noqa: F401
