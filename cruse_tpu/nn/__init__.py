"""Neural building blocks (L1): causal convs, grouped GRU/linear, streaming norms.

Flax modules with TPU-first layouts: activations are time-major
``[B, T, F, C]`` (freq/channels on lanes), recurrences precompute the full
input projection as one MXU matmul and scan only the small recurrent matmul.
"""

from cruse_tpu.nn.gru import GRU, GroupedGRULayer, GroupedGRU, GGRUBottleneck, SqueezedGRU  # noqa: F401
from cruse_tpu.nn.linear import GroupedLinear  # noqa: F401
from cruse_tpu.nn.conv import CausalConv2d, CausalConvTranspose2d, FreqUpsample  # noqa: F401
from cruse_tpu.nn import norms  # noqa: F401
from cruse_tpu.nn.quantize import (  # noqa: F401
    quantize_tree,
    dequantize_tree,
    quantize_variables,
    quantization_report,
)
