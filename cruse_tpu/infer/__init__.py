"""Inference framework (L5): batch enhancement + streaming-causal path, RTF."""

from cruse_tpu.infer.batch import BatchInferencer, InferencerConfig  # noqa: F401
from cruse_tpu.infer.streaming import StreamingEnhancer  # noqa: F401
from cruse_tpu.infer.server import MultiModelServer, StreamingServer  # noqa: F401
