"""Model zoo (L2): CRUSE (flagship), DFSMN, deep-filter head, MTFAA, BSRNN.

All models consume time-major spectral features [B, T, F(, C)] and emit
masks/filters applied to the noisy STFT. Every model exposes:
  - ``__call__(features, state=None, train=False) -> (out, state)`` where a
    ``None`` state means "fresh utterance"; passing T=1 chunks with carried
    state is the streaming path and is bit-exact with the batch path.
"""

from cruse_tpu.models.cruse import CruseNet, CruseConfig  # noqa: F401
from cruse_tpu.models.dfsmn import DfsmnNet, DfsmnBlock  # noqa: F401
from cruse_tpu.models.deep_filter import DeepFilterHead, deep_filter_apply  # noqa: F401
from cruse_tpu.models.mtfaa import MtfaaNet, MtfaaConfig  # noqa: F401
from cruse_tpu.models.bsrnn import BSRNN, Discriminator  # noqa: F401

MODEL_REGISTRY = {
    "cruse": CruseNet,
    "dfsmn": DfsmnNet,
    "mtfaa": MtfaaNet,
    "bsrnn": BSRNN,
}
