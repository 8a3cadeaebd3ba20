"""Utilities (Lu): logging, timing, config IO + reflection registry."""

from cruse_tpu.utils.logger import get_logger, log  # noqa: F401
from cruse_tpu.utils.timing import ExecutionTime  # noqa: F401
from cruse_tpu.utils.config import (  # noqa: F401
    load_config,
    merge_config,
    initialize_module,
    AttrDict,
    load_hparams,
    dump_hparams,
)
