"""Objective metrics (L3): SI-SDR/SDR (jax+numpy), STOI (numpy, native
implementation), optional PESQ/MOSNet via external packages when present.

Registry + composite best-score rule mirror train_base/metrics.py:129-135 and
base_trainer.py:370-376.
"""

from cruse_tpu.metrics.sisdr import si_sdr, sdr  # noqa: F401
from cruse_tpu.metrics.stoi import stoi  # noqa: F401
from cruse_tpu.metrics.registry import (  # noqa: F401
    REGISTERED_METRICS,
    available_metrics,
    compute_metric,
    composite_score,
)
