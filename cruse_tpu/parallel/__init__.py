"""Device mesh, shardings and collectives (the reference's distributed layer,
re-designed for SPMD over ICI; see SURVEY.md §2.3)."""

from cruse_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated,
    param_shardings,
    shard_batch,
)
