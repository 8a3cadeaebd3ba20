"""Training framework (L4): jitted SPMD train step, trainer loop, checkpoints."""

from cruse_tpu.train.step import TrainState, make_train_step, init_train_state  # noqa: F401
