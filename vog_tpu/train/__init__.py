from vog_tpu.train.dist import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
)
from vog_tpu.train.learner import Learner, SmoothenValue
from vog_tpu.train.state import (
    TrainState,
    build_model,
    example_batch,
    init_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "shard_batch",
    "Learner",
    "SmoothenValue",
    "TrainState",
    "build_model",
    "example_batch",
    "init_state",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
]
