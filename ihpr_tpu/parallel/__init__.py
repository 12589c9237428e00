"""SPMD parallelism: device mesh, shardings, train/eval steps.

Replaces the reference's single-process ``nn.DataParallel``
(``common/base.py``: replicate-scatter-gather each step) with a
``jax.sharding.Mesh`` data axis: parameters replicated, batches sharded,
gradient all-reduce lowered by XLA onto ICI (multi-host extends the same
program over DCN via ``jax.distributed.initialize``).
"""

from ihpr_tpu.parallel.mesh import (
    batch_sharding,
    image_sharding,
    make_mesh,
    replicated_sharding,
    shard_host_batch,
)
from ihpr_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    state_shardings,
)

__all__ = [
    "make_mesh",
    "image_sharding",
    "state_shardings",
    "batch_sharding",
    "replicated_sharding",
    "shard_host_batch",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
