"""Multi-chip scale-out: 1-D data-parallel mesh + sharded/fused train steps
(additive over the single-device reference; SURVEY §5.8, BASELINE config 5)."""

from challenge_tpu.parallel.mesh import (  # noqa: F401
    BATCH_AXIS, batch_sharding, make_mesh, mesh_for_config, replicate,
    replicated, shard_banks, shard_batch,
)
from challenge_tpu.parallel.train import (  # noqa: F401
    make_fused_eval_step, make_fused_train_step, make_sharded_eval_step,
    make_sharded_feature_fn, make_sharded_train_step,
)
