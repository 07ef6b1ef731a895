"""Multi-chip parallelism: device mesh + pose-batch sharding.

The reference is single-process single-GPU (SURVEY §2c); the TPU build's
first-class parallel axis is the candidate-pose batch (embarrassingly
parallel: 10k-2.2M poses/task), sharded over a 1-D `jax.sharding.Mesh` with
XLA collectives over ICI. Ray batches during NGP training shard over the same
axis (pure data parallelism; params replicated, grads reduced by XLA).
"""

from dream2real_tpu.parallel.mesh import (  # noqa: F401
    data_mesh,
    pose_sharding,
    replicated,
)
