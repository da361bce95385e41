"""Multi-chip scaling (mesh + sharded batching).

The reference is strictly single-GPU/single-process (SURVEY.md section 2.5);
video scale-out here is TPU-native: frame pairs are batched on a leading axis
and sharded over a ``jax.sharding.Mesh`` so the work rides ICI, with XLA
inserting any needed collectives (none are algorithmically required — frame
pairs are independent, BASELINE config 5).
"""

from cuda_optical_flow_2_tpu.parallel.batching import (
    make_mesh,
    sharded_pyramidal_lk,
    shard_batch,
)

__all__ = ["make_mesh", "sharded_pyramidal_lk", "shard_batch"]
