from scenedepthestimation_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    batch_inference,
)

__all__ = ["make_mesh", "shard_batch", "batch_inference"]
