from arseg_tpu.parallel.mesh import (
    data_mesh,
    shard_batch,
    replicate,
    eval_psum_hist,
)

__all__ = ["data_mesh", "shard_batch", "replicate", "eval_psum_hist"]
