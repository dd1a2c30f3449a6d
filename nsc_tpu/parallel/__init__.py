from nsc_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_parallel_infer,
    make_parallel_train_step,
    replicate,
    shard_batch,
)
