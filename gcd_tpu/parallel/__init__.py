from gcd_tpu.parallel.mesh import (
    create_mesh,
    make_param_shardings,
    make_batch_shardings,
    shard_params,
    shard_batch,
)
