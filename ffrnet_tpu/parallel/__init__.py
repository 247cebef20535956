from ffrnet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    recnet_param_shardings,
    replicated,
    validate_batch_for_mesh,
)
