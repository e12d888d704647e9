from ecnf_tpu.parallel.mesh import (
    DATA_AXIS,
    get_mesh,
    replicated,
    data_sharded,
    shard_batch,
    replicate,
    pad_to_multiple,
)
from ecnf_tpu.parallel.distributed import (
    maybe_initialize_distributed,
    process_batch_slice,
)
