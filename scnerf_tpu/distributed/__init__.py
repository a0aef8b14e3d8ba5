from scnerf_tpu.distributed.mesh import (
    DATA_AXIS, MODEL_AXIS, make_mesh, replicated, data_sharded,
    shard_batch, replicate_state, pad_to_multiple,
)
from scnerf_tpu.distributed.init import initialize_runtime, is_coordinator
