"""Distribution layer: device meshes, sharding rules, distributed launch."""

from speech_recognition_tools_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    data_parallel_step,
)
from speech_recognition_tools_tpu.parallel.launcher import (
    initialize_runtime,
    global_batch_from_local,
)
