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
from speech_recognition_tools_tpu.parallel.pp import (
    microbatch,
    pipeline_apply,
    pipeline_param_sharding,
    stack_pipeline_params,
    unmicrobatch,
)
from speech_recognition_tools_tpu.parallel.ep import (
    expert_param_sharding,
    stack_expert_params,
    unstack_expert_params,
    vmap_experts,
)
from speech_recognition_tools_tpu.parallel.ring import ring_attention
