"""Distributed launch helper — the run.pl / queue.pl duality, TPU-style.

The reference swaps `run.pl` (local) for `queue.pl` (GridEngine) via cmd.sh
(recipes/timit/cmd.sh:2-18). In the single-controller JAX world the same
switch is: run the program locally on this host's devices, or initialise
jax.distributed so every host in the slice joins one global mesh. Either
way the *program* is identical — only `initialize_runtime` differs.
"""

import os

import jax


def initialize_runtime(
    multihost: bool | None = None,
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialise the distributed runtime if requested (or if the standard
    cluster env vars are present), then return (devices, is_multihost).

    Local mode (multihost=False): no-op — jax.devices() are this host's.
    Multihost: jax.distributed.initialize with explicit args or
    auto-detection from the TPU/cluster environment.
    """
    if multihost is None:
        multihost = bool(
            os.environ.get("COORDINATOR_ADDRESS")
            or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        )
    if multihost:
        kwargs = {}
        if coordinator_address:
            kwargs.update(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        jax.distributed.initialize(**kwargs)
    return jax.devices(), multihost


def global_batch_from_local(local_batch, mesh):
    """Assemble a global sharded array from per-host shards
    (multi-host data loading; single-host this is just device_put)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), local_batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch,
    )
