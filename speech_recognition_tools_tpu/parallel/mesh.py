"""Device mesh + sharding helpers.

The reference's parallelism is GridEngine job fan-out over a shared
filesystem (queue.pl JOB=1:nj; SURVEY.md §2.8) and its trainers are
single-GPU. The TPU-native replacement is a jax.sharding.Mesh: the
utterance-batch axis is sharded across the 'data' mesh axis (one program
replaces N grid jobs), model/tensor axes get a 'model' axis extension
point, and XLA inserts the collectives over ICI.

Multi-host: call jax.distributed.initialize() before building the mesh;
everything below is expressed in global arrays so the same code runs
single-chip, single-host-multi-chip, and multi-slice.
"""


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in `batch` with its leading axis sharded over the
    'data' axis (pads are the caller's job: global batch % data == 0)."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def data_parallel_step(step_fn, mesh: Mesh):
    """Wrap a (params, opt_state, batch, rng) -> (params, opt_state, ...)
    step with data-parallel in/out shardings: params/opt replicated, batch
    sharded on 'data'. XLA inserts the gradient all-reduce over ICI."""
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(repl, repl, bsh, repl))
