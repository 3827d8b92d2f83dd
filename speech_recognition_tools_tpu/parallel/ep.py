"""Expert parallelism for the component/stream model families.

The reference's nearest analogue to experts is the CURL mixture: one
decoder and one classifier per mixture component, executed *serially*
in a Python loop (`nnet_models.py:616-629,722-736`). SURVEY.md §2.8
names the TPU-native equivalent: vmap the component axis so every
expert's forward runs in one batched program, and shard that leading
component axis over a mesh axis when the mixture grows (lifelong
`expand_component` can take it to dozens of streams).

These helpers are model-agnostic:

  * `vmap_experts(Module, num_experts)` — a flax `nn.vmap` lift whose
    params carry a leading expert axis; inputs vary per expert on
    axis 0 by default, broadcast args via `in_axes`.
  * `stack_expert_params([p_0..p_{K-1}])` — convert a loop-of-modules
    parameter layout (e.g. `classifier_0..classifier_{K-1}` subtrees)
    into the vmapped layout; the two are numerically identical
    (tests/test_expert_parallel.py pins this).
  * `expert_param_sharding(mesh, axis)` — place the leading expert
    axis of every parameter on a mesh axis; GSPMD then runs each
    expert's compute on the device(s) owning it and all-gathers only
    the (small) per-expert outputs.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def vmap_experts(module_cls, num_experts: int, in_axes=(0, None)):
    """Lift a module class over a leading expert axis.

    Args:
      module_cls: flax module class (e.g. models.recurrent.DecoderRNN).
      num_experts: expert count K (params get a leading K axis).
      in_axes: how call arguments map over experts — default
        (0, None): first arg carries a leading (K, ...) expert axis,
        second is shared (the model zoo's (latents, lengths) calls).

    Returns a module class; construct it with the base class's kwargs.
    """
    return nn.vmap(
        module_cls,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=in_axes,
        out_axes=0,
        axis_size=num_experts,
    )


def stack_expert_params(params_list):
    """Stack K per-expert param pytrees into the vmapped layout
    (leading expert axis on every leaf)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def unstack_expert_params(stacked, num_experts: int):
    """Inverse of `stack_expert_params`."""
    return [
        jax.tree.map(lambda a: a[i], stacked) for i in range(num_experts)
    ]


def expert_param_sharding(mesh: Mesh, axis: str = "model",
                          num_experts: int | None = None):
    """(path, leaf) -> NamedSharding placing the leading expert axis on
    `axis` (use with `parallel.tp.shard_params`).

    Pass `num_experts` to shard ONLY leaves whose leading dim equals it
    (the vmapped expert collections); otherwise any leaf whose leading
    dim divides the axis size is sharded, which in a mixed tree (e.g.
    CurlMultistreamClassifierEP's non-expert encoder) could place a
    feature axis on the mesh — correct under GSPMD but not the intended
    layout. Leaves that don't match (or don't divide) are replicated."""
    size = mesh.shape.get(axis, 1)

    def spec(path, leaf):
        if size <= 1 or leaf.ndim < 1:
            return NamedSharding(mesh, P())
        if num_experts is not None and leaf.shape[0] != num_experts:
            return NamedSharding(mesh, P())
        if leaf.shape[0] % size == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return spec
