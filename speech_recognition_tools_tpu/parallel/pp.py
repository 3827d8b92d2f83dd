"""Pipeline parallelism (GPipe-style) over a 'pipe' mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.8: every trainer
is single-GPU; fan-out is GridEngine jobs) — this is the TPU-native
extension point for models deeper than one chip's HBM. Design:

  * A pipeline stage is a *shape-preserving* function
    `stage_fn(stage_params, state) -> state` (e.g. one transformer
    encoder block, or a slice of a GRU stack). All stages share one
    structure; per-stage parameters are stacked along a leading axis
    and sharded `P('pipe')`, so each device holds exactly its own
    stage's weights — model memory scales 1/S.
  * Microbatches flow through the classic GPipe schedule inside a
    single `shard_map`: at tick t device 0 injects microbatch t, every
    device applies its stage, and activations hop to the next device
    with `lax.ppermute` over ICI. After M + S - 1 ticks every
    microbatch has crossed all S stages; outputs are collected from
    the last device with a masked `psum`.
  * The whole schedule is a `lax.scan`, so `jax.grad` through
    `pipeline_apply` yields the exact GPipe backward pipeline
    (ppermute transposes to the reverse hop) — no hand-written
    backward pass, and the bubble fraction is the textbook
    (S-1)/(M+S-1).

The state can be any pytree (e.g. `(hidden, mask)` for attention
blocks); every leaf is injected/hopped/collected together.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map_new

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep):
        return _shard_map_new(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def stack_pipeline_params(params_list):
    """Stack S per-stage parameter pytrees into one pytree with a
    leading stage axis (the layout `pipeline_apply` expects)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def pipeline_param_sharding(mesh: Mesh, axis: str = "pipe"):
    """(path, leaf) -> NamedSharding placing the leading stage axis of
    every stacked parameter on the pipe axis (use with
    `parallel.tp.shard_params`)."""

    def spec(path, leaf):
        return NamedSharding(mesh, P(axis))

    return spec


def pipeline_apply(
    stage_fn,
    stacked_params,
    micro_state,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: str | None = None,
):
    """Run microbatched inputs through S pipelined stages.

    Args:
      stage_fn: (stage_params, state) -> state, shape-preserving; the
        same function for every stage (stage s uses
        `stacked_params[s]`).
      stacked_params: pytree with leading stage axis S =
        mesh.shape[axis] on every leaf (see `stack_pipeline_params`).
      micro_state: pytree of (M, mb, ...) microbatched inputs — M
        microbatches of mb examples (reshape the batch before calling;
        more microbatches = smaller bubble).
      mesh: mesh containing `axis` (and `data_axis` if given).
      axis: pipeline mesh axis name.
      data_axis: optional mesh axis sharding the microbatch dimension
        (DP x PP: per-device batch is mb / data_par).

    Returns: pytree of (M, mb, ...) outputs after all S stages.
    """
    S = mesh.shape[axis]
    leaves = jax.tree.leaves(micro_state)
    M = leaves[0].shape[0]
    state_spec = P(None, data_axis) if data_axis else P(None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), state_spec),
        out_specs=state_spec,
        check_rep=False,
    )
    def run(params, xm):
        # params leaf shapes are (1, ...): this device's stage only
        p = jax.tree.map(lambda a: a[0], params)
        idx = jax.lax.axis_index(axis)
        zero = jax.tree.map(lambda a: jnp.zeros_like(a[0]), xm)
        perm = [(i, i + 1) for i in range(S - 1)]

        def tick(state, t):
            # device 0 injects microbatch t while t < M; other devices
            # keep the activation ppermuted to them last tick
            inj = jax.tree.map(lambda a: a[jnp.minimum(t, M - 1)], xm)
            state = jax.tree.map(
                lambda i, s: jnp.where((idx == 0) & (t < M), i, s),
                inj, state,
            )
            out = stage_fn(p, state)
            nxt = jax.tree.map(
                lambda o: jax.lax.ppermute(o, axis, perm), out
            )
            return nxt, out

        _, outs = jax.lax.scan(tick, zero, jnp.arange(M + S - 1))
        # device S-1's out at tick t is microbatch t-(S-1) fully done;
        # ticks before S-1 are pipeline fill (garbage elsewhere)
        res = jax.tree.map(lambda o: o[S - 1:], outs)
        return jax.tree.map(
            lambda o: jax.lax.psum(
                jnp.where(idx == S - 1, o, jnp.zeros_like(o)), axis
            ),
            res,
        )

    return run(stacked_params, micro_state)


def microbatch(x, n_micro: int):
    """(B, ...) -> (n_micro, B // n_micro, ...) (batch must divide)."""
    B = x.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro {n_micro}")
    return x.reshape(n_micro, B // n_micro, *x.shape[1:])


def unmicrobatch(xm):
    """Inverse of `microbatch`."""
    return xm.reshape(xm.shape[0] * xm.shape[1], *xm.shape[2:])
