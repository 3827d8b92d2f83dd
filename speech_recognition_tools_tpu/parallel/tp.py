"""Tensor-parallel sharding rules for the model zoo.

The reference has no tensor parallelism at all (SURVEY.md §2.8: every
trainer is single-GPU, fan-out is GridEngine jobs). On TPU the natural
TP axis is the 'model' dimension of the (data, model) mesh: wide kernels
are sharded over 'model', XLA/GSPMD propagates the shardings through the
computation and inserts the all-gather / reduce-scatter collectives over
ICI. These helpers produce `NamedSharding` pytrees for flax param trees:

- GRU acoustic models (`models/recurrent.py`): the hidden axis is the TP
  axis. Input kernels (D, H) and recurrent kernels (H, H) are column-
  sharded P(..., 'model'), hidden biases P('model'); output Dense kernels
  (H, V) are column-sharded so the logits shard over vocab.
- Transformer ASR (`models/transformer_asr.py`): Megatron-style — q/k/v
  projection kernels (D, heads, head_dim) shard over heads, the output
  projection (heads, head_dim, D) shards its heads (contracting) axis,
  FFN kernels shard column-then-row so the block needs one reduce per
  sublayer.

Optimizer state: `shard_like_params` maps any optax state whose pytree
mirrors the params (adam mu/nu) to the same shardings; scalars and
non-mirroring leaves are replicated.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_keys(path):
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def gru_tp_spec(mesh: Mesh):
    """PartitionSpec rule for GRU-stack models (RNNClassifier and friends).

    Shards every GRU cell kernel and the output Dense over 'model'.
    """
    msize = mesh.shape.get("model", 1)

    def spec(path, leaf):
        keys = _path_keys(path)
        if msize > 1 and keys and keys[-1] == "kernel":
            parent = keys[-2] if len(keys) >= 2 else ""
            if parent in ("ir", "iz", "in", "hr", "hz", "hn"):
                if leaf.shape[-1] % msize == 0:
                    return NamedSharding(mesh, P(None, "model"))
            if parent in ("regression", "out") or "regression" in keys:
                if leaf.shape[-1] % msize == 0:
                    return NamedSharding(mesh, P(None, "model"))
        if msize > 1 and keys and keys[-1] == "bias":
            parent = keys[-2] if len(keys) >= 2 else ""
            if parent in ("ir", "iz", "in", "hr", "hz", "hn"):
                if leaf.shape[-1] % msize == 0:
                    return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return spec


def transformer_tp_spec(mesh: Mesh, adim: int, ff_dims):
    """PartitionSpec rule for the transformer ASR (Megatron-style).

    q/k/v kernels (D, heads, hdim) shard heads; attention out kernel
    (heads, hdim, D) shards heads; FFN (adim, ff) column / (ff, adim)
    row; final ctc/vocab Dense columns.
    """
    msize = mesh.shape.get("model", 1)
    if isinstance(ff_dims, int):
        ff_dims = (ff_dims,)
    ff_dims = set(ff_dims)

    def spec(path, leaf):
        keys = _path_keys(path)
        if msize <= 1 or not keys or keys[-1] != "kernel":
            return NamedSharding(mesh, P())
        parent = keys[-2] if len(keys) >= 2 else ""
        shp = leaf.shape
        if parent in ("query", "key", "value") and len(shp) == 3:
            if shp[1] % msize == 0:
                return NamedSharding(mesh, P(None, "model", None))
        if parent == "out" and len(shp) == 3:
            if shp[0] % msize == 0:
                return NamedSharding(mesh, P("model", None, None))
        if len(shp) == 2 and shp[0] == adim and shp[1] in ff_dims:
            if shp[1] % msize == 0:
                return NamedSharding(mesh, P(None, "model"))
        if len(shp) == 2 and shp[0] in ff_dims and shp[1] == adim:
            if shp[0] % msize == 0:
                return NamedSharding(mesh, P("model", None))
        if len(shp) == 2 and parent in ("ctc_head", "output"):
            if shp[1] % msize == 0:
                return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return spec


def shard_params(params, mesh: Mesh, spec_fn):
    """Place a param pytree according to a (path, leaf) -> NamedSharding
    rule."""
    sh = jax.tree_util.tree_map_with_path(spec_fn, params)
    return jax.device_put(params, sh)


def shard_like_params(opt_state, mesh: Mesh, spec_fn):
    """Shard optimizer state so moment pytrees mirror the param shardings.

    Works by applying the same (path, leaf) rule: adam's mu/nu subtrees
    carry the same trailing key paths as the params (the leading
    state-index path components match nothing in the rule and fall
    through to replicated only for non-mirroring leaves like `count`).
    """
    sh = jax.tree_util.tree_map_with_path(spec_fn, opt_state)
    return jax.device_put(opt_state, sh)


def param_shardings(params, mesh: Mesh, spec_fn):
    """The NamedSharding pytree itself (for jit in_shardings)."""
    return jax.tree_util.tree_map_with_path(spec_fn, params)
