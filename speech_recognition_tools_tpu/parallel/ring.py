"""Ring attention: exact sequence-parallel attention over a mesh axis.

SURVEY.md §5 (long-context) leaves ring attention as the extension
point for long-context encoders: the reference truncates sequences to
512 frames instead (`data_prep_for_seq.py:30-31`). Here the time axis
of q/k/v is sharded over a mesh axis and attention is computed exactly
(not blockwise-approximated) with the flash-attention running
(max, denominator, accumulator) recurrence while K/V blocks hop around
the ring via `lax.ppermute`:

  * each device holds T/S query rows for the whole computation and sees
    every key/value block exactly once, so per-device attention memory
    is O((T/S)^2 .. T*T/S) instead of O(T^2) and the K/V transfer rides
    ICI neighbour links;
  * the S ring steps are a static Python loop (S <= mesh axis size);
    `jax.grad` through ppermute gives the backward ring automatically —
    no custom VJP;
  * masked scores use a large finite negative (like flax's attention
    bias) rather than -inf, so fully-masked (padding) query rows
    produce the same uniform-weight garbage as unsharded masked
    softmax — bit-comparable parity and NaN-free gradients.

Numerically equal to plain masked attention on one device
(tests/test_ring_attention.py: forward and gradient parity).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from speech_recognition_tools_tpu.parallel.pp import shard_map

NEG = -1e30  # finite mask fill: same padding-row semantics as softmax
             # over flax-style large-negative bias, and NaN-free grads


def ring_attention(
    q, k, v, lengths=None, *, mesh: Mesh, axis: str = "time",
    causal: bool = False, scale: float | None = None,
):
    """Exact attention with the sequence axis sharded over `axis`.

    Args:
      q, k, v: (B, T, H, Dh) arrays, T sharded over `axis` (T must
        divide by the axis size; pad first).
      lengths: optional (B,) valid key lengths (padding mask).
      causal: restrict to keys at positions <= the query position.
      scale: score scale; default 1/sqrt(Dh).

    Returns (B, T, H, Dh), sharded like q.
    """
    S = mesh.shape[axis]
    B, T, H, Dh = q.shape
    if T % S:
        raise ValueError(f"T={T} not divisible by ring size {S}")
    if scale is None:
        scale = 1.0 / float(np.sqrt(Dh))
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    # dtype-safe finite fill: -1e30 cast to float16 would overflow to
    # -inf and make fully-masked rows NaN; clamp into the dtype's range
    neg = np.maximum(NEG, float(np.finfo(np.dtype(q.dtype)).min) * 0.5)
    neg = jnp.asarray(neg, q.dtype)

    spec = P(None, axis, None, None)

    def run(q, k, v, lengths):
        idx = jax.lax.axis_index(axis)
        Tl = q.shape[1]
        qpos = idx * Tl + jnp.arange(Tl)  # (Tl,)
        m = jnp.full((B, H, Tl), neg, q.dtype)
        denom = jnp.zeros((B, H, Tl), q.dtype)
        acc = jnp.zeros((B, H, Tl, Dh), q.dtype)
        perm = [(i, (i + 1) % S) for i in range(S)]
        kb, vb = k, v
        for step in range(S):
            origin = (idx - step) % S  # which shard kb/vb came from
            kpos = origin * Tl + jnp.arange(Tl)  # (Tl,)
            # scores (B, H, Tq, Tk)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, kb) * scale
            valid = kpos[None, :] < lengths[:, None]  # (B, Tk)
            mask = valid[:, None, None, :]
            if causal:
                mask = mask & (kpos[None, None, None, :]
                               <= qpos[None, None, :, None])
            s = jnp.where(mask, s, neg)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            denom = denom * corr + jnp.sum(p, axis=-1)
            acc = acc * corr[..., None] + jnp.einsum(
                "bhqk,bkhd->bhqd", p, vb
            )
            m = m_new
            if step < S - 1:
                kb, vb = jax.tree.map(
                    lambda t: jax.lax.ppermute(t, axis, perm), (kb, vb)
                )
        out = acc / jnp.maximum(denom[..., None], 1e-30)
        return jnp.transpose(out, (0, 2, 1, 3))  # (B, Tl, H, Dh)

    return shard_map(
        run, mesh=mesh,
        in_specs=(spec, spec, spec, P(None)),
        out_specs=spec, check_rep=False,
    )(q, k, v, lengths)
