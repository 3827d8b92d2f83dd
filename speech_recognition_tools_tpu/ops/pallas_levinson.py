"""Pallas TPU kernel: batched Levinson-Durbin recursion.

The LPC solve is the one genuinely sequential op in the FDLP chain (order-p
recurrence; everything around it is matmul/FFT-shaped). The XLA lax.scan
version (ops/levinson.py) materialises carry updates through HBM between
scan steps; this kernel keeps the predictor/window registers resident in
VMEM for a whole problem block and runs the order loop in-core, one
(block, order) vector op per step on the VPU.

Shapes: r (P, order+2) float32 -> a (P, order) with P padded to the block
size. Used by the fast (f32) path; the f64 parity path stays on the XLA
scan (f64 in Pallas is unsupported on v5e).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _levinson_kernel(r_ref, a_ref, *, order: int):
    # r_ref: (BLK, order+2); a_ref: (BLK, order)
    r = r_ref[:]
    r0 = r[:, 0:1]
    safe_r0 = jnp.where(r0 == 0, 1.0, r0)
    rn = r[:, 1 : order + 1] / safe_r0  # (BLK, p)

    blk = rn.shape[0]
    p = order
    col = jax.lax.broadcasted_iota(jnp.int32, (blk, p), dimension=1)

    def step(i, carry):
        a, u, s, e = carry
        # window s holds rn lags (i-1-m) style; see ops/levinson.py derivation
        acc = jnp.sum(a * s, axis=1, keepdims=True)
        # dynamic_slice of values doesn't lower in Pallas TPU; extract lag i
        # with a masked reduction instead (one VPU op per step)
        r_i = jnp.sum(
            jnp.where(col == (i - 1), rn, 0.0), axis=1, keepdims=True
        )
        tiny = jnp.float32(1e-37)
        e_safe = jnp.where(e < tiny, tiny, e)
        k = -(r_i + acc) / e_safe  # (BLK, 1)
        onehot = (col == (i - 1)).astype(jnp.float32)
        a_new = a + k * u + k * onehot
        e_new = e * (1.0 - k * k)
        # u' = [k, u[:-1]] + k * [0, a[:-1]]
        u_shift = jnp.concatenate([k, u[:, :-1]], axis=1)
        a_head = jnp.concatenate([jnp.zeros((blk, 1), jnp.float32), a[:, :-1]], axis=1)
        u_new = u_shift + k * a_head
        s_new = jnp.concatenate([r_i, s[:, :-1]], axis=1)
        return a_new, u_new, s_new, e_new

    a0 = jnp.zeros((blk, p), jnp.float32)
    u0 = jnp.zeros((blk, p), jnp.float32)
    s0 = jnp.zeros((blk, p), jnp.float32)
    e0 = jnp.ones((blk, 1), jnp.float32)
    a, _, _, _ = jax.lax.fori_loop(1, p + 1, step, (a0, u0, s0, e0))
    a_ref[:] = a


@partial(jax.jit, static_argnames=("order", "block", "interpret"))
def levinson_durbin_pallas(
    r: jax.Array, order: int, block: int = 1024, interpret: bool = False
):
    """Levinson-Durbin via a Pallas TPU kernel.

    Args:
      r: (P, >= order+1) float32 autocorrelation lags.
      order: LPC order (static).
      block: problems per grid step (padded; multiple of 8 sublanes).

    Returns a: (P, order) predictor coefficients (same convention as
    ops.levinson.levinson_durbin).
    """
    P = r.shape[0]
    r = r[:, : order + 2].astype(jnp.float32)
    pad = (-P) % block
    if pad:
        filler = jnp.zeros((pad, r.shape[1]), r.dtype).at[:, 0].set(1.0)
        r = jnp.concatenate([r, filler], axis=0)
    grid = (r.shape[0] // block,)
    out = pl.pallas_call(
        partial(_levinson_kernel, order=order),
        out_shape=jax.ShapeDtypeStruct((r.shape[0], order), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block, r.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (block, order), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(r)
    return out[:P]
