"""Fused Pallas TPU kernel: autocorrelation lags -> LPC -> cepstra.

The FDLP chain has exactly two sequential recursions — Levinson-Durbin
(ops/levinson.py) and the LPC->cepstrum triangular recursion
(ops/cepstrum.py); everything else is matmul-shaped. As separate XLA scans
they are two program-level sequential regions whose carries round-trip
through HBM between them (the (P, order+1) polynomial + gain). This kernel
fuses the whole chain per block of problems: the predictor/window/cepstrum
registers stay resident in VMEM and both recursions run in-core, one
(block, width) VPU op per step.

Numerics follow ops/levinson.lpc_from_autocorr + ops/cepstrum.lpc_to_cepstrum
exactly (reference parity: features.py:222-246 computeLpcFast +
computeModSpecFromLpc, including the gain quirk gg = r0 + sum(xlpc*r[1:p+2])
and the negative-gain fallback to the recursion's own prediction error).
f32 only — the f64 high-precision parity path stays on the XLA scans (f64
is unsupported in Mosaic on v5e).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lpc_cepstra_kernel(r_ref, cep_ref, *, order: int, lim: int):
    # r_ref: (BLK, order+2); cep_ref: (BLK, lim)
    r = r_ref[:]
    blk = r.shape[0]
    p = order
    r0 = r[:, 0:1]
    safe_r0 = jnp.where(r0 == 0, 1.0, r0)
    rn = r[:, 1 : p + 1] / safe_r0  # (BLK, p) normalised lags

    col = jax.lax.broadcasted_iota(jnp.int32, (blk, p), dimension=1)

    # ---- Levinson-Durbin (see ops/levinson.py for the window derivation) --
    def lev_step(i, carry):
        a, u, s, e = carry
        acc = jnp.sum(a * s, axis=1, keepdims=True)
        # dynamic_slice of values doesn't lower in Mosaic; extract lag i
        # with a masked reduction (one VPU op per step)
        r_i = jnp.sum(jnp.where(col == (i - 1), rn, 0.0), axis=1, keepdims=True)
        tiny = jnp.float32(1e-37)
        e_safe = jnp.where(e < tiny, tiny, e)
        k = -(r_i + acc) / e_safe
        kmax = jnp.float32(1.0 - 16.0 * jnp.finfo(jnp.float32).eps)
        k = jnp.clip(k, -kmax, kmax)
        onehot = (col == (i - 1)).astype(jnp.float32)
        a_new = a + k * u + k * onehot
        e_new = e * (1.0 - k * k)
        u_shift = jnp.concatenate([k, u[:, :-1]], axis=1)
        a_head = jnp.concatenate(
            [jnp.zeros((blk, 1), jnp.float32), a[:, :-1]], axis=1
        )
        u_new = u_shift + k * a_head
        s_new = jnp.concatenate([r_i, s[:, :-1]], axis=1)
        return a_new, u_new, s_new, e_new

    a0 = jnp.zeros((blk, p), jnp.float32)
    u0 = jnp.zeros((blk, p), jnp.float32)
    s0 = jnp.zeros((blk, p), jnp.float32)
    e0 = jnp.ones((blk, 1), jnp.float32)
    a, _, _, e = jax.lax.fori_loop(1, p + 1, lev_step, (a0, u0, s0, e0))

    # ---- gain (reference quirk) + negative-gain fallback ----
    # xlpc = [1, a]; gg = r0 + sum(xlpc * r[1:p+2]) = r0 + r1 + sum a_k r_{k+2-1}
    gg = r0 + r[:, 1:2] + jnp.sum(a * r[:, 2 : p + 2], axis=1, keepdims=True)
    fallback = jnp.maximum(e * r0, 0.0)
    tiny = jnp.float32(1.1754944e-38)
    gg = jnp.where(gg > 0, gg, jnp.maximum(fallback, tiny))

    # ---- cepstrum recursion (ops/cepstrum.py) ----
    # b over indices 0..lim-1: b[0]=1, b[n]=-a[n-1] for n-1 < p, else 0
    if p >= lim - 1:
        b_tail = -a[:, : lim - 1]
    else:
        b_tail = jnp.concatenate(
            [-a, jnp.zeros((blk, lim - 1 - p), jnp.float32)], axis=1
        )
    b = jnp.concatenate([jnp.ones((blk, 1), jnp.float32), b_tail], axis=1)

    colL = jax.lax.broadcasted_iota(jnp.int32, (blk, lim), dimension=1)
    # window slots m = 1..lim-1 (value at index m-1)
    m_vals = (
        jax.lax.broadcasted_iota(jnp.int32, (blk, lim - 1), dimension=1) + 1
    ).astype(jnp.float32)
    m_idx = jax.lax.broadcasted_iota(jnp.int32, (blk, lim - 1), dimension=1)

    cep0 = jnp.log(jnp.sqrt(gg))  # (BLK, 1)
    b1 = b[:, 1:2]
    cep_init = (
        cep0 * (colL == 0).astype(jnp.float32)
        + b1 * (colL == 1).astype(jnp.float32)
    )
    # win[m] = b[n-m]; init for n=2: [b1, b0, 0, ...]
    win_init = b1 * (m_idx == 0).astype(jnp.float32) + jnp.where(
        m_idx == 1, 1.0, 0.0
    )

    def cep_step(n, carry):
        cep, win = carry
        nf = n.astype(jnp.float32)
        w = (m_vals / nf) * (m_vals < nf).astype(jnp.float32)
        acc = jnp.sum(w * win * cep[:, 1:lim], axis=1, keepdims=True)
        b_n = jnp.sum(jnp.where(colL == n, b, 0.0), axis=1, keepdims=True)
        c_n = acc + b_n
        cep = cep + c_n * (colL == n).astype(jnp.float32)
        win = jnp.concatenate([b_n, win[:, :-1]], axis=1)
        return cep, win

    cep = cep_init
    if lim > 2:
        cep, _ = jax.lax.fori_loop(2, lim, cep_step, (cep_init, win_init))
    cep_ref[:] = cep


@partial(jax.jit, static_argnames=("order", "lim", "block", "interpret"))
def lpc_cepstra_pallas(
    r: jax.Array,
    order: int,
    lim: int,
    block: int = 512,
    interpret: bool = False,
):
    """Fused lags -> LPC -> cepstra on TPU.

    Args:
      r: (P, >= order+2) float32 autocorrelation lags.
      order: LPC order (static).
      lim: number of cepstral coefficients (static).
      block: problems per grid step (multiple of 8 sublanes).

    Returns cep: (P, lim) float32, matching
    lpc_to_cepstrum(*lpc_from_autocorr(r, order), lim).
    """
    P = r.shape[0]
    r = r[:, : order + 2].astype(jnp.float32)
    pad = (-P) % block
    if pad:
        # pad rows solve a trivial system (r = [1, 0, ...])
        filler = jnp.zeros((pad, r.shape[1]), r.dtype).at[:, 0].set(1.0)
        r = jnp.concatenate([r, filler], axis=0)
    grid = (r.shape[0] // block,)
    out = pl.pallas_call(
        partial(_lpc_cepstra_kernel, order=order, lim=lim),
        out_shape=jax.ShapeDtypeStruct((r.shape[0], lim), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block, r.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (block, lim), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(r)
    return out[:P]
