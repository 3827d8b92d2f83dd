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

# recursion steps per fori iteration (amortises Mosaic loop overhead)
_STEP_UNROLL = 5


def _lpc_cepstra_kernel(r_ref, cep_ref, *, order: int, lim: int,
                        unity_gain: bool = False):
    # r_ref: (BLK, order+2); cep_ref: (BLK, lim)
    r = r_ref[:]
    blk = r.shape[0]
    p = order
    r0 = r[:, 0:1]
    safe_r0 = jnp.where(r0 == 0, 1.0, r0)
    rn = r[:, 1 : p + 1] / safe_r0  # (BLK, p) normalised lags

    # ---- Levinson-Durbin (see ops/levinson.py for the window derivation).
    # Per-step VPU pass count is the throughput limiter (the Pallas grid
    # is a *sequential* loop on the TensorCore), so every step is built
    # from shift-concats and one fused multiply-reduce — no masked
    # reductions or one-hot writes:
    #   * rbuf rotates the normalised lags so the current lag is always
    #     column 0 (a static slice instead of a masked extraction);
    #   * u is seeded with the implicit a_0 = 1 at index 0, which makes
    #     a' = a + k*u produce the new coefficient a'_i = k at position
    #     i-1 with no one-hot term (the 1 rides the shift register);
    #   * u' = [k, u[:-1]] + k*[0, a[:-1]] == [k, (u + k*a)[:-1]]
    #     merges the two shift-concats into one.
    def lev_body(carry):
        a, u, s, e, rbuf = carry
        r_i = rbuf[:, 0:1]
        acc = jnp.sum(a * s, axis=1, keepdims=True)
        tiny = jnp.float32(1e-37)
        e_safe = jnp.where(e < tiny, tiny, e)
        k = -(r_i + acc) / e_safe
        kmax = jnp.float32(1.0 - 16.0 * jnp.finfo(jnp.float32).eps)
        k = jnp.clip(k, -kmax, kmax)
        u_new = jnp.concatenate([k, (u + k * a)[:, :-1]], axis=1)
        a_new = a + k * u
        e_new = e * (1.0 - k * k)
        s_new = jnp.concatenate([r_i, s[:, :-1]], axis=1)
        rbuf_new = jnp.concatenate(
            [rbuf[:, 1:], jnp.zeros((blk, 1), jnp.float32)], axis=1
        )
        return a_new, u_new, s_new, e_new, rbuf_new

    a0 = jnp.zeros((blk, p), jnp.float32)
    u0 = (
        jax.lax.broadcasted_iota(jnp.int32, (blk, p), dimension=1) == 0
    ).astype(jnp.float32)
    s0 = jnp.zeros((blk, p), jnp.float32)
    e0 = jnp.ones((blk, 1), jnp.float32)
    # fori_loop (Mosaic rejects lax.scan carries) with the body manually
    # unrolled _STEP_UNROLL x: the loop's per-iteration overhead is a
    # large fraction of the step cost (measured 18.3 -> 14.5 ms at 23k
    # lanes / order 150 going 1 -> 5 steps per iteration; Mosaic's own
    # unroll only supports 1 or full, and full OOMs scoped VMEM).
    def lev_multi(_, carry):
        for _ in range(_STEP_UNROLL):
            carry = lev_body(carry)
        return carry

    carry = (a0, u0, s0, e0, rn)
    if p >= _STEP_UNROLL:
        carry = jax.lax.fori_loop(0, p // _STEP_UNROLL, lev_multi, carry)
    for _ in range(p % _STEP_UNROLL):
        carry = lev_body(carry)
    a, _, _, e, _ = carry

    # ---- gain (reference quirk) + negative-gain fallback ----
    # xlpc = [1, a]; gg = r0 + sum(xlpc * r[1:p+2]) = r0 + r1 + sum a_k r_{k+2-1}
    gg = r0 + r[:, 1:2] + jnp.sum(a * r[:, 2 : p + 2], axis=1, keepdims=True)
    fallback = jnp.maximum(e * r0, 0.0)
    tiny = jnp.float32(1.1754944e-38)
    gg = jnp.where(gg > 0, gg, jnp.maximum(fallback, tiny))
    if unity_gain:  # modspec --set_unity_gain (cep0 becomes 0)
        gg = jnp.ones_like(gg)

    # ---- cepstrum recursion (ops/cepstrum.py) ----
    # b over indices 0..lim-1: b[0]=1, b[n]=-a[n-1] for n-1 < p, else 0
    if p >= lim - 1:
        b_tail = -a[:, : lim - 1]
    else:
        b_tail = jnp.concatenate(
            [-a, jnp.zeros((blk, lim - 1 - p), jnp.float32)], axis=1
        )
    b = jnp.concatenate([jnp.ones((blk, 1), jnp.float32), b_tail], axis=1)

    cep0 = jnp.log(jnp.sqrt(gg))  # (BLK, 1)
    if lim == 1:
        cep_ref[:] = cep0  # single coefficient: reversed == identity
        return

    # Reversed-prepend register: cepR[j] = c_{n-1-j} on entry to step n,
    # so the recursion
    #   c_n = sum_{m=1}^{n-1} (m/n) b[n-m] c_m + b[n]
    # becomes (with j = n-1-m) one fused multiply-reduce against the
    # *static* vector b[1:] — no per-step masked extraction — and the
    # append is a shift-concat. b[n] rides its own rotating buffer.
    zcol = jnp.zeros((blk, 1), jnp.float32)
    cepR = jnp.concatenate(
        [b[:, 1:2], cep0] + ([jnp.zeros((blk, lim - 2), jnp.float32)]
                             if lim > 2 else []),
        axis=1,
    )
    bb = b[:, 1:lim]  # (BLK, lim-1), constant through the loop
    jvec = jax.lax.broadcasted_iota(
        jnp.int32, (blk, lim - 1), dimension=1
    ).astype(jnp.float32)
    if lim > 2:
        bbuf = jnp.concatenate(
            [b[:, 2:lim], jnp.zeros((blk, 2), jnp.float32)], axis=1
        )

        def cep_body(carry):
            cepR, bbuf, nf = carry
            w = jnp.maximum(nf - 1.0 - jvec, 0.0) / nf
            acc = jnp.sum(
                w * bb * cepR[:, : lim - 1], axis=1, keepdims=True
            )
            c_n = acc + bbuf[:, 0:1]
            cepR = jnp.concatenate([c_n, cepR[:, :-1]], axis=1)
            bbuf = jnp.concatenate([bbuf[:, 1:], zcol], axis=1)
            return cepR, bbuf, nf + 1.0

        def cep_multi(_, carry):
            for _ in range(_STEP_UNROLL):
                carry = cep_body(carry)
            return carry

        ccarry = (cepR, bbuf, jnp.float32(2.0))
        if lim - 2 >= _STEP_UNROLL:
            ccarry = jax.lax.fori_loop(
                0, (lim - 2) // _STEP_UNROLL, cep_multi, ccarry
            )
        for _ in range((lim - 2) % _STEP_UNROLL):
            ccarry = cep_body(ccarry)
        cepR, _, _ = ccarry
    # written REVERSED (cep_ref[j] = c_{lim-1-j}); lax.rev doesn't lower
    # in Mosaic, so the caller flips with a plain XLA slice.
    cep_ref[:] = cepR


@partial(jax.jit, static_argnames=("order", "lim", "block", "interpret",
                                  "unity_gain"))
def lpc_cepstra_pallas(
    r: jax.Array,
    order: int,
    lim: int,
    block: int = 512,
    interpret: bool = False,
    unity_gain: bool = False,
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
    # index maps wrapped to int32: under jax_enable_x64 a plain
    # `lambda i: (i, 0)` returns int64 block indices, which Mosaic fails
    # to legalize ('func.return').
    imap = lambda i: (jnp.int32(i), jnp.int32(0))
    out = pl.pallas_call(
        partial(_lpc_cepstra_kernel, order=order, lim=lim,
                unity_gain=unity_gain),
        out_shape=jax.ShapeDtypeStruct((r.shape[0], lim), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block, r.shape[1]), imap, memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (block, lim), imap, memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(r)
    return out[:P, ::-1]
