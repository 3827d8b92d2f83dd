"""Batched Levinson-Durbin recursion as a fixed-order lax.scan.

Solves the LPC normal equations T a = -r[1:p+1] where T is the (Hermitian)
Toeplitz autocorrelation matrix built from r[0:p] — the same system the
reference solves with scipy.linalg.solve_toeplitz
(`/root/reference/src/featgen/features.py:222-230` computeLpcFast).

TPU-first design notes:
  * The recursion is sequential in the order dimension (p <= ~150 steps) but
    every step is elementwise over the problem batch, so we scan over order
    and batch over (utterances x frames x bands) — thousands of lanes keep
    the VPU full.
  * No gathers inside the scan: the reversed views a_{i-j} and r_{i-j} that
    the textbook recursion indexes dynamically are carried as *shift-window
    registers* updated with static slice+concat each step (dynamic gathers
    inside scans are the slow path on TPU, and f64 gathers do not lower).
  * Lags are normalised by r[0] before the solve (scale-invariant; improves
    f32 conditioning), and the gain is rescaled afterwards.
  * Complex (Hermitian Toeplitz) inputs are supported for the
    complex-modulation path (keepreal=False in the reference).

The gain follows the reference formula *exactly*, including its off-by-one
quirk: gg = r[0] + sum(xlpc * r[1:p+2]) with xlpc = [1, a_1..a_p], i.e.
gg = r0 + r1 + sum_k a_k r_{k+1} (reference features.py:228), which differs
from the textbook prediction error r0 + sum a_k r_k. We replicate it for
numeric parity.
"""

import jax
import jax.numpy as jnp


def levinson_durbin(
    r: jax.Array, order: int, return_error: bool = False, unroll: int = 1
):
    """Levinson-Durbin solve of the Yule-Walker system.

    Args:
      r: (..., >= order+1) autocorrelation lags (real or complex; complex is
        treated as Hermitian Toeplitz, matching scipy solve_toeplitz's
        r = conj(c) default).
      order: LPC order p (static).
      return_error: also return the final prediction error E_p (normalised
        by r0; the unnormalised error is E_p * r0).
      unroll: lax.scan unroll factor. The scan is HBM-bound on its three
        (lanes, p) carry buffers; unrolling lets XLA fuse consecutive
        steps so the carries stay in VMEM across the fused block.

    Returns:
      a: (..., order) predictor coefficients solving T a = -r[1:p+1]
      (and optionally e: (...,) normalised prediction error).
    """
    iscomplex = jnp.iscomplexobj(r)
    r0 = r[..., 0]
    safe_r0 = jnp.where(r0 == 0, jnp.ones_like(r0), r0)
    rn = r[..., 1 : order + 1] / safe_r0[..., None]  # normalised lags 1..p

    batch_shape = rn.shape[:-1]
    p = order
    a0 = jnp.zeros(batch_shape + (p,), rn.dtype)
    # u window: u[m] = a_{i-m} (reversed predictor, anchored at current i).
    # No lag window is carried: since u[m] = a_{i-m}, the Levinson inner
    # product re-indexes onto the *static* lag vector,
    #   sum_{j=1}^{i-1} a_j rn_{i-j} = sum_{m=1}^{i-1} u[m] rn_m,
    # so the step dots u with the scan-invariant rn instead of carrying a
    # shifted copy of it (one less (batch, p) carry to stream per step —
    # the scan is HBM-bound on exactly that traffic).
    u0 = jnp.zeros(batch_shape + (p,), rn.dtype)
    e0 = jnp.ones(batch_shape, rn.dtype)
    eye = jnp.eye(p, dtype=rn.dtype)

    # scan consumes lag i (= rn[..., i-1]) and the one-hot row for position i
    rn_t = jnp.moveaxis(rn, -1, 0)  # (p, ...)

    def step(carry, xs):
        a, u, e = carry
        r_i, onehot = xs  # r_i: (...,); onehot: (p,)
        # acc = sum_m u[m] * rn_m  (u[m] zero for m >= i keeps garbage out)
        acc = jnp.sum(u * rn, axis=-1)
        tiny = jnp.finfo(e.real.dtype).tiny
        if iscomplex:
            e_safe = jnp.where(jnp.abs(e) < tiny, tiny, e)
        else:
            e_safe = jnp.where(e < tiny, tiny, e)
        k = -(r_i + acc) / e_safe
        # stability clamp: |k| < 1 holds mathematically for any valid
        # autocorrelation, but once rounding pushes e towards zero (fully
        # predictable narrowband/silent bands in f32) |k| can cross 1,
        # flipping e negative and exploding the polynomial — which then
        # overflows the downstream cepstrum recursion. Clamping to the
        # stable region is inert on healthy inputs and keeps the model
        # minimum-phase on degenerate ones.
        kmax = jnp.asarray(1.0 - 16.0 * jnp.finfo(e.real.dtype).eps, k.real.dtype)
        if iscomplex:
            kmag = jnp.abs(k)
            k = jnp.where(kmag > kmax, k * (kmax / jnp.maximum(kmag, tiny)), k)
        else:
            k = jnp.clip(k, -kmax, kmax)
        u_c = jnp.conj(u) if iscomplex else u
        # a'_j = a_j + k a_{i-j} (j<i), a'_i = k: u[m]=a_{i-m} is zero for
        # m >= i, and the one-hot writes position i.
        a_new = a + k[..., None] * u_c + k[..., None] * onehot
        if iscomplex:
            e_new = e * (1.0 - k * jnp.conj(k))
        else:
            e_new = e * (1.0 - k * k)
        # advance windows to anchor i+1:
        # u'[1] = a'_i = k ; u'[m] = a'_{i+1-m} = u[m-1] + k*conj(a_{m-1})
        a_c = jnp.conj(a) if iscomplex else a
        u_shift = jnp.concatenate([k[..., None], u[..., :-1]], axis=-1)
        a_head = jnp.concatenate(
            [jnp.zeros(batch_shape + (1,), a.dtype), a_c[..., :-1]], axis=-1
        )
        u_new = u_shift + k[..., None] * a_head
        return (a_new, u_new, e_new), None

    (a, _, e), _ = jax.lax.scan(
        step, (a0, u0, e0), (rn_t, eye), unroll=unroll
    )
    if return_error:
        return a, e
    return a


def lpc_from_autocorr(
    r: jax.Array, order: int, unroll: int = 1
) -> tuple[jax.Array, jax.Array]:
    """LPC coefficients + gain with the reference's exact gain formula.

    Args:
      r: (..., >= order+2) autocorrelation lags.
      order: LPC order p.

    Returns:
      xlpc: (..., order+1) = [1, a_1..a_p].
      gg:   (...,) gain, gg = r0 + sum(xlpc * r[1:p+2])  (reference quirk).

    Robustness: on near-singular bands (e.g. band-limited or silent input)
    float32 cancellation can drive the quirk gain negative, which would NaN
    the downstream log. Where that happens (and only there — parity is
    untouched on healthy bands) we fall back to the recursion's own
    prediction error E_p * r0, which is non-negative by construction.
    """
    a, e = levinson_durbin(r, order, return_error=True, unroll=unroll)
    one = jnp.ones(r.shape[:-1] + (1,), a.dtype)
    xlpc = jnp.concatenate([one, a], axis=-1)
    gg = r[..., 0] + jnp.sum(xlpc * r[..., 1 : order + 2], axis=-1)
    if not jnp.iscomplexobj(gg):
        fallback = jnp.maximum(jnp.real(e) * jnp.real(r[..., 0]), 0.0)
        tiny = jnp.asarray(jnp.finfo(fallback.dtype).tiny, fallback.dtype)
        gg = jnp.where(gg > 0, gg, jnp.maximum(fallback, tiny))
    return xlpc, gg
