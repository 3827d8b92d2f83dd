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
    r: jax.Array, order: int, unroll: int = 1, block: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """LPC coefficients + gain with the reference's exact gain formula.

    Args:
      r: (..., >= order+2) autocorrelation lags.
      order: LPC order p.
      unroll: scan unroll factor (scan solver only).
      block: if set (real lags only), solve with the blocked
        Schur/Szego recursion `levinson_durbin_blocked(block=block)`
        instead of the scan — ~1.7x faster for the f64 high path at
        production shapes, agreement is machine-eps.

    Returns:
      xlpc: (..., order+1) = [1, a_1..a_p].
      gg:   (...,) gain, gg = r0 + sum(xlpc * r[1:p+2])  (reference quirk).

    Robustness: on near-singular bands (e.g. band-limited or silent input)
    float32 cancellation can drive the quirk gain negative, which would NaN
    the downstream log. Where that happens (and only there — parity is
    untouched on healthy bands) we fall back to the recursion's own
    prediction error E_p * r0, which is non-negative by construction.
    """
    if block is not None and not jnp.iscomplexobj(r):
        a, e = levinson_durbin_blocked(r, order, block=block, return_error=True)
    else:
        a, e = levinson_durbin(r, order, return_error=True, unroll=unroll)
    one = jnp.ones(r.shape[:-1] + (1,), a.dtype)
    xlpc = jnp.concatenate([one, a], axis=-1)
    gg = r[..., 0] + jnp.sum(xlpc * r[..., 1 : order + 2], axis=-1)
    if not jnp.iscomplexobj(gg):
        fallback = jnp.maximum(jnp.real(e) * jnp.real(r[..., 0]), 0.0)
        tiny = jnp.asarray(jnp.finfo(fallback.dtype).tiny, fallback.dtype)
        gg = jnp.where(gg > 0, gg, jnp.maximum(fallback, tiny))
    return xlpc, gg


def _theta_apply(x, y, t00, t01, t10, t11, bc: int, want_y: bool = True):
    """(conv(t00,x)+conv(t01,y) [, conv(t10,x)+conv(t11,y)]) truncated to
    len(x), as a chain of static-shift multiply-adds.

    x, y: (..., n); t_*: (..., bc+1). The (bc+1)-term pad+add chain is
    the fastest f64 lowering found on the axon TPU compiler: tiled
    per-problem MXU matmuls for the same contraction lower to an
    effectively scalar loop over the batch (~500 ms for 0.7 GFLOP),
    ~80x slower than this elementwise form (NOTES.md).
    """
    n = x.shape[-1]
    outx = []
    outy = []
    for d in range(bc + 1):
        cx = x[..., : n - d]
        cy = y[..., : n - d]
        pad = [(0, 0)] * (x.ndim - 1) + [(d, 0)]
        outx.append(jnp.pad(t00[..., d : d + 1] * cx
                            + t01[..., d : d + 1] * cy, pad))
        if want_y:
            outy.append(jnp.pad(t10[..., d : d + 1] * cx
                                + t11[..., d : d + 1] * cy, pad))
    if want_y:
        return sum(outx), sum(outy)
    return sum(outx), None


def levinson_durbin_blocked(
    r: jax.Array, order: int, block: int = 15, return_error: bool = False
):
    """Blocked Schur/Szego Levinson-Durbin (real lags only).

    Mathematically identical to `levinson_durbin` (same reflection
    coefficients, same predictor; agreement is machine-eps — see
    tests/test_ops.py::TestBlockedLevinson), but restructured for TPU.
    The plain scan streams every (batch, order) carry through HBM on
    each of the `order` steps. This version exploits the Schur form of
    the recursion: with generators
      phi_i[n] = sum_j a_{i,j} r_{n-j},  psi_i[n] = sum_j b_{i,j} r_{n-j}
    (b_i the backward predictor), the step i -> i+1 is the SAME 2x2
    polynomial map for both the generator pair and the predictor pair:
      phi' = phi + k (z psi),   psi' = (z psi) + k phi,
      a'   = a   + k (z b),     b'   = (z b)   + k a,
    with k_{i+1} = -phi_i[i+1] / e_i. Reflection coefficients for a
    block of `block` consecutive steps depend only on a (batch, block)
    *window* of the generators, so each block:
      1. runs `block` cheap steps on the windows (a short lax.scan on
         tiny arrays), accumulating the block's 2x2 transfer matrix
         Theta (polynomial coefficients, degree <= block);
      2. advances the full-length state ONCE by applying Theta as a
         (block+1)-term static-shift multiply-add chain (_theta_apply)
         — touching each (batch, order) array once per block instead of
         once per step (~block x less HBM traffic, which is what bounds
         the f64 high-precision path). Measured on the v5e at the
         production shape (23040 lanes, p=150): 86 ms scan:unroll=4 ->
         51 ms blocked B=15, bit-exact to ~2e-14. B in 10..30 is flat;
         B>=50 regresses (the apply chain's O(B) pad terms win over the
         saved traffic).
    Theta is applied to the generators' live tail (entries >= current
    order) and the predictor's live head (nonzero coefficients so far),
    so per-block apply cost stays roughly constant. The backward
    predictor b is NOT carried: b_i is the coefficient reversal of a_i
    (real Szego pair), so each block re-derives it with a static flip —
    one less full-length apply pair.

    Numerical guards match `levinson_durbin`'s formulas (tiny-floor on
    the carried e, |k| clamp into the stable region, e' = e (1 - k^2));
    guarded k's flow into Theta, so degenerate bands stay bounded (e is
    non-negative, coefficients don't overflow the downstream cepstrum).
    On such bands the *values* decohere from the scan: once e underflows
    towards 0 (silent/pure-tone inputs), k = -num/e divides rounding
    noise, and the blocked numerator (incrementally propagated phi) and
    the scan's (fresh dot with the predictor) round differently — no
    reordered arithmetic can match there. Healthy autocorrelations agree
    to machine eps (tests/test_ops.py::TestBlockedLevinson).

    Args:
      r: (..., >= order+1) real autocorrelation lags.
      order: LPC order p (static).
      block: steps per block (static).
      return_error: also return E_p (normalised by r0), the same
        quantity the scan's carry accumulates.

    Returns: a (..., order) [, e (...,)] — same convention as
      `levinson_durbin`.
    """
    if jnp.iscomplexobj(r):
        raise NotImplementedError(
            "levinson_durbin_blocked is real-only; use levinson_durbin"
        )
    r0 = r[..., 0]
    safe_r0 = jnp.where(r0 == 0, jnp.ones_like(r0), r0)
    rn = r[..., 1 : order + 1] / safe_r0[..., None]
    batch = rn.shape[:-1]
    dt = rn.dtype
    p = order
    tiny = jnp.finfo(dt).tiny
    kmax = jnp.asarray(1.0 - 16.0 * jnp.finfo(dt).eps, dt)

    one = jnp.ones(batch + (1,), dt)
    rn1 = jnp.concatenate([one, rn], axis=-1)  # normalised lags 0..p
    # live tails, both based at the current order i (phi[i..p], psi[i..p]);
    # psi's Theta-advance reads phi one position below phi's window, so phi
    # keeps that base entry too.
    phi = rn1
    psi = rn1
    a = one  # predictor live head, degree 0

    def block_steps(wphi, wpsi, e, bc):
        """Run bc window steps; return Theta coeffs + updated e.

        wphi[l] = phi[i+1+l], wpsi[l] = psi[i+l], both length bc.
        """
        t00 = jnp.zeros(batch + (bc + 1,), dt).at[..., 0].set(1.0)
        t11 = t00
        t01 = jnp.zeros(batch + (bc + 1,), dt)
        t10 = t01

        def shift1(v):
            pad = jnp.zeros(v.shape[:-1] + (1,), v.dtype)
            return jnp.concatenate([pad, v[..., :-1]], axis=-1)

        def step(carry, onehot):
            wphi, wpsi, e, t00, t01, t10, t11 = carry
            e_safe = jnp.where(e < tiny, tiny, e)
            num = jnp.sum(wphi * onehot, axis=-1)
            k = jnp.clip(-num / e_safe, -kmax, kmax)
            e = e * (1.0 - k * k)
            kk = k[..., None]
            wphi, wpsi = wphi + kk * wpsi, shift1(wpsi + kk * wphi)
            t00, t01, t10, t11 = (
                t00 + kk * shift1(t10),
                t01 + kk * shift1(t11),
                kk * t00 + shift1(t10),
                kk * t01 + shift1(t11),
            )
            return (wphi, wpsi, e, t00, t01, t10, t11), None

        eye = jnp.eye(bc, dtype=dt)
        carry, _ = jax.lax.scan(
            step, (wphi, wpsi, e, t00, t01, t10, t11), eye
        )
        _, _, e, t00, t01, t10, t11 = carry
        return t00, t01, t10, t11, e

    e = jnp.ones(batch, dt)
    i = 0
    while i < p:
        bc = min(block, p - i)
        t00, t01, t10, t11, e = block_steps(
            phi[..., 1 : 1 + bc], psi[..., :bc], e, bc
        )
        # The Theta coefficients feed two applies of different lengths
        # (generator tail + predictor head). The axon TPU compiler's f64
        # emulation crashes when one tensor feeds both band einsums
        # (reduced repro in NOTES.md); an optimization_barrier splits the
        # consumers onto distinct tensors, which compiles fine.
        th2 = jax.lax.optimization_barrier((t00, t01, t10, t11))
        # advance generators (drop the bc consumed positions afterwards)
        phi, psi = _theta_apply(phi, psi, t00, t01, t10, t11, bc)
        phi = phi[..., bc:]
        psi = psi[..., bc:]
        # advance the predictor: b_i = flip(a_i) (real Szego pair)
        grow = jnp.zeros(batch + (bc,), dt)
        a_ext = jnp.concatenate([a, grow], axis=-1)
        b_ext = jnp.concatenate([a[..., ::-1], grow], axis=-1)
        a, _ = _theta_apply(a_ext, b_ext, *th2, bc, want_y=False)
        i += bc

    out_a = a[..., 1 : p + 1]
    if return_error:
        return out_a, e
    return out_a
