"""Complex Hermitian linear algebra that lowers to TPU.

XLA on TPU does not lower complex `eigh`/`cholesky`/LU (the reference
pipelines this serves — nn-gev's per-bin `scipy.linalg.eigh` GEV loop and
nara-wpe's per-bin correlation solves — run them on CPU), so the repo's
enhancement stack has so far dropped to host numpy for every eigensolve
(enhance/beamforming.py docstring). This module removes that host
round-trip with the *real embedding*: a Hermitian H = A + iB (A symmetric,
B antisymmetric) maps to the real symmetric

    E(H) = [[A, -B],
            [B,  A]]   (2N x 2N)

whose spectrum is that of H with every eigenvalue doubled, and whose
eigenvector (x; y) for eigenvalue lam maps back to the complex eigenvector
x + iy of H. Real symmetric `eigh` and real SPD `cholesky` DO lower to TPU
(QDWH-eig / blocked Cholesky), so batched complex Hermitian eigensolves
and Hermitian-positive-definite solves become single fused XLA programs
over all frequency bins.

Caveats, documented rather than hidden:
  * Eigenvector phase is arbitrary (as with any eigh); callers must be
    phase-invariant (beamforming re-aligns phases explicitly).
  * For an eigenvalue of H with multiplicity m, E(H) has a 2m-dimensional
    eigenspace and the m complex vectors reconstructed from every other
    real column are only almost-surely complex-independent. Mask-weighted
    PSDs of real audio are almost surely simple; `eigh_c` is not suitable
    for exactly-degenerate inputs when the full eigenbasis matters.
    (`principal_eigvec_c` — all the beamformers need — is safe: any real
    vector in the top eigenspace maps to a valid top complex eigenvector.)
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def embed_hermitian(h):
    """Real symmetric embedding of a batched Hermitian matrix.

    h: (..., N, N) complex. Returns (..., 2N, 2N) real:
    [[Re h, -Im h], [Im h, Re h]].
    """
    a, b = jnp.real(h), jnp.imag(h)
    top = jnp.concatenate([a, -b], axis=-1)
    bot = jnp.concatenate([b, a], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _embed_rhs(b):
    """(..., N, K) complex -> (..., 2N, K) real, stacking (Re; Im)."""
    return jnp.concatenate([jnp.real(b), jnp.imag(b)], axis=-2)


def _unembed_vec(v):
    """(..., 2N, K) real -> (..., N, K) complex."""
    n = v.shape[-2] // 2
    return jax.lax.complex(v[..., :n, :], v[..., n:, :])


def eigh_c(h):
    """Batched complex Hermitian eigendecomposition on TPU.

    h: (..., N, N) Hermitian. Returns (w, V): eigenvalues (..., N)
    ascending and eigenvectors (..., N, N) complex, H V = V diag(w),
    columns unit-norm (phase arbitrary). See the module caveat about
    exactly-degenerate spectra.
    """
    n = h.shape[-1]
    w2, v2 = jnp.linalg.eigh(embed_hermitian(h))
    # doubled spectrum sorted ascending: one representative per pair
    w = w2[..., ::2]
    v = _unembed_vec(v2)[..., ::2]
    # the real column is unit in R^{2N} <=> x+iy unit in C^N; renormalize
    # anyway to absorb eigh's numerical slack
    nrm = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=-2, keepdims=True))
    return w, v / jnp.maximum(nrm, jnp.finfo(w.dtype).tiny)


def principal_eigvec_c(h):
    """Top eigenvector of a batched Hermitian matrix, (..., N) complex."""
    _, v = eigh_c(h)
    return v[..., -1]


def solve_hpd_c(a, b):
    """Solve A X = B for Hermitian positive-definite A, on TPU.

    a: (..., N, N) HPD complex; b: (..., N, K) complex.
    E(A) is real SPD, so the solve is one batched real Cholesky +
    triangular solves on the 2N embedding.
    """
    ea = embed_hermitian(a)
    eb = _embed_rhs(b)
    chol = jnp.linalg.cholesky(ea)
    x = jsl.cho_solve((chol, True), eb)
    return _unembed_vec(x)
