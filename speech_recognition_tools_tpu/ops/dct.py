"""DCT-II with scipy.fftpack scaling (unnormalised), as blocked matmuls.

scipy.fftpack.dct(x) (type 2, norm=None) computes
    y[k] = 2 * sum_n x[n] cos(pi k (2n+1) / (2N)).

TPU rationale: XLA's FFT at non-power-of-two lengths (FDLP windows are
N = srate*fduration = 8000/24000/...) is ~4 orders of magnitude slower than
pow2 on v5e, and f64 FFT doesn't compile at all. An (N x N) cosine matmul
rides the MXU instead, works in f64 (software-emulated matmuls), and the
cosine blocks are generated on the fly so no O(N^2) constant is shipped
with the program.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("block", "dtype_name"))
def _dct2_blocked(x, block: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    n = x.shape[-1]
    xw = x.astype(dtype)
    nblocks = -(-n // block)
    npad = nblocks * block - n
    # integer dtype for the exact (2n+1)*k products: int32 when it fits
    # (always for windows <= ~1.5 s), else int64 (needs x64 enabled).
    idt = jnp.int32 if (2 * n + 1) * (nblocks * block) < 2**31 else jnp.int64
    karr = jnp.arange(nblocks * block, dtype=idt).reshape(nblocks, block)
    narr = 2 * jnp.arange(n, dtype=idt) + 1

    def one_block(k):
        # angle = pi*(2n+1)*k/(2N); fold the integer numerator mod 4N first
        # so the cosine argument stays in [0, 2pi) — emulated f64
        # transcendentals on TPU lose accuracy at large arguments, and the
        # reduction is exact in integer arithmetic.
        m = (narr[:, None] * k[None, :]) % (4 * n)
        cosmat = jnp.cos(m.astype(dtype) * (np.pi / (2.0 * n)))  # (N, block)
        return 2.0 * jnp.einsum(
            "...n,nk->...k", xw, cosmat, precision=jax.lax.Precision.HIGHEST
        )

    out = jax.lax.map(one_block, karr)  # (nblocks, ..., block)
    out = jnp.moveaxis(out, 0, -2).reshape(x.shape[:-1] + (nblocks * block,))
    if npad:
        out = out[..., :n]
    return out


def dct2(x: jax.Array, dtype=None, block: int = 1024) -> jax.Array:
    """Unnormalised DCT-II along the last axis (scipy.fftpack semantics).

    Args:
      x: (..., N) input.
      dtype: compute dtype (default: x.dtype). Pass jnp.float64 for the
        high-precision parity path.
      block: output-coefficient block size (memory/constant-size knob).
    """
    dtype = jnp.dtype(x.dtype if dtype is None else dtype)
    return _dct2_blocked(x, min(block, x.shape[-1]), dtype.name)
