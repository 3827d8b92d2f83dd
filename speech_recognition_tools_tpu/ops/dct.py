"""DCT-II with scipy.fftpack scaling (unnormalised): Bluestein fast path
+ blocked-matmul fallback.

scipy.fftpack.dct(x) (type 2, norm=None) computes
    y[k] = 2 * sum_n x[n] cos(pi k (2n+1) / (2N)).

TPU rationale: XLA's FFT at non-power-of-two lengths (FDLP windows are
N = srate*fduration = 8000/24000/...) is ~4 orders of magnitude slower
than pow2 on v5e, and f64 FFT doesn't compile at all. Two paths:

  * f32 fast path: Makhoul's even/odd-reversed reordering turns the
    DCT-II into a length-N DFT, which Bluestein's identity
    (pi (k-n)^2 = pi k^2 + pi n^2 - 2 pi k n) converts to a *linear
    convolution* evaluated with power-of-two FFTs (length >= 2N-1) —
    O(N log N) with only TPU-fast pow2 FFTs. Chirp phases are reduced
    mod 2N in exact integer arithmetic host-side.
  * f64 / odd-N fallback: an (N x N) cosine matmul riding the MXU
    (software-emulated f64), cosine blocks generated on the fly so no
    O(N^2) constant is shipped with the program.
"""

from functools import lru_cache, partial

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


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@lru_cache(maxsize=16)
def _bluestein_consts(n: int):
    """Host f64 chirp constants with exact integer phase reduction.

    Returns (chirp, c, Bf, M): chirp[j] = e^{-i pi j^2/N} (input chirp),
    c[k] = 2 * e^{-i pi k/(2N)} * chirp[k] (combines the DCT post-twiddle
    with Bluestein's output chirp), Bf = FFT_M of the wrapped chirp
    b[m] = e^{+i pi m^2/N} with M pow2 >= 2N-1.
    """
    m = _next_pow2(2 * n - 1)
    # pi j^2 / N phases are periodic in j^2 mod 2N — reduce exactly
    j2 = np.array([(j * j) % (2 * n) for j in range(n)], np.float64)
    chirp = np.exp(-1j * np.pi * j2 / n)
    post = np.exp(-1j * np.pi * np.arange(n) / (2.0 * n))
    c = 2.0 * post * chirp
    b = np.zeros(m, np.complex128)
    b[:n] = np.conj(chirp)                       # e^{+i pi m^2 / N}
    b[m - n + 1 :] = np.conj(chirp)[1:][::-1]    # wrapped negative m
    Bf = np.fft.fft(b)
    return (
        chirp.astype(np.complex64),
        c.astype(np.complex64),
        Bf.astype(np.complex64),
        m,
    )


@partial(jax.jit, static_argnames=("inverse",))
def bluestein_fft(x, inverse: bool = False):
    """Length-N DFT (or inverse) along the last axis for arbitrary N via
    Bluestein's identity — only pow2 FFTs touch the hardware.

    exp(-2*pi*i*j*k/N) = chirp[j] * chirp[k] / chirp[j-k] with
    chirp[j] = e^{-i pi j^2/N}, so the DFT is the chirp-premultiplied
    input convolved with the conjugate chirp. Use for non-pow2 lengths
    where XLA's FFT is pathologically slow on TPU (e.g. the analytic-
    signal ifft of the complex-modulation path); the inverse is
    conj(fft(conj(x)))/N.
    """
    n = x.shape[-1]
    chirp, _, Bf, m = _bluestein_consts(n)
    xc = x.astype(jnp.complex64)
    if inverse:
        xc = jnp.conj(xc)
    a = xc * jnp.asarray(chirp)
    conv = jnp.fft.ifft(
        jnp.fft.fft(a, n=m, axis=-1) * jnp.asarray(Bf), axis=-1
    )[..., :n]
    out = jnp.asarray(chirp) * conv
    if inverse:
        out = jnp.conj(out) / n
    return out


@jax.jit
def _dct2_bluestein(x):
    n = x.shape[-1]
    chirp, c, Bf, m = _bluestein_consts(n)
    # Makhoul reorder: even indices, then odd indices reversed
    v = jnp.concatenate([x[..., ::2], x[..., 1::2][..., ::-1]], axis=-1)
    a = v.astype(jnp.complex64) * jnp.asarray(chirp)
    A = jnp.fft.fft(a, n=m, axis=-1)
    conv = jnp.fft.ifft(A * jnp.asarray(Bf), axis=-1)[..., :n]
    return jnp.real(jnp.asarray(c) * conv)


def dct2(
    x: jax.Array, dtype=None, block: int = 1024, allow_fft: bool = True
) -> jax.Array:
    """Unnormalised DCT-II along the last axis (scipy.fftpack semantics).

    Args:
      x: (..., N) input.
      dtype: compute dtype (default: x.dtype). float32 even-N inputs take
        the Bluestein pow2-FFT path; float64 (the high-precision parity
        path — f64 FFT doesn't compile on TPU) and odd N take the blocked
        cosine matmul.
      block: output-coefficient block size of the matmul path.
      allow_fft: pass False under GSPMD sharding constraints — the CPU
        backend's FFT thunk rejects non-default layouts the partitioner
        introduces (fft_thunk.cc IsMonotonicWithDim0Major RET_CHECK).
    """
    dtype = jnp.dtype(x.dtype if dtype is None else dtype)
    n = x.shape[-1]
    if allow_fft and dtype == jnp.float32 and n % 2 == 0 and n >= 64:
        return _dct2_bluestein(x.astype(jnp.float32))
    if allow_fft and dtype == jnp.float64 and n % 2 == 0 and n >= 64:
        # f64 Bluestein over the hand-rolled Stockham FFT (ops/fft64):
        # ~1e-15 relative, and far cheaper than the O(N^2) f64 matmul
        # (which stays the fallback for odd N / GSPMD-sharded inputs)
        from speech_recognition_tools_tpu.ops.fft64 import dct2_f64

        return dct2_f64(x.astype(jnp.float64))
    return _dct2_blocked(x, min(block, n), dtype.name)
