"""Float64 FFT + DCT-II on TPU, built from slice/concat/multiply only.

XLA's FFT op does not compile in f64 on TPU, and the O(N^2) f64 cosine
matmul is the single most expensive stage of the high-precision FDLP
paths. This module provides the missing primitive: a power-of-two
complex-f64 FFT as an *autosort Stockham radix-2 iteration* — each
stage is a static split, a broadcast twiddle multiply and a concat
(no bit-reversal permutation, no gathers, both of which are unusable
in f64 on TPU) — and a Bluestein DCT-II on top of it.

Why it matters (round-3 measurement, NOTES.md): the mixed-precision
FDLP mode meets <1e-4 parity on synthetic speech with an f32 DCT, but
on real speech the f32 transform's absolute error (~eps * ||frame||)
lands on near-silent mel bands and blows the budget (worst reference
wav: 4.6e-3). With the DCT in f64 the worst wav drops to 2.2e-5.

Stockham derivation: carry Y_t of shape (..., m, r) (m = 2^t,
r = N/2^t) where column j holds the m-point DFT of the stride-r
subsequence starting at j. The 2m-point DFT of the stride-r/2
subsequence at j combines columns j and j + r/2:
    Y' [k]   = A[k] + w_{2m}^k B[k]
    Y' [k+m] = A[k] - w_{2m}^k B[k]
with A = Y[..., :, :r/2], B = Y[..., :, r/2:] — a pure
slice/broadcast/concat step.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _factorize(n: int):
    """Radix schedule over {4, 2, 3, 5}; None if n has other factors."""
    out = []
    while n % 4 == 0:
        out.append(4)
        n //= 4
    for q in (2, 3, 5):
        while n % q == 0:
            out.append(q)
            n //= q
    return tuple(out) if n == 1 else None


def smooth_even(n: int) -> bool:
    """True when fft_f64 supports length n directly (2,3,5-smooth)."""
    return n >= 2 and _factorize(n) is not None


@lru_cache(maxsize=32)
def _stages(n: int):
    """Per-stage (q, twiddle (m, q) cos/sin, radix DFT (q, q) cos/sin)
    host constants for the mixed-radix Stockham schedule of length n."""
    radices = _factorize(n)
    assert radices is not None, f"{n} is not 2,3,5-smooth"
    stages = []
    m = 1
    for q in radices:
        k = np.arange(m)[:, None]
        s = np.arange(q)[None, :]
        ang = -2.0 * np.pi * k * s / (q * m)  # w_{qm}^{ks}
        t = np.arange(q)[:, None]
        dang = -2.0 * np.pi * t * s / q  # w_q^{ts}
        stages.append((
            q,
            np.cos(ang), np.sin(ang),
            np.cos(dang), np.sin(dang),
        ))
        m *= q
    return stages


@partial(jax.jit, static_argnames=("inverse",))
def fft_f64(xr, xi, inverse: bool = False):
    """Complex f64 DFT along the last axis for any {2,3,5}-smooth
    length, carried as separate real/imag f64 arrays.

    Mixed-radix autosort Stockham: state (..., m, r) where column j
    holds the m-point DFT of the stride-r subsequence at j; a radix-q
    stage twiddles the q column groups and combines them with the
    (exact, host-precomputed) q-point DFT matrix — slice, broadcast
    multiply and concat only. Returns (yr, yi); inverse=True includes
    the 1/n factor (matching jnp.fft.ifft).
    """
    n = xr.shape[-1]
    if inverse:
        xi = -xi
    yr = xr[..., None, :]  # (..., m=1, r=n)
    yi = xi[..., None, :]
    for q, twr, twi, dr, di in _stages(n):
        r = yr.shape[-1]
        rq = r // q
        # twiddled column groups T_s = w_{qm}^{ks} * Y[:, s*rq:(s+1)*rq]
        ts_r, ts_i = [], []
        for s in range(q):
            br = yr[..., s * rq:(s + 1) * rq]
            bi = yi[..., s * rq:(s + 1) * rq]
            if s == 0 or (twr.shape[0] == 1 and twr[0, s] == 1.0
                          and twi[0, s] == 0.0):  # w = 1 exactly
                ts_r.append(br)
                ts_i.append(bi)
                continue
            cr = jnp.asarray(twr[:, s], jnp.float64)[:, None]
            ci = jnp.asarray(twi[:, s], jnp.float64)[:, None]
            ts_r.append(cr * br - ci * bi)
            ts_i.append(cr * bi + ci * br)
        # radix butterfly: out_t = sum_s w_q^{ts} T_s, with the exact
        # +-1 / +-i entries (all of radix 2 and 4) done as adds/swaps
        outs_r, outs_i = [], []
        for t in range(q):
            ar = None
            ai = None
            for s in range(q):
                wr = float(dr[t, s])
                wi = float(di[t, s])
                wr = round(wr) if abs(wr - round(wr)) < 1e-12 else wr
                wi = round(wi) if abs(wi - round(wi)) < 1e-12 else wi
                if (wr, wi) == (1, 0):
                    pr, pi = ts_r[s], ts_i[s]
                elif (wr, wi) == (-1, 0):
                    pr, pi = -ts_r[s], -ts_i[s]
                elif (wr, wi) == (0, -1):
                    pr, pi = ts_i[s], -ts_r[s]
                elif (wr, wi) == (0, 1):
                    pr, pi = -ts_i[s], ts_r[s]
                else:
                    pr = wr * ts_r[s] - wi * ts_i[s]
                    pi = wr * ts_i[s] + wi * ts_r[s]
                ar = pr if ar is None else ar + pr
                ai = pi if ai is None else ai + pi
            outs_r.append(ar)
            outs_i.append(ai)
        yr = jnp.concatenate(outs_r, axis=-2)
        yi = jnp.concatenate(outs_i, axis=-2)
    yr = yr[..., 0]  # (..., n, 1) -> (..., n)
    yi = yi[..., 0]
    if inverse:
        scale = jnp.float64(1.0 / n)
        return yr * scale, -yi * scale
    return yr, yi


@lru_cache(maxsize=16)
def _bluestein_consts64(n: int):
    """f64 chirp constants with exact integer phase reduction (mirrors
    ops/dct._bluestein_consts at full precision)."""
    m = _next_pow2(2 * n - 1)
    j2 = np.array([(j * j) % (2 * n) for j in range(n)], np.float64)
    chirp = np.exp(-1j * np.pi * j2 / n)
    post = np.exp(-1j * np.pi * np.arange(n) / (2.0 * n))
    c = 2.0 * post * chirp
    b = np.zeros(m, np.complex128)
    b[:n] = np.conj(chirp)
    b[m - n + 1:] = np.conj(chirp)[1:][::-1]
    Bf = np.fft.fft(b)
    return chirp, c, Bf, m


def bluestein_fft_f64(xr, xi):
    """Length-n complex f64 DFT for arbitrary n via two pow2 Stockham
    FFTs (Bluestein's chirp-convolution identity). (..., n) -> (..., n)."""
    n = xr.shape[-1]
    chirp, _c, Bf, m = _bluestein_consts64(n)
    cr = jnp.asarray(chirp.real)
    ci = jnp.asarray(chirp.imag)
    ar = xr * cr - xi * ci
    ai = xr * ci + xi * cr
    pad = [(0, 0)] * (ar.ndim - 1) + [(0, m - n)]
    Ar, Ai = fft_f64(jnp.pad(ar, pad), jnp.pad(ai, pad))
    Br = jnp.asarray(Bf.real)
    Bi = jnp.asarray(Bf.imag)
    Cr = Ar * Br - Ai * Bi
    Ci = Ar * Bi + Ai * Br
    convr, convi = fft_f64(Cr, Ci, inverse=True)
    convr = convr[..., :n]
    convi = convi[..., :n]
    return cr * convr - ci * convi, cr * convi + ci * convr


@lru_cache(maxsize=16)
def _rfft_pack_consts64(n: int):
    """Host constants for the half-length real-packed DCT-II of even n:
    w[k] = e^{-2 pi i k / n} (rfft unpack twiddle) and
    p[k] = e^{-i pi k / (2n)} (DCT post-twiddle), k = 0..n-1."""
    h = n // 2
    k = np.arange(h + 1)
    w = np.exp(-2j * np.pi * k / n)
    p = np.exp(-1j * np.pi * np.arange(n) / (2.0 * n))
    return w, p


@jax.jit
def dct2_f64(x):
    """Unnormalised DCT-II (scipy.fftpack semantics) in f64 for even N.

    {2,3,5}-smooth N (every FDLP window length: srate*fduration is
    2^a 3^b 5^c for the toolkit's rates/durations) runs the Makhoul
    identity directly over the mixed-radix Stockham f64 FFT at length N
    — one FFT, no convolution. Other even N (and every N on TPU, where
    the mixed-radix stages' non-pow2 intermediate shapes hang the
    compiler — NOTES.md) use the *half-length real packing*: the
    reordered sequence v is real, so its length-N DFT comes from one
    length-N/2 complex DFT (z[t] = v[2t] + i v[2t+1], standard rfft
    unpacking), which halves the Bluestein convolution length (pow2
    M >= N-1 instead of >= 2N-1) — ~2.1x less stage work than
    Bluestein on the unpacked sequence. Accurate to ~1e-13 relative —
    vs ~1e-5 absolute-in-||x|| for the f32 paths.
    """
    n = x.shape[-1]
    v = jnp.concatenate([x[..., ::2], x[..., 1::2][..., ::-1]], axis=-1)
    v = v.astype(jnp.float64)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if smooth_even(n) and not on_tpu:
        # DCT2[k] = 2 Re(e^{-i pi k/(2N)} V[k]), V = DFT_N(v)
        Vr, Vi = fft_f64(v, jnp.zeros_like(v))
        ang = -np.pi * np.arange(n) / (2.0 * n)
        return 2.0 * (
            jnp.asarray(np.cos(ang)) * Vr - jnp.asarray(np.sin(ang)) * Vi
        )
    return _dct2_f64_packed(v)


@jax.jit
def _dct2_f64_packed(v):
    """DCT-II core on the Makhoul-reordered real sequence v via the
    half-length complex DFT (see dct2_f64 docstring)."""
    n = v.shape[-1]
    h = n // 2
    # pack the real v into a half-length complex sequence and DFT it
    Zr, Zi = bluestein_fft_f64(v[..., 0::2], v[..., 1::2])  # (..., h)
    # periodic extension Zk[k] = Z[k % h], Zm[k] = Z[(h-k) % h], k=0..h
    Zkr = jnp.concatenate([Zr, Zr[..., :1]], axis=-1)
    Zki = jnp.concatenate([Zi, Zi[..., :1]], axis=-1)
    Zmr = jnp.concatenate(
        [Zr[..., :1], Zr[..., 1:][..., ::-1], Zr[..., :1]], axis=-1
    )
    Zmi = jnp.concatenate(
        [Zi[..., :1], Zi[..., 1:][..., ::-1], Zi[..., :1]], axis=-1
    )
    # E = DFT(v_even), O = DFT(v_odd): E = (Zk + conj(Zm))/2,
    # O = (Zk - conj(Zm))/(2i); V[k] = E[k] + w^k O[k], k = 0..h
    Er = 0.5 * (Zkr + Zmr)
    Ei = 0.5 * (Zki - Zmi)
    Or = 0.5 * (Zki + Zmi)
    Oi = -0.5 * (Zkr - Zmr)
    w, p = _rfft_pack_consts64(n)
    wr = jnp.asarray(w.real)
    wi = jnp.asarray(w.imag)
    Vr = Er + wr * Or - wi * Oi  # (..., h+1)
    Vi = Ei + wr * Oi + wi * Or
    # DCT[k] = 2 Re(p[k] V[k]); for k > h use V[k] = conj(V[n-k])
    pr_lo = jnp.asarray(p.real[: h + 1])
    pi_lo = jnp.asarray(p.imag[: h + 1])
    out_lo = 2.0 * (pr_lo * Vr - pi_lo * Vi)
    # k = h+1..n-1 maps to j = n-k = h-1..1 (reversed interior slice)
    pr_hi = jnp.asarray(p.real[h + 1:])
    pi_hi = jnp.asarray(p.imag[h + 1:])
    Vr_hi = Vr[..., 1:h][..., ::-1]
    Vi_hi = Vi[..., 1:h][..., ::-1]
    out_hi = 2.0 * (pr_hi * Vr_hi + pi_hi * Vi_hi)
    return jnp.concatenate([out_lo, out_hi], axis=-1)
