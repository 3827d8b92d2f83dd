"""Circular autocorrelation for LPC.

The reference computes per-band autocorrelation as
ifft(fft(x) * conj(fft(x))) over the *same* length as the signal
(`/root/reference/src/featgen/features.py:222-224` computeLpcFast), i.e. a
circular autocorrelation. Only the first `order + 2` lags are consumed
downstream.

TPU notes (measured on v5e):
  * XLA's FFT at non-power-of-two lengths (8000 = 2^6*5^3) is catastrophically
    slow (~60000x slower than pow2); f64/c128 FFT does not compile at all.
  * So the fast path zero-pads to the next power of two >= 2N and computes
    the *linear* autocorrelation, then folds the circular wrap-around:
    y_circ[k] = lin[k] + conj(lin[N-k]).
  * The high-precision path (float64, needed for <1e-4 parity with the CPU
    reference because the downstream Levinson recursion amplifies lag
    rounding by ~1e6 on narrowband mel channels) avoids FFT entirely:
    lags are computed as blocked einsums against statically-shifted copies —
    f64 matmuls are software-emulated on TPU at ~1 TFLOP/s, which is ample
    for the ~100 lags needed.
"""

import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def circular_autocorr(x: jax.Array, nlags: int, keepreal: bool = True) -> jax.Array:
    """Circular autocorrelation, first `nlags` lags.

    Args:
      x: (..., N) real signal (complex allowed when keepreal=False).
      nlags: number of lags to return (<= N).
      keepreal: take the real part (reference keepreal=True).

    Returns: (..., nlags).
    """
    n = x.shape[-1]
    m = _next_pow2(2 * n)
    iscomplex = jnp.iscomplexobj(x)
    if iscomplex:
        spec = jnp.fft.fft(x, n=m, axis=-1)
        lin = jnp.fft.ifft(spec * jnp.conj(spec), axis=-1)
    else:
        spec = jnp.fft.rfft(x, n=m, axis=-1)
        lin = jnp.fft.irfft(spec * jnp.conj(spec), n=m, axis=-1)
    head = lin[..., :nlags]
    # wrap-around lags N-1 .. N-nlags+1 (lag 0 has no wrap term)
    tail = lin[..., n - nlags + 1 : n][..., ::-1]
    if iscomplex:
        tail = jnp.conj(tail)
    zero = jnp.zeros(x.shape[:-1] + (1,), lin.dtype)
    y = head + jnp.concatenate([zero, tail], axis=-1)
    if keepreal:
        y = jnp.real(y)
    return y


def circular_autocorr_direct(
    x: jax.Array, nlags: int, lag_block: int = 16
) -> jax.Array:
    """Circular autocorrelation of a real signal without FFT (any float
    dtype; MXU matmuls).

    y_circ[k] = sum_m x[m] x[m+k]  +  sum_{m<k} x[m] x[m+N-k]

    Both terms are computed as einsums against statically-shifted copies,
    blocked over lags to bound the (..., block, N) workspace. All lags are
    static Python ints so the shifts are static slices (no gather, which
    f64 einsum cannot lower on TPU). Measured faster than the pow2-FFT path
    on v5e at FDLP shapes in both f32 and f64.
    """
    n = x.shape[-1]
    batch = x.shape[:-1]
    blocks = []
    for k0 in range(0, nlags, lag_block):
        ks = list(range(k0, min(k0 + lag_block, nlags)))
        # forward: x[m] * x[m+k] — shift-left copies, zero-padded
        fwd_shift = jnp.stack(
            [
                jnp.concatenate(
                    [x[..., k:], jnp.zeros(batch + (k,), x.dtype)], axis=-1
                )
                for k in ks
            ],
            axis=-2,
        )  # (..., block, N)
        fwd = jnp.einsum(
            "...n,...kn->...k",
            x,
            fwd_shift,
            precision=jax.lax.Precision.HIGHEST,
        )
        # wrap: sum_{m=0}^{k-1} x[m] x[m+N-k] — head against shifted tail
        wrap_shift = jnp.stack(
            [
                jnp.concatenate(
                    [x[..., n - k :], jnp.zeros(batch + (n - k,), x.dtype)],
                    axis=-1,
                )
                if k > 0
                else jnp.zeros_like(x)
                for k in ks
            ],
            axis=-2,
        )
        wrap = jnp.einsum(
            "...n,...kn->...k",
            x,
            wrap_shift,
            precision=jax.lax.Precision.HIGHEST,
        )
        blocks.append(fwd + wrap)
    return jnp.concatenate(blocks, axis=-1)


def circular_autocorr_f64(x: jax.Array, nlags: int, lag_block: int = 16) -> jax.Array:
    """Float64 direct-lag circular autocorrelation (high-precision path)."""
    return circular_autocorr_direct(x.astype(jnp.float64), nlags, lag_block)


def banded_support_plan(fbank, nlags: int, n_classes: int = 4,
                        align: int = 128):
    """Host-side plan for `banded_autocorr_compact`: each band's support
    window, bucketed into width classes.

    Mel/cochlear band supports are compact (production 80-band/1.5 s
    config: widths 133..1574 bins over N=24000, total 47k — 2xN), so
    restricting each band's autocorrelation to its own support cuts the
    contraction work ~20-40x vs the dense shared-lag einsum. Bands are
    sorted by support width and partitioned into `n_classes` contiguous
    classes by a DP minimizing sum(class_size * padded_class_width).

    Returns a tuple of (W, ((band, start), ...)) per class, hashable for
    use as a static jit argument; `start` is clipped so the extended
    window [start, start + W + nlags) stays inside [0, N].
    """
    import numpy as np

    fb = np.asarray(fbank)
    nb, n = fb.shape
    sup = []
    for b in range(nb):
        nz = np.nonzero(fb[b])[0]
        if nz.size == 0:
            sup.append((0, 1))
        else:
            sup.append((int(nz[0]), int(nz[-1]) + 1))
    widths = [b - a for a, b in sup]
    order = sorted(range(nb), key=lambda b: widths[b])

    def padded(w):
        return -(-max(w, 1) // align) * align

    m = len(order)
    INF = 1 << 62
    # dp over the sorted-band prefix with at most n_classes classes
    dp = [[INF] * (m + 1) for _ in range(n_classes + 1)]
    back = [[0] * (m + 1) for _ in range(n_classes + 1)]
    dp[0][0] = 0
    for c in range(1, n_classes + 1):
        for j in range(1, m + 1):
            wmax = 0
            for i in range(j - 1, -1, -1):
                wmax = max(wmax, padded(widths[order[i]]))
                cost = dp[c - 1][i] + (j - i) * wmax
                if cost < dp[c][j]:
                    dp[c][j] = cost
                    back[c][j] = i
    c = min(range(1, n_classes + 1), key=lambda cc: dp[cc][m])
    bounds = []
    j = m
    while c > 0:
        i = back[c][j]
        bounds.append((i, j))
        j, c = i, c - 1
    bounds = bounds[::-1]
    plan = []
    for i, j in bounds:
        cls = order[i:j]
        W = min(max(padded(widths[b]) for b in cls), n)
        entries = []
        for b in cls:
            # window [start, start+W) must cover the support; the
            # +nlags extension reads into the zero-padded tail
            start = min(sup[b][0], max(n - W, 0))
            entries.append((b, start))
        plan.append((W, tuple(entries)))
    return tuple(plan)


def banded_autocorr_compact(x: jax.Array, fbank: jax.Array, nlags: int,
                            plan) -> jax.Array:
    """Support-compacted banded autocorrelation: numerically the same
    sums as `banded_autocorr` (each band's masked signal is zero outside
    its support window, so truncating the contraction there is exact),
    at ~1/20-1/40 the work. The f64 mixed-precision FDLP path's hot op.

    Args:
      x: (P, N) signals (the work/accumulation dtype — f64 on the
        mixed/high paths; any float).
      fbank: (nb, N) filterbank rows (same dtype).
      nlags: lags (order + 2).
      plan: static output of banded_support_plan(fbank, nlags).

    Returns (P, nb, nlags).
    """
    nb = fbank.shape[0]
    # zero-pad the spectrum tail so every window's +nlags lag extension
    # is in bounds (the padded region is silent, so the sums are exact)
    x = jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (nlags,), x.dtype)], axis=-1
    )
    fbank = jnp.concatenate(
        [fbank, jnp.zeros((nb, nlags), fbank.dtype)], axis=-1
    )
    per_band = [None] * nb
    for W, entries in plan:
        zs = []
        for b, s in entries:
            zs.append(
                jax.lax.slice_in_dim(fbank, b, b + 1, axis=0)[
                    :, s : s + W + nlags
                ]
                * jax.lax.slice_in_dim(x, s, s + W + nlags, axis=-1)
            )
        Z = jnp.stack(zs, axis=0)  # (nbc, P, W + nlags)
        head = Z[:, :, :W]
        outs = [
            jnp.sum(head * Z[:, :, k : k + W], axis=-1)
            for k in range(nlags)
        ]
        rc = jnp.stack(outs, axis=-1)  # (nbc, P, nlags)
        for i, (b, _s) in enumerate(entries):
            per_band[b] = rc[i]
    return jnp.stack(per_band, axis=1)  # (P, nb, nlags)


def banded_supports_separable(fbank, nlags: int) -> bool:
    """True when no band's support touches both ends of the spectrum, i.e.
    the circular wrap-around terms of every band's autocorrelation are
    exactly zero and `banded_autocorr` equals the reference's circular
    autocorrelation of the masked signal. Host-side check on the numpy
    filterbank."""
    import numpy as np

    fb = np.asarray(fbank)
    n = fb.shape[-1]
    for row in fb:
        nz = np.nonzero(row)[0]
        if nz.size and nz[0] < nlags and nz[-1] >= n - nlags + 1:
            return False
    return True


def banded_autocorr(
    x: jax.Array, fbank: jax.Array, nlags: int, lag_block: int = 8
) -> jax.Array:
    """Autocorrelation of x masked by every filterbank band, all bands at
    once: y[p, b, k] = sum_n (fb[b,n] x[p,n]) (fb[b,n+k] x[p,n+k]).

    TPU-first key identity: the per-band masked products factor as
        z_b[n] z_b[n+k] = (x[n] x[n+k]) * (fb[b,n] fb[b,n+k]),
    so the signal lag products u_k = x * shift_k(x) are shared across all
    bands and the contraction over n is one MXU einsum per lag,
    (P, N) @ (N, nb) — instead of materialising a per-band
    (P, nb, K, N) shifted stack (the round-1 fast path, which was
    HBM-bound; see VERDICT.md "fast/high inversion"). The per-lag form
    (rather than stacking a block of lags) lets XLA fuse the elementwise
    u_k into the dot's operand read, so no lag product ever round-trips
    HBM — measured 18.1 -> 12.5 ms vs the 8-lag blocked stack at the
    production config.

    Validity: exact (not approximate) w.r.t. the reference's *circular*
    autocorrelation (features.py:222-224) whenever no band's support wraps
    the spectrum ends — check with `banded_supports_separable`; true for
    every mel/cochlear bank the reference constructs.

    Complex signals are supported (the complex-modulation M-vector
    path, keepreal=False): r_b[k] = sum_m conj(z[m]) z[m+k] with
    z = fb_b * x factors the same way with u_k = conj(x) * shift_k(x);
    the complex-x-real contraction runs as two real einsums (re/im) so
    it stays on the MXU.

    Args:
      x: (..., N) real or complex signals.
      fbank: (nb, N) real filterbank rows.
      nlags: number of lags (order + 2 upstream).
      lag_block: lags per einsum block (memory knob; u block is
        (..., lag_block, N)).

    Returns: (..., nb, nlags), dtype matching x.
    """
    n = x.shape[-1]
    batch = x.shape[:-1]
    nb = fbank.shape[0]
    iscomplex = jnp.iscomplexobj(x)
    zpad_x = jnp.zeros(batch + (nlags,), x.dtype)
    zpad_f = jnp.zeros((nb, nlags), fbank.dtype)
    xp = jnp.concatenate([x, zpad_x], axis=-1)  # (..., N + K)
    fp = jnp.concatenate([fbank, zpad_f], axis=-1)
    del lag_block  # kept for API compatibility; per-lag form is faster
    xc = jnp.conj(x) if iscomplex else x

    def dot(u, w):
        return jnp.einsum(
            "...n,bn->...b", u, w, precision=jax.lax.Precision.HIGHEST
        )

    outs = []
    for k in range(nlags):
        u = xc * jax.lax.slice_in_dim(xp, k, k + n, axis=-1)
        w = fbank * jax.lax.slice_in_dim(fp, k, k + n, axis=-1)
        if iscomplex:
            outs.append(
                jax.lax.complex(dot(jnp.real(u), w), dot(jnp.imag(u), w))
            )
        else:
            outs.append(dot(u, w))
    return jnp.stack(outs, axis=-1)
