"""STFT / iSTFT with biorthogonal synthesis window.

Parity target: nn-gev/fgnt/signal_processing.py (:37-199): blackman
analysis window, perfect reconstruction via the biorthogonal synthesis
window (Krueger A.92), optional fade-in/out zero padding of
(number_of_shifts - 1) * shift samples on both sides.

JAX implementation: framing is a reshape-free gather, synthesis is a
scatter-add overlap-add — both static-shape and batchable over channels.
"""


import jax.numpy as jnp
import numpy as np
import scipy.signal


def biorthogonal_synthesis_window(analysis_window: np.ndarray, shift: int):
    """Vectorised equivalent of _biorthogonal_window_loopy (:37-64)."""
    fft_size = len(analysis_window)
    assert fft_size % shift == 0
    k = fft_size // shift
    w2 = analysis_window**2
    # sum of squares of window taps congruent mod shift, excluding the last
    # tap (analysis_index + 1 < fft_size in the reference loop)
    w2 = w2.copy()
    w2[-1] = 0.0
    sums = w2.reshape(k, shift).sum(axis=0)
    sum_of_squares = np.kron(np.ones(k), sums)
    return analysis_window / sum_of_squares / fft_size


def _default_window(size):
    return scipy.signal.windows.blackman(size, sym=True)


def stft(
    time_signal,
    size: int = 1024,
    shift: int = 256,
    window=None,
    fading: bool = True,
):
    """STFT of (..., samples) -> (..., frames, size//2+1) complex.

    With fading=True the signal is padded with (size//shift - 1) * shift
    zeros on both ends (reference stft fading) and on the right so the last
    frame is complete.
    """
    x = jnp.asarray(time_signal)
    win = jnp.asarray(
        window if window is not None else _default_window(size), x.dtype
    )
    pad = (size // shift - 1) * shift if fading else 0
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    n = x.shape[-1]
    frames = max(1, int(np.ceil((n - size + shift) / shift)))
    total = (frames - 1) * shift + size
    if total > n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, total - n)])
    idx = jnp.arange(frames)[:, None] * shift + jnp.arange(size)[None, :]
    segs = x[..., idx] * win
    return jnp.fft.rfft(segs, n=size, axis=-1)


def istft(
    stft_signal,
    size: int = 1024,
    shift: int = 256,
    window=None,
    fading: bool = True,
):
    """Inverse STFT via biorthogonal synthesis window + overlap-add.

    stft_signal: (..., frames, size//2+1) -> (..., samples).
    """
    awin = np.asarray(window if window is not None else _default_window(size))
    swin = jnp.asarray(
        biorthogonal_synthesis_window(awin, shift) * size, stft_signal.real.dtype
    )
    segs = jnp.fft.irfft(stft_signal, n=size, axis=-1) * swin
    frames = segs.shape[-2]
    total = (frames - 1) * shift + size
    idx = jnp.arange(frames)[:, None] * shift + jnp.arange(size)[None, :]
    out = jnp.zeros(segs.shape[:-2] + (total,), segs.dtype)
    out = out.at[..., idx].add(segs)
    if fading:
        pad = (size // shift - 1) * shift
        out = out[..., pad : total - pad]
    return out
