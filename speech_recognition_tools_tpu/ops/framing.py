"""Batched overlapping-frame extraction with reflect padding.

Replicates the frame geometry of the reference generator
(`/root/reference/src/featgen/features.py:118-154` getFrames): the signal is
reflect-padded by `extend` samples, frames of `flength` seconds are taken
every `srate/frate` samples, and each frame is windowed.

TPU-first design: instead of materialising a padded copy per utterance (the
reference pads with numpy), framing is a single gather from the raw batch
with reflect index arithmetic computed per utterance from its true length.
This keeps one static-shaped program for a whole padded batch of utterances.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FrameParams:
    """Static frame geometry (all Python ints, computed like the reference)."""

    flength_samples: int  # window length in samples
    frate_samples: int  # hop in samples
    sp_b: int  # samples before center
    sp_f: int  # samples after center
    extend: int  # reflect-pad amount


def frame_params(srate: float, frate: float, flength: float) -> FrameParams:
    """Mirror the int()/float arithmetic of the reference exactly.

    `frate` may be a float (the FDLP path uses a low frame rate
    lfr = 1/(overlap_fraction * fduration)); the hop is int(srate / frate),
    truncated exactly as the reference does.
    """
    flength_samples = int(srate * flength)
    frate_samples = int(srate / frate)
    if flength_samples % 2 == 0:
        sp_b = flength_samples // 2 - 1
        sp_f = flength_samples // 2
        extend = flength_samples // 2 - 1
    else:
        sp_b = (flength_samples - 1) // 2
        sp_f = (flength_samples - 1) // 2
        extend = (flength_samples - 1) // 2
    return FrameParams(flength_samples, frate_samples, sp_b, sp_f, extend)


def frame_count(num_samples, params: FrameParams):
    """Number of frames the reference generator yields for a signal of
    `num_samples` samples.

    Derived from the loop condition `(idx + sp_f) < len(sig_padded)` with
    idx = sp_b + k*hop and len(sig_padded) = n + 2*extend.
    """
    n = num_samples
    hop = params.frate_samples
    # condition: sp_b + k*hop + sp_f < n + 2*extend
    # => k*hop < n + 2*extend - sp_b - sp_f
    limit = n + 2 * params.extend - params.sp_b - params.sp_f
    # number of k >= 0 with k*hop < limit  == ceil(limit / hop) for limit > 0
    if isinstance(n, (int, np.integer)):
        return max(0, -(-limit // hop))
    return jnp.maximum(0, -(-limit // hop))


def _reflect_index(g, n):
    """Map arbitrary integer index g onto [0, n) by 'reflect' boundary rule
    (numpy pad mode 'reflect': no edge repetition). Handles multiple
    reflections via modular arithmetic; degenerates safely for n == 1."""
    period = jnp.maximum(2 * (n - 1), 1)
    m = jnp.mod(g, period)
    return jnp.minimum(m, period - m)


def frame_signal(
    signals: jax.Array,
    num_samples: jax.Array,
    params: FrameParams,
    window: jax.Array,
    max_frames: int,
) -> tuple[jax.Array, jax.Array]:
    """Extract windowed frames for a padded batch of signals.

    Args:
      signals: (B, Nmax) zero-padded waveforms.
      num_samples: (B,) true lengths.
      params: static frame geometry.
      window: (flength_samples,) window values (compute dtype).
      max_frames: static frame-count bound (use frame_count(Nmax, params)).

    Returns:
      frames: (B, max_frames, flength_samples) windowed frames; frames past
        a signal's true frame count are garbage (mask with num_frames).
      num_frames: (B,) valid frame counts per utterance.
    """
    hop = params.frate_samples
    flen = params.flength_samples
    # original-coordinate sample index of frame k, tap t:
    #   g = k*hop + t - extend   (frame k spans padded [k*hop, k*hop+flen))
    k = jnp.arange(max_frames)[:, None]
    t = jnp.arange(flen)[None, :]
    g = k * hop + t - params.extend  # (F, flen), may be <0 or >=n

    def one(sig, n):
        idx = _reflect_index(g, n)
        return jnp.take(sig, idx, axis=0)

    frames = jax.vmap(one)(signals, num_samples)
    frames = frames * window[None, None, :]
    nframes = frame_count(num_samples, params)
    return frames, nframes
