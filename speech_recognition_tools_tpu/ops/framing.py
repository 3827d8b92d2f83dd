"""Batched overlapping-frame extraction with reflect padding.

Replicates the frame geometry of the reference generator
(`/root/reference/src/featgen/features.py:118-154` getFrames): the signal is
reflect-padded by `extend` samples, frames of `flength` seconds are taken
every `srate/frate` samples, and each frame is windowed.

TPU-first design: gathers are the slow path on TPU (the original
full-frame reflect-index gather measured ~98 ms for a 32 x 10 s batch at
the production config — more than half the whole FDLP pipeline), so the
bulk of the extraction is done with *static strided slices*: hop and
window length share a large gcd g, so on a zero-padded signal reshaped to
g-sample chunks, frame k is chunks[a*k : a*k+b] — b strided slices
stacked, a pure bandwidth-bound copy. Reflect-boundary taps are then
fixed up exactly with two small gathers: the first ceil(extend/hop)
frames (left pad region, static) and the last few valid frames per
utterance (right pad region, dynamic via dynamic_update_slice). When the
gcd is degenerate (b > 64) the original one-gather formulation is used.
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


def _frame_signal_gather(signals, num_samples, params, window, max_frames):
    """Original one-gather formulation (exact; the slow path on TPU).

    Kept as the fallback for degenerate hop/flength ratios and as the
    parity oracle for the strided fast path."""
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


def _reflect_frame(signals, num_samples, params, frame_idx):
    """Exact (windowless) frames at traced indices via the gather formula.

    frame_idx: (B, K) per-utterance frame indices. Returns (B, K, flen)."""
    hop = params.frate_samples
    flen = params.flength_samples
    t = jnp.arange(flen)[None, :]

    def one(sig, n, ks):
        g = ks[:, None] * hop + t - params.extend  # (K, flen)
        return jnp.take(sig, _reflect_index(g, n), axis=0)

    return jax.vmap(one)(signals, num_samples, frame_idx)


def _strided_frames(chunks, B, F, a, b, g, flen):
    """Frame k = chunks[a*k : a*k+b] as b static strided slices."""
    parts = [
        jax.lax.slice(
            chunks, (0, j, 0), (B, j + a * (F - 1) + 1, g), (1, a, 1)
        )
        for j in range(b)
    ]
    return jnp.stack(parts, axis=2).reshape(B, F, flen)


def frame_signal_time_sharded(
    signals: jax.Array,
    params: FrameParams,
    max_frames: int,
    mesh,
    data_axis: str | None,
    time_axis: str,
) -> jax.Array:
    """Frames of a *sample-sharded* batch: the signal's sample axis lives
    sharded over `mesh`'s `time_axis` and is never materialised on any
    single device — each device exchanges only a <= flength-sample halo
    with its neighbours over ICI (jax.lax.ppermute) and cuts its own
    block of frames with static strided slices (SURVEY §5 long-context;
    the per-device HBM for the waveform scales 1/n_time).

    Restrictions (the long-utterance use case): every utterance must be
    full length (num_samples == N) — ragged batches belong on the
    frame-sharded path, which replicates the input — and N must divide
    by the time-axis size.

    Returns (B, ceil(max_frames/nt)*nt, flen) *unwindowed* frames,
    sharded P(data_axis, time_axis); frames past `max_frames` are
    garbage (mask with frame_count downstream).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map as _shard_map

        def shard_map(f, **kw):
            return _shard_map(f, **kw)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm

        def shard_map(f, *, mesh, in_specs, out_specs):
            return _sm(f, mesh, in_specs=in_specs, out_specs=out_specs)

    nt = mesh.shape[time_axis]
    B, N = signals.shape
    if N % nt:
        raise ValueError(f"N={N} not divisible by time-axis size {nt}")
    C = N // nt
    F = max_frames
    Fl = -(-F // nt)
    hop, flen, ext = params.frate_samples, params.flength_samples, params.extend
    if ext + 2 > C:
        raise ValueError("shard smaller than the reflect pad; use the "
                         "frame-sharded path")

    # per-device sample needs, exact host-side integers:
    # device i computes frames k in [i*Fl, (i+1)*Fl) (garbage past F);
    # frame k taps original samples [k*hop - ext, k*hop - ext + flen)
    lo = [i * Fl * hop - ext for i in range(nt)]
    hi = [lo[i] + (Fl - 1) * hop + flen for i in range(nt)]
    H_left = max(ext, max(i * C - lo[i] for i in range(nt)))
    H_right = max(ext, max(hi[i] - (i + 1) * C for i in range(nt)))
    if H_left > C or H_right > C:
        raise ValueError("halo exceeds shard size; too many time shards")
    span = (Fl - 1) * hop + flen
    for i in range(nt):
        s0 = i * (Fl * hop - C) + H_left - ext
        assert 0 <= s0 and s0 + span <= H_left + C + H_right, (i, s0)

    g = np.gcd(hop, flen)
    a, b = hop // g, flen // g
    assert span % g == 0

    def local(sig):  # (B_l, C) this device's sample block
        i = jax.lax.axis_index(time_axis)
        Bl = sig.shape[0]
        # halos: left from device i-1's tail, right from device i+1's head
        left = jax.lax.ppermute(
            sig[:, C - H_left:], time_axis,
            [(j, j + 1) for j in range(nt - 1)],
        )
        right = jax.lax.ppermute(
            sig[:, :H_right], time_axis,
            [(j + 1, j) for j in range(nt - 1)],
        )
        buf = jnp.concatenate([left, sig, right], axis=1)
        # global reflect boundaries live on the edge devices only
        refl_l = jnp.flip(sig[:, 1 : ext + 1], axis=1)
        with_l = jax.lax.dynamic_update_slice(buf, refl_l, (0, H_left - ext))
        buf = jnp.where(i == 0, with_l, buf)
        refl_r = jnp.flip(sig[:, C - ext - 1 : C - 1], axis=1)
        with_r = jax.lax.dynamic_update_slice(buf, refl_r, (0, H_left + C))
        buf = jnp.where(i == nt - 1, with_r, buf)
        # this device's frame window: start of frame i*Fl in buf coords
        s0 = (i * (Fl * hop - C) + H_left - ext).astype(jnp.int32)
        win = jax.lax.dynamic_slice(
            buf, (jnp.zeros((), jnp.int32), s0), (Bl, span)
        )
        chunks = win.reshape(Bl, span // g, g)
        return _strided_frames(chunks, Bl, Fl, a, b, g, flen)

    specs = P(data_axis, time_axis)
    return shard_map(
        local, mesh=mesh, in_specs=(specs,),
        out_specs=P(data_axis, time_axis, None),
    )(jax.lax.with_sharding_constraint(
        signals, NamedSharding(mesh, specs)
    ))


def bucketed_min_samples(num_samples, params: FrameParams) -> int | None:
    """Static length floor enabling frame_signal's gather-free path,
    bucketed to the single value `params.extend + 2` so downstream jit
    caches hold at most two variants per config.

    Returns None when the lengths are traced (caller is itself under
    jit, so the floor is unknown at trace time) or when some utterance
    is shorter than the reflect pad (the gather-fixup path is then
    required for exactness)."""
    try:
        mn = (
            int(np.min(np.asarray(num_samples)))
            if np.size(num_samples)
            else 0
        )
    except jax.errors.TracerArrayConversionError:
        return None
    return params.extend + 2 if mn >= params.extend + 2 else None


def frame_signal(
    signals: jax.Array,
    num_samples: jax.Array,
    params: FrameParams,
    window: jax.Array,
    max_frames: int,
    min_samples: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Extract windowed frames for a padded batch of signals.

    Args:
      signals: (B, Nmax) zero-padded waveforms.
      num_samples: (B,) true lengths.
      params: static frame geometry.
      window: (flength_samples,) window values (compute dtype).
      max_frames: static frame-count bound (use frame_count(Nmax, params)).
      min_samples: optional static lower bound on num_samples. When it
        guarantees every utterance is longer than the reflect pad
        (min_samples >= extend + 2), the entirely gather-free path is
        used: the reflect-padded signal is built with flips + per-
        utterance dynamic slices (single reflection is then exact) and
        frames are cut with static strided slices only.

    Returns:
      frames: (B, max_frames, flength_samples) windowed frames; frames past
        a signal's true frame count are garbage (mask with num_frames).
      num_frames: (B,) valid frame counts per utterance.
    """
    hop = params.frate_samples
    flen = params.flength_samples
    ext = params.extend
    F = max_frames
    g = np.gcd(hop, flen)
    b = flen // g
    if F < 1 or b > 64:
        return _frame_signal_gather(
            signals, num_samples, params, window, max_frames
        )

    a = hop // g
    B, nmax = signals.shape
    chunks_needed = b + a * (F - 1)

    def reflect_fast():
        # ---- gather-free: explicit reflect pad + strided slices ----
        # exact whenever every utterance has n >= ext + 2 (single
        # reflection); ~1.4 ms at the production FDLP config vs ~25 ms
        # for the bulk+fixup form (whose _reflect_frame gathers are the
        # cost — TPU general gathers run at a few hundred MB/s)
        W = max(chunks_needed * g, nmax + 2 * ext)
        W = -(-W // g) * g
        left = jnp.flip(signals[:, 1 : ext + 1], axis=1)
        spad = jnp.concatenate(
            [left, signals,
             jnp.zeros((B, W - ext - nmax), signals.dtype)],
            axis=1,
        )

        def rpad(sig, sp, n):
            # right reflect: s[n-2], s[n-3], ... placed at ext + n
            vals = jnp.flip(
                jax.lax.dynamic_slice(sig, (n - ext - 1,), (ext,)), 0
            )
            return jax.lax.dynamic_update_slice(sp, vals, (ext + n,))

        spad = jax.vmap(rpad)(signals, spad, num_samples)
        chunks = spad.reshape(B, W // g, g)
        return _strided_frames(chunks, B, F, a, b, g, flen)

    def bulk_fixup():
        # ---- bulk: zero-pad, reshape to g-chunks, b strided slices ----
        # padded coordinate of frame k tap t is k*hop + t (pad 'extend'
        # left); chunk index of (k, j-th g-block) is a*k + j.
        total = chunks_needed * g
        pad_right = total - ext - nmax
        spad = jnp.pad(signals, ((0, 0), (ext, max(pad_right, 0))))
        if pad_right < 0:
            spad = spad[:, :total]
        chunks = spad.reshape(B, chunks_needed, g)
        frames = _strided_frames(chunks, B, F, a, b, g, flen)

        # ---- fixups: taps in the reflect-pad regions, exact via gather
        # (handles utterances shorter than the reflect pad, where the
        # single-reflection construction above is wrong) ----
        # left region: frames k with k*hop < extend (static set)
        n_left = min(-(-params.extend // hop), F) if params.extend > 0 else 0
        if n_left:
            kl = jnp.broadcast_to(jnp.arange(n_left)[None, :], (B, n_left))
            left = _reflect_frame(signals, num_samples, params, kl)
            frames = jax.lax.dynamic_update_slice(frames, left, (0, 0, 0))
        # right region: per-utterance last frames whose taps reach past n.
        # frame k touches g >= n iff k*hop >= n + extend - flen + 1; with
        # nframes = ceil((n + 2*extend - flen + 1)/hop) the affected count
        # is <= ceil(extend/hop) + 1 (static bound); recompute that
        # contiguous dynamic window of frames exactly and write it back
        # via a broadcast gather + select (a vmapped dynamic_update_slice
        # lowers to a full-size scatter).
        nf = frame_count(num_samples, params)
        n_right = min(-(-params.extend // hop) + 1, F)
        if n_right:
            k0 = jnp.maximum(nf - n_right, 0)  # (B,)
            kr = k0[:, None] + jnp.arange(n_right)[None, :]  # contiguous
            right = _reflect_frame(signals, num_samples, params, kr)
            k = jnp.arange(F)[None, :]  # (1, F)
            j = jnp.clip(k - k0[:, None], 0, n_right - 1)  # (B, F)
            aligned = jnp.take_along_axis(right, j[:, :, None], axis=1)
            sel = (k >= k0[:, None]) & (k < k0[:, None] + n_right)
            frames = jnp.where(sel[:, :, None], aligned, frames)
        return frames

    if min_samples is not None and min_samples >= ext + 2 and ext > 0:
        # static guarantee: only the fast construction is traced
        frames = reflect_fast()
    elif ext > 0 and nmax >= ext + 2:
        # lengths unknown at trace time (or some utterance too short):
        # pick the construction at RUNTIME. Typical batches (every n >=
        # ext+2) ride the gather-free branch even when num_samples is a
        # tracer (featgen fused under an outer jit); only batches that
        # genuinely contain sub-pad utterances pay for the gather fixups.
        frames = jax.lax.cond(
            jnp.all(num_samples >= ext + 2), reflect_fast, bulk_fixup
        )
    else:
        frames = bulk_fixup()

    frames = frames * window[None, None, :]
    return frames, frame_count(num_samples, params)
