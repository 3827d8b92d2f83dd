"""Streaming (online) FDLP feature extraction.

The reference is strictly batch (computeFDLPSpectrogram.py reads whole
wavs); this module adds the serving-side capability: feed audio in
arbitrary-sized chunks, receive finalized feature frames with bounded
latency, bit-identical to `fdlp_spectrogram_batch` on the concatenated
signal (asserted by tests/test_streaming.py).

Design: FDLP's analysis frames start every `hop` samples (hop =
overlap_used * fduration * srate) and each contributes a kk-frame
envelope to the 100 Hz output via overlap-add. The streamer:

  * buffers raw samples; an analysis window k (spanning original samples
    [k*hop - extend, k*hop - extend + flen)) is *computable* once the
    stream has k*hop + flen - extend samples (the left reflect pad is
    derived from the first samples, which are always available);
  * runs the batch TPU chain (window -> DCT -> banded autocorr ->
    Levinson -> cepstra -> envelope) on blocks of ready windows — the
    same jitted ops as the offline path, one program per block size;
  * overlap-adds envelopes into a host-side accumulator and emits
    output frame t once no future analysis frame can touch it
    (t < (last_done+1)*hop_frames - kkb2);
  * `finish()` reflect-pads the tail exactly like the batch framing and
    flushes the remaining frames.

Algorithmic latency is one analysis window (fduration * overlap_used
extra), i.e. ~1.1 s at the production e2e config — inherent to FDLP's
long windows, not to this implementation.

Numerical note: on TPU, XLA's reduction tiling depends on the batch
(block) size, so computing the same analysis windows in blocks of
`block_frames` vs all at once perturbs the autocorrelation lags by
~1e-5 relative — which the ill-conditioned Levinson recursion amplifies
to ~1e-1 on narrowband/low-energy cells, exactly the fast (f32) mode's
documented self-noise vs the f64 reference (dsp/fdlp.py precision
notes). Streamed and batch features therefore agree to f32-chain
sensitivity on TPU, and to ~2e-5 on CPU where reductions are
tiling-independent (asserted in tests/test_streaming.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tools_tpu.dsp.fdlp import (
    FdlpConfig,
    _band_cepstra,
    _host_constants,
)
from speech_recognition_tools_tpu.ops.dct import dct2
from speech_recognition_tools_tpu.ops.framing import frame_count


@partial(jax.jit, static_argnames=("cfg",))
def _stream_envelopes(windows, fbank_arr, cfg: FdlpConfig):
    """(F, flen) raw analysis windows -> (F, nb, kk) envelopes.

    Mirrors the fast-path mid-section of dsp/fdlp._fdlp_impl exactly
    (same ops, same order) so streamed features match the batch ones.
    """
    c = _host_constants(cfg)
    dtype = windows.dtype
    win = jnp.asarray(c["win"], dtype)
    scale = jnp.asarray(
        1.0 / np.sqrt(2 * int(cfg.srate * cfg.fduration)), dtype
    )
    cos_dct = dct2(windows * win, dtype=dtype) * scale
    lpc_backend = cfg.lpc_backend
    if lpc_backend == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        lpc_backend = "fused" if (on_tpu and dtype == jnp.float32) else "scan"
    ceps = _band_cepstra(
        cos_dct, fbank_arr.astype(dtype), cfg.order, cfg.coeff_num,
        backend=lpc_backend,
    )
    ceps = ceps * jnp.asarray(c["weights"], dtype)[None, None, :]
    # same dtype-safe exponent saturation as the batch path (fdlp.py:
    # near-periodic audio can overflow f32 exp; streamed == batch)
    env_cap = 700.0 if dtype == jnp.float64 else 75.0
    env = jnp.exp(jnp.minimum(
        jnp.einsum(
            "pbc,ck->pbk", ceps, jnp.asarray(c["cosmat"], dtype),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        ),
        env_cap,
    ))
    env = env * jnp.asarray(c["env_win"], dtype)[None, None, :]
    return env


class StreamingFdlp:
    """Chunked FDLP extraction, bit-identical to the batch path.

    Usage:
        s = StreamingFdlp(cfg)
        for chunk in audio_chunks:
            feats = s.process(chunk)   # (t, nfilters) finalized frames
        feats_tail = s.finish()        # remaining frames

    `block_frames` controls how many analysis windows are batched per
    TPU program (one compiled program per distinct block size; the tail
    block compiles once more).
    """

    def __init__(self, cfg: FdlpConfig = FdlpConfig(), block_frames: int = 8,
                 dtype=jnp.float32):
        if cfg.precision != "fast":
            raise ValueError("streaming supports the fast (f32) path")
        self.cfg = cfg
        self.block_frames = block_frames
        self.dtype = dtype
        c = _host_constants(cfg)
        self._c = c
        self._fp = c["fp"]
        self._fbank = jnp.asarray(np.asarray(c["fbank"]), dtype)
        self._buf = np.zeros(0, np.float32)
        self._next_frame = 0       # next analysis frame to compute
        self._emitted = 0          # output frames already emitted
        self._acc = np.zeros((c["fbank"].shape[0], 0), np.float64)
        self._acc_start = 0        # output index of acc[:, 0]
        self._finished = False

    # ---- geometry helpers ----
    @property
    def _hop(self):
        return self._fp.frate_samples

    @property
    def _flen(self):
        return self._fp.flength_samples

    @property
    def _ext(self):
        return self._fp.extend

    def _window(self, k, total=None):
        """Original-coordinate samples of analysis frame k with reflect
        at the start (and, when `total` is given, at the end)."""
        lo = k * self._hop - self._ext
        idx = np.arange(lo, lo + self._flen)
        n = total if total is not None else self._buf.size
        period = max(2 * (n - 1), 1)
        m = np.mod(idx, period)
        idx = np.minimum(m, period - m)
        return self._buf[idx]

    def _compute_frames(self, upto, total=None):
        """Run analysis frames [_next_frame, upto) and OLA them."""
        c = self._c
        while self._next_frame < upto:
            hi = min(upto, self._next_frame + self.block_frames)
            ks = list(range(self._next_frame, hi))
            wins = np.stack([self._window(k, total) for k in ks])
            env = np.asarray(
                _stream_envelopes(
                    jnp.asarray(wins, self.dtype), self._fbank, self.cfg
                )
            )  # (F, nb, kk)
            for j, k in enumerate(ks):
                self._ola_add(k, env[j])
            self._next_frame = hi

    def _ola_add(self, k, env_k):
        """Place frame k's (nb, kk) envelope at the batch OLA position."""
        c = self._c
        kk, kkb2, hop = c["kk"], c["kkb2"], c["hop"]
        if k == 0:
            pos, vals = 0, env_k[:, kkb2:]
        else:
            pos, vals = (hop - kkb2) + (k - 1) * hop, env_k
        end = pos + vals.shape[1]
        # grow the accumulator to cover [acc_start, end)
        need = end - self._acc_start
        if need > self._acc.shape[1]:
            pad = need - self._acc.shape[1]
            self._acc = np.concatenate(
                [self._acc, np.zeros((self._acc.shape[0], pad))], axis=1
            )
        lo = pos - self._acc_start
        if lo < 0:  # contributions before already-emitted frames: clipped
            vals = vals[:, -lo:]
            lo = 0
        self._acc[:, lo : lo + vals.shape[1]] += vals

    def _emit(self, final_upto):
        """Return finalized output frames [ _emitted, final_upto )."""
        if final_upto <= self._emitted:
            return np.zeros((0, self._acc.shape[0]), np.float32)
        take = final_upto - self._emitted
        if take > self._acc.shape[1]:
            pad = take - self._acc.shape[1]
            self._acc = np.concatenate(
                [self._acc, np.zeros((self._acc.shape[0], pad))], axis=1
            )
        chunk = self._acc[:, :take]
        self._acc = self._acc[:, take:]
        self._acc_start += take
        self._emitted = final_upto
        feats = np.log(np.clip(chunk.T, 1e-14, None))
        return feats.astype(np.float32)

    def process(self, samples):
        """Feed a chunk; returns finalized (t, nfilters) log frames."""
        assert not self._finished, "stream already finished"
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf = np.concatenate([self._buf, samples])
        n = self._buf.size
        # frame k computable without end-reflect iff its last tap is
        # strictly inside the stream: k*hop + flen - ext <= n, and the
        # left reflect needs ext+1 samples
        if n < self._ext + 2:
            return np.zeros((0, self._acc.shape[0]), np.float32)
        ready = (n - self._flen + self._ext) // self._hop + 1
        ready = max(ready, 0)
        self._compute_frames(ready)
        # output frame t is final once no later analysis frame overlaps:
        # frame k >= 1 starts at (hop - kkb2) + (k-1)*hop
        c = self._c
        if self._next_frame == 0:
            return self._emit(0)
        safe = (c["hop"] - c["kkb2"]) + (self._next_frame - 1) * c["hop"]
        return self._emit(max(safe, 0))

    def finish(self):
        """Flush: compute tail frames with end reflection, emit the rest.

        Returns (t, nfilters); total emitted across the stream equals
        ceil(n * frate / srate), matching the batch contract."""
        assert not self._finished
        self._finished = True
        n = self._buf.size
        total_frames = int(frame_count(n, self._fp))
        self._compute_frames(total_frames, total=n)
        out_len = -((-n * self.cfg.frate) // self.cfg.srate)
        return self._emit(int(out_len))
