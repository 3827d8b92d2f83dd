"""Streaming FDLP == batch FDLP on the concatenated signal.

The batch oracle is fdlp_spectrogram_batch (itself golden vs the
reference); the streamer must reproduce it for arbitrary chunkings,
including chunk sizes smaller and larger than the analysis hop.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from speech_recognition_tools_tpu.dsp import FdlpConfig, fdlp_spectrogram_batch
from speech_recognition_tools_tpu.dsp.streaming import StreamingFdlp

RS = np.random.RandomState(17)


def _signal(n):
    x = RS.randn(n).astype(np.float32)
    x[1:] += 0.8 * x[:-1]
    return (x * 2000).astype(np.float32)


@pytest.mark.parametrize("chunk", [1000, 6000, 16000, 50000])
def test_stream_matches_batch(chunk):
    cfg = FdlpConfig(nfilters=6)
    n = 16000 * 2 + 1234
    x = _signal(n)
    ref, nref = fdlp_spectrogram_batch(x[None], np.array([n]), cfg)
    T = int(nref[0])
    ref = np.asarray(ref)[0, :T]

    s = StreamingFdlp(cfg, block_frames=3)
    outs = []
    for off in range(0, n, chunk):
        outs.append(s.process(x[off : off + chunk]))
    outs.append(s.finish())
    got = np.concatenate(outs, axis=0)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_latency_bounded():
    """Frames must be emitted while streaming, not only at finish."""
    cfg = FdlpConfig(nfilters=6)
    s = StreamingFdlp(cfg)
    x = _signal(16000 * 3)
    emitted = 0
    for off in range(0, x.size, 8000):
        emitted += s.process(x[off : off + 8000]).shape[0]
    assert emitted > 100  # ~3s of 100Hz frames minus one window of latency
    tail = s.finish().shape[0]
    assert emitted + tail == 300


def test_single_push_equals_batch():
    cfg = FdlpConfig(nfilters=6)
    n = 16000
    x = _signal(n)
    ref, nref = fdlp_spectrogram_batch(x[None], np.array([n]), cfg)
    s = StreamingFdlp(cfg)
    a = s.process(x)
    b = s.finish()
    got = np.concatenate([a, b], axis=0)
    np.testing.assert_allclose(
        got, np.asarray(ref)[0, : int(nref[0])], rtol=2e-5, atol=2e-5
    )
