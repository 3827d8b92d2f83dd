"""Per-utterance CMVN + Kaldi compressed-matrix read support."""

import io
import struct

import numpy as np

import jax.numpy as jnp

from speech_recognition_tools_tpu.io.kaldi_ark import _read_binary_value
from speech_recognition_tools_tpu.utils.cmvn import apply_cmvn_per_utterance

RS = np.random.RandomState(2)


def _compress_kaldi_cm(mat):
    """Minimal Kaldi CompressedMatrix (format 1) writer for test purposes,
    mirroring compressed-matrix.cc quantisation."""
    rows, cols = mat.shape
    mn = float(mat.min())
    rng = max(float(mat.max()) - mn, 1e-5)

    def f_to_u16(v):
        return np.clip((v - mn) / rng * 65535.0, 0, 65535).astype(np.uint16)

    buf = io.BytesIO()
    buf.write(b"\x00BCM ")
    buf.write(struct.pack("<ffii", mn, rng, rows, cols))
    heads = []
    codes = np.zeros((cols, rows), np.uint8)
    for j in range(cols):
        col = np.sort(mat[:, j])
        p0, p25, p75, p100 = (
            col[0], col[rows // 4], col[(3 * rows) // 4], col[-1]
        )
        u = f_to_u16(np.asarray([p0, p25, p75, p100]))
        # make strictly increasing like kaldi does
        for i in range(1, 4):
            u[i] = max(u[i], u[i - 1] + (0 if u[i - 1] >= 65535 else 1))
        heads.append(u)
        fp = mn + rng * (u.astype(np.float64) / 65535.0)
        x = mat[:, j]
        c = np.empty(rows, np.uint8)
        lo = x <= fp[1]
        hi = x >= fp[2]
        midm = ~lo & ~hi
        c[lo] = np.clip(
            np.round((x[lo] - fp[0]) / max(fp[1] - fp[0], 1e-12) * 64), 0, 64
        )
        c[midm] = np.clip(
            64 + np.round((x[midm] - fp[1]) / max(fp[2] - fp[1], 1e-12) * 128),
            65, 192,
        )
        c[hi] = np.clip(
            192 + np.round((x[hi] - fp[2]) / max(fp[3] - fp[2], 1e-12) * 63),
            193, 255,
        )
        codes[j] = c
    buf.write(np.asarray(heads, np.uint16).tobytes())
    buf.write(codes.tobytes())
    buf.seek(0)
    return buf


def test_compressed_matrix_roundtrip():
    mat = RS.randn(50, 7).astype(np.float64) * 3 + 1
    buf = _compress_kaldi_cm(mat)
    got = _read_binary_value(buf)
    assert got.shape == mat.shape
    # 8-bit quantisation: expect ~1% of the dynamic range
    tol = (mat.max() - mat.min()) * 0.02
    assert np.max(np.abs(got - mat)) < tol


def test_per_utt_cmvn():
    feats = jnp.asarray(RS.randn(2, 10, 4) * 5 + 3, jnp.float32)
    nf = jnp.asarray([10, 6])
    out = apply_cmvn_per_utterance(feats, nf)
    o = np.asarray(out)
    np.testing.assert_allclose(o[0].mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(o[0].std(axis=0), 1.0, atol=1e-4)
    np.testing.assert_allclose(o[1, :6].mean(axis=0), 0.0, atol=1e-5)
    assert np.all(o[1, 6:] == 0)
