"""Native C++ component tests: PESQ scorer and fast ark reader."""

import numpy as np
import pytest

from speech_recognition_tools_tpu.io import write_ark_scp
from speech_recognition_tools_tpu.io.native import (
    get_native_lib,
    pesq,
    read_ark_native,
)

RS = np.random.RandomState(31)
FS = 16000


def _speech(n=FS * 3):
    """Speech-like: AR carrier with an *aperiodic* syllable-rate envelope
    (random segment amplitudes) — periodic envelopes make time alignment
    inherently ambiguous."""
    from scipy.signal import lfilter

    x = lfilter([1.0], [1.0, -1.4, 0.9], RS.randn(n)) * 1000
    seg = FS // 8
    amps = np.repeat(0.2 + RS.rand(n // seg + 1), seg)[:n]
    env = lfilter([1.0], [1.0, -0.999], amps)  # smooth
    env = env / env.max()
    return x * env


@pytest.fixture(scope="module")
def lib():
    l = get_native_lib()
    assert l is not None, "g++ build failed"
    return l


class TestPesq:
    def test_identity_scores_high(self, lib):
        x = _speech()
        mos = pesq(x, x, FS)
        assert mos > 4.0, mos

    def test_monotonic_with_noise(self, lib):
        x = _speech()
        scores = []
        for snr_db in (40, 20, 10, 0):
            noise = RS.randn(len(x)) * x.std() * 10 ** (-snr_db / 20)
            scores.append(pesq(x, x + noise, FS))
        assert all(
            scores[i] >= scores[i + 1] - 1e-6 for i in range(len(scores) - 1)
        ), scores
        assert scores[0] > scores[-1] + 0.5
        assert all(-0.5 <= s <= 4.5 for s in scores)

    def test_delay_robustness(self, lib):
        x = _speech()
        delayed = np.concatenate([np.zeros(800), x])[: len(x)]
        mos = pesq(x, delayed, FS)
        assert mos > 3.0, mos

    def test_8k(self, lib):
        x = _speech(8000 * 3)
        assert pesq(x, x, 8000.0) > 4.0


class TestNativeArk:
    def test_matches_python_reader(self, lib, tmp_path):
        feats = {
            f"utt{i}": RS.randn(RS.randint(5, 50), 13).astype(np.float32)
            for i in range(20)
        }
        ark, _ = write_ark_scp(feats, str(tmp_path / "f"))
        got = dict(read_ark_native(ark))
        assert set(got) == set(feats)
        for k in feats:
            np.testing.assert_array_equal(got[k], feats[k])

    def test_f64_entries(self, lib, tmp_path):
        feats = {"u": RS.randn(7, 3)}  # float64 -> DM entry
        ark, _ = write_ark_scp(feats, str(tmp_path / "d"))
        got = dict(read_ark_native(ark))
        np.testing.assert_allclose(got["u"], feats["u"], rtol=1e-6)
