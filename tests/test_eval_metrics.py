"""Enhancement-metric and info-theory tests: sanity properties + known
behaviours (identical signals score perfectly; noisier scores worse)."""

import numpy as np
import pytest

from speech_recognition_tools_tpu.eval import (
    cepsdist,
    combine_histograms,
    feats_minmax,
    fwsegsnr,
    lpcllr,
    mark_transitions,
    mutual_information,
    sdr,
    signal_label_histogram,
    srmr,
    stoi,
)

RS = np.random.RandomState(21)
FS = 16000


def _speech(n=FS * 2):
    from scipy.signal import lfilter

    x = lfilter([1.0], [1.0, -1.2, 0.7], RS.randn(n))
    t = np.arange(n) / FS
    return x * (0.4 + 0.6 * np.sin(2 * np.pi * 2.5 * t) ** 2)


class TestPairMetrics:
    def test_cepsdist_identity_and_ordering(self):
        x = _speech()
        d0, _ = cepsdist(x, x, FS)
        assert d0 == pytest.approx(0.0, abs=1e-9)
        d1, _ = cepsdist(x + 0.05 * RS.randn(len(x)) * x.std(), x, FS)
        d2, _ = cepsdist(x + 0.5 * RS.randn(len(x)) * x.std(), x, FS)
        assert 0 < d1 < d2 <= 10

    def test_lpcllr_identity_and_ordering(self):
        x = _speech()
        d0, _ = lpcllr(x, x, FS)
        assert d0 == pytest.approx(0.0, abs=1e-9)
        d2, _ = lpcllr(x + 0.5 * x.std() * RS.randn(len(x)), x, FS)
        assert 0 < d2 <= 2

    def test_fwsegsnr_ordering(self):
        x = _speech()
        good, _ = fwsegsnr(x + 0.01 * x.std() * RS.randn(len(x)), x, FS)
        bad, _ = fwsegsnr(x + 1.0 * x.std() * RS.randn(len(x)), x, FS)
        assert good > bad
        perfect, _ = fwsegsnr(x, x, FS)
        assert perfect == pytest.approx(35.0)  # clipped max

    def test_stoi_ordering(self):
        x = _speech(FS * 3)
        clean = stoi(x, x, FS)
        assert clean > 0.95
        noisy = stoi(x, x + 1.0 * x.std() * RS.randn(len(x)), FS)
        assert noisy < clean
        e_clean = stoi(x, x, FS, extended=True)
        e_noisy = stoi(x, x + x.std() * RS.randn(len(x)), FS, extended=True)
        assert e_noisy < e_clean and e_clean > 0.95

    def test_sdr(self):
        x = _speech()
        assert sdr(x, x) > 100
        assert 8 < sdr(x, x + 0.3 * x.std() * RS.randn(len(x))) < 14

    def test_srmr_reverb_sensitivity(self):
        x = _speech(FS * 2)
        clean_score = srmr(x, FS)
        # heavy synthetic reverberation smears modulation energy upward
        rir = np.exp(-np.arange(0, FS // 2) / (FS * 0.12)) * RS.randn(FS // 2)
        rev = np.convolve(x, rir)[: len(x)]
        rev_score = srmr(rev, FS)
        assert clean_score > rev_score > 0


class TestInfoTheory:
    def test_minmax(self):
        d = {"a": np.asarray([[1.0, -5.0]]), "b": np.asarray([[7.0, 0.0]])}
        assert feats_minmax(d) == (-5.0, 7.0)

    def test_histogram_and_mi(self):
        T, D, L = 400, 3, 4
        labs = RS.randint(1, L + 1, T)  # one-based like ali-to-phones
        feats = RS.randn(T, D) * 0.1
        feats[:, 0] += labs  # dim 0 strongly informative
        d = {"u": feats}
        a = {"u": labs}
        h = signal_label_histogram(a, d, feats_minmax(d), L, num_bins=20)
        assert h.shape == (D, 20, L)
        assert h.sum() == T * D
        mi = mutual_information(combine_histograms([h]))
        assert mi[0] > mi[1] and mi[0] > mi[2]

    def test_transitions(self):
        t = mark_transitions([1, 1, 2, 2, 2, 3])
        np.testing.assert_array_equal(t, [0, 1, 1, 1, 1, 1])
