"""CLI end-to-end tests: wav scp in -> Kaldi ark out, parity vs oracle."""

import os
import sys

import numpy as np
import pytest
from scipy.io.wavfile import write as wav_write

import oracles
from speech_recognition_tools_tpu.cli import (
    compute_fdlp_spectrogram,
    compute_mel_spectrum,
)
from speech_recognition_tools_tpu.io import read_mat_scp

RS = np.random.RandomState(7)


def _make_wavs(tmp_path, n_utts=3, srate=16000):
    entries = []
    sigs = {}
    for i in range(n_utts):
        n = srate + i * srate // 2
        sig = (RS.randn(n) * 2000).astype(np.int16)
        p = str(tmp_path / f"utt{i}.wav")
        wav_write(p, srate, sig)
        entries.append(f"utt{i} {p}")
        sigs[f"utt{i}"] = sig.astype(np.float64)
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(entries) + "\n")
    return str(scp), sigs


class TestFdlpCli:
    @pytest.mark.slow
    def test_end_to_end_parity(self, tmp_path):
        scp, sigs = _make_wavs(tmp_path)
        out = str(tmp_path / "fdlp")
        compute_fdlp_spectrogram.main(
            [scp, out, "--nfilters", "8", "--write_utt2num_frames",
             "--precision", "high"]
        )
        got = dict(read_mat_scp(out + ".scp"))
        assert set(got) == set(sigs)
        for utt, sig in sigs.items():
            oracle = oracles.oracle_fdlp(sig, nfilters=8)
            assert got[utt].shape == oracle.shape
            np.testing.assert_allclose(got[utt], oracle, atol=2e-4)
        lens = dict(
            l.split() for l in open(out + ".len").read().splitlines()
        )
        assert int(lens["utt0"]) == got["utt0"].shape[0]


class TestObservability:
    def test_meter_and_profile_trace(self, tmp_path, capsys):
        """--profile_dir captures an xprof trace and the CLI prints the
        ThroughputMeter utt/s + realtime-factor line (SURVEY §5: the
        reference's only instrumentation is a wall-clock print)."""
        scp, sigs = _make_wavs(tmp_path, n_utts=2)
        out = str(tmp_path / "mel")
        trace_dir = str(tmp_path / "trace")
        compute_mel_spectrum.main(
            [scp, out, "--nfilters", "10", "--profile_dir", trace_dir]
        )
        got = dict(read_mat_scp(out + ".scp"))
        assert set(got) == set(sigs)
        stdout = capsys.readouterr().out
        assert "x RT)" in stdout and "items in" in stdout
        assert os.path.isdir(trace_dir) and os.listdir(trace_dir)


class TestDataParallelCli:
    @pytest.mark.slow
    def test_fdlp_data_parallel_matches_single(self, tmp_path):
        """--data_parallel (the queue.pl replacement: one sharded program
        over all devices) must produce byte-identical arks, including
        the pad-to-device-multiple row handling (3 utts over 8 devs)."""
        import jax

        assert jax.device_count() >= 8
        scp, sigs = _make_wavs(tmp_path)
        out1 = str(tmp_path / "f1")
        out2 = str(tmp_path / "f2")
        compute_fdlp_spectrogram.main([scp, out1, "--nfilters", "6"])
        compute_fdlp_spectrogram.main(
            [scp, out2, "--nfilters", "6", "--data_parallel"]
        )
        a = dict(read_mat_scp(out1 + ".scp"))
        b = dict(read_mat_scp(out2 + ".scp"))
        assert set(a) == set(b) == set(sigs)
        for k in a:
            np.testing.assert_allclose(b[k], a[k], rtol=2e-5, atol=2e-5)


class TestMelCli:
    def test_end_to_end_parity(self, tmp_path):
        scp, sigs = _make_wavs(tmp_path, n_utts=2)
        out = str(tmp_path / "mel")
        compute_mel_spectrum.main([scp, out, "--nfilters", "10"])
        got = dict(read_mat_scp(out + ".scp"))
        for utt, sig in sigs.items():
            oracle = oracles.oracle_melspec(sig, nfilters=10)
            np.testing.assert_allclose(got[utt], oracle, rtol=2e-4, atol=2e-4)


class TestSegmentsMode:
    def test_fdlp_segments(self, tmp_path):
        from scipy.io.wavfile import write as wav_write

        n = 2 * 16000
        sig = (RS.randn(n) * 2000).astype(np.int16)
        wav = str(tmp_path / "rec.wav")
        wav_write(wav, 16000, sig)
        (tmp_path / "wav.scp").write_text(f"rec1 {wav}\n")
        (tmp_path / "segments").write_text(
            "seg_a rec1 0.0 1.0\nseg_b rec1 0.75 2.0\n"
        )
        out = str(tmp_path / "fdlp_seg")
        compute_fdlp_spectrogram.main(
            [str(tmp_path / "segments"), out, "--scp_type", "segment",
             "--wav_scp", str(tmp_path / "wav.scp"), "--nfilters", "6"]
        )
        got = dict(read_mat_scp(out + ".scp"))
        assert set(got) == {"seg_a", "seg_b"}
        # parity: segment == oracle on the sliced signal
        oracle = oracles.oracle_fdlp(sig[: 16000].astype(np.float64), nfilters=6)
        np.testing.assert_allclose(got["seg_a"], oracle, atol=2e-2)
        assert got["seg_b"].shape[0] == 125  # 1.25 s at 100 Hz
