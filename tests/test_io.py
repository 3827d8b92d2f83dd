"""IO tests: ark/scp roundtrips, wav loading, egs build + bucketed batching."""

import numpy as np
import pytest
from scipy.io.wavfile import write as wav_write

from speech_recognition_tools_tpu.io import (
    build_egs,
    iter_egs_batches,
    load_egs,
    load_wav_batch,
    read_ark,
    read_mat_scp,
    read_scp,
    read_segments,
    read_vec_int_ark,
    write_ark_scp,
    write_scp,
    write_vec_int_ark,
)

RS = np.random.RandomState(0)


class TestArk:
    def test_matrix_ark_scp_roundtrip(self, tmp_path):
        feats = {
            "utt1": RS.randn(7, 13).astype(np.float32),
            "utt2": RS.randn(3, 13).astype(np.float32),
        }
        base = str(tmp_path / "feats")
        ark, scp = write_ark_scp(feats, base)
        via_ark = dict(read_ark(ark))
        via_scp = dict(read_mat_scp(scp))
        for k in feats:
            np.testing.assert_array_equal(via_ark[k], feats[k])
            np.testing.assert_array_equal(via_scp[k], feats[k])

    def test_f64_matrix(self, tmp_path):
        feats = {"u": RS.randn(4, 5)}
        ark, _ = write_ark_scp(feats, str(tmp_path / "f64"))
        got = dict(read_ark(ark))["u"]
        assert got.dtype == np.float64
        np.testing.assert_array_equal(got, feats["u"])

    def test_kaldi_binary_layout(self, tmp_path):
        """Byte-level check of the Kaldi binary matrix header."""
        feats = {"u": np.arange(6, dtype=np.float32).reshape(2, 3)}
        ark, _ = write_ark_scp(feats, str(tmp_path / "h"))
        raw = open(ark, "rb").read()
        assert raw.startswith(b"u \x00BFM \x04\x02\x00\x00\x00\x04\x03\x00\x00\x00")
        body = np.frombuffer(raw[-24:], np.float32)
        np.testing.assert_array_equal(body, np.arange(6, dtype=np.float32))

    @pytest.mark.parametrize("binary", [True, False])
    def test_vec_int_roundtrip(self, tmp_path, binary):
        ali = {"a": np.asarray([1, 5, 5, 2], np.int32),
               "b": np.asarray([0], np.int32)}
        path = str(tmp_path / "ali.ark")
        write_vec_int_ark(ali, path, binary=binary)
        got = dict(read_vec_int_ark(path))
        for k in ali:
            np.testing.assert_array_equal(got[k], ali[k])


class TestScpWav:
    def test_scp_roundtrip(self, tmp_path):
        entries = [("u1", "/x/a.wav"), ("u2", "sox /x/b.wav -t wav - |")]
        p = write_scp(entries, str(tmp_path / "wav.scp"))
        assert read_scp(p) == entries

    def test_segments(self, tmp_path):
        (tmp_path / "segments").write_text("s1 rec1 0.5 1.25\n")
        segs = read_segments(str(tmp_path / "segments"))
        assert segs == [("s1", "rec1", 0.5, 1.25)]

    def test_load_wav_batch(self, tmp_path):
        for i, n in enumerate((16000, 8000)):
            sig = (RS.randn(n) * 1000).astype(np.int16)
            wav_write(str(tmp_path / f"u{i}.wav"), 16000, sig)
        entries = [(f"u{i}", str(tmp_path / f"u{i}.wav")) for i in range(2)]
        entries.append(("bad", str(tmp_path / "missing.wav")))
        batch, lens, keys = load_wav_batch(entries, 16000)
        assert keys == ["u0", "u1"]  # bad entry skipped
        assert batch.shape == (2, 16000)
        assert list(lens) == [16000, 8000]
        assert np.all(batch[1, 8000:] == 0)


class TestEgs:
    def _utts(self, n=10):
        feats, labels = {}, {}
        for i in range(n):
            T = int(RS.randint(20, 100))
            feats[f"u{i}"] = RS.randn(T, 8).astype(np.float32)
            labels[f"u{i}"] = RS.randint(0, 5, T).astype(np.int32)
        return feats, labels

    def test_build_and_load(self, tmp_path):
        feats, labels = self._utts()
        out = build_egs(
            iter(feats.items()), str(tmp_path / "egs"), labels=labels,
            num_targets=5, shard_size=4,
        )
        cfg, utts = load_egs(out)
        assert cfg.feat_dim == 8 and cfg.num_targets == 5
        assert len(utts) == 10
        got = {k: (f, l) for k, f, l in utts}
        for k in feats:
            np.testing.assert_array_equal(got[k][0], feats[k])
            np.testing.assert_array_equal(got[k][1], labels[k])

    def test_cmvn_and_truncation(self, tmp_path):
        feats, labels = self._utts(4)
        mean = np.zeros(8) + 2.0
        std = np.ones(8) * 3.0
        out = build_egs(
            iter(feats.items()), str(tmp_path / "egs"), labels=labels,
            cmvn=(mean, std), max_seq_len=30,
        )
        cfg, utts = load_egs(out)
        assert cfg.max_seq_len == 30 and cfg.cmvn_mean == [2.0] * 8
        for k, f, l in utts:
            assert f.shape[0] <= 30 and len(l) == f.shape[0]
            np.testing.assert_allclose(
                f, (feats[k][: f.shape[0]] - 2.0) / 3.0, rtol=1e-5
            )

    def test_bucketed_batches(self, tmp_path):
        feats, labels = self._utts(11)
        out = build_egs(iter(feats.items()), str(tmp_path / "egs"), labels=labels)
        seen = set()
        for batch in iter_egs_batches(out, batch_size=4, bucket_multiple=16):
            B, T, D = batch["feats"].shape
            assert T % 16 == 0 and D == 8
            assert batch["labels"].shape == (B, T)
            assert np.max(batch["lengths"]) <= T
            for i, k in enumerate(batch["keys"]):
                seen.add(k)
                n = batch["lengths"][i]
                np.testing.assert_array_equal(batch["feats"][i, :n], feats[k][:n])
                assert np.all(batch["feats"][i, n:] == 0)
        assert seen == set(feats)
