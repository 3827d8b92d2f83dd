"""Multi-device feature extraction: the utterance-batch axis of the FDLP
program shards over the 'data' mesh axis (one program replaces the
reference's queue.pl scp-shard fan-out, SURVEY.md §2.8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from speech_recognition_tools_tpu.dsp import FdlpConfig, fdlp_spectrogram_batch
from speech_recognition_tools_tpu.parallel import make_mesh


def test_fdlp_data_parallel_matches_single_device():
    assert jax.device_count() >= 8
    mesh = make_mesh(data=8, model=1)
    B, n = 8, 12000
    rs = np.random.RandomState(0)
    x = (rs.randn(B, n) * 1000).astype(np.float32)
    lens = np.full(B, n, np.int32)
    lens[-1] = n - 3000

    cfg = FdlpConfig(nfilters=6)
    ref, nref = fdlp_spectrogram_batch(x, lens, cfg)

    bsh = NamedSharding(mesh, P("data"))
    xs = jax.device_put(jnp.asarray(x), bsh)
    ls = jax.device_put(jnp.asarray(lens), bsh)
    with mesh:
        out, nout = fdlp_spectrogram_batch(xs, ls, cfg)
    # output stays sharded over 'data'
    np.testing.assert_array_equal(np.asarray(nout), np.asarray(nref))
    for b in range(B):
        T = int(nref[b])
        np.testing.assert_allclose(
            np.asarray(out[b, :T]), np.asarray(ref[b, :T]), rtol=2e-5, atol=2e-5
        )


class TestSequenceParallel:
    """Time-axis (sequence-parallel) featgen, SURVEY §5: the analysis-frame
    axis shards over a 'time' mesh axis; OLA halos are stitched by GSPMD."""

    def test_time_sharded_matches_single_device(self):
        from speech_recognition_tools_tpu.dsp import fdlp_spectrogram_sharded
        from jax.sharding import Mesh

        assert jax.device_count() >= 8
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("time",))
        n = 16000 * 6  # one long utterance
        rs = np.random.RandomState(1)
        x = (rs.randn(1, n) * 1000).astype(np.float32)
        lens = np.array([n - 4000], np.int32)

        cfg = FdlpConfig(nfilters=6)
        ref, nref = fdlp_spectrogram_batch(x, lens, cfg)
        out, nout = fdlp_spectrogram_sharded(x, lens, cfg, mesh)
        np.testing.assert_array_equal(np.asarray(nout), np.asarray(nref))
        T = int(nref[0])
        np.testing.assert_allclose(
            np.asarray(out[0, :T]), np.asarray(ref[0, :T]),
            rtol=2e-5, atol=2e-5,
        )

    def test_data_x_time_mesh(self):
        from speech_recognition_tools_tpu.dsp import fdlp_spectrogram_sharded
        from jax.sharding import Mesh

        assert jax.device_count() >= 8
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "time"))
        B, n = 2, 16000 * 3
        rs = np.random.RandomState(2)
        x = (rs.randn(B, n) * 1000).astype(np.float32)
        lens = np.array([n, n - 7000], np.int32)

        cfg = FdlpConfig(nfilters=6)
        ref, nref = fdlp_spectrogram_batch(x, lens, cfg)
        out, nout = fdlp_spectrogram_sharded(
            x, lens, cfg, mesh, data_axis="data", time_axis="time"
        )
        np.testing.assert_array_equal(np.asarray(nout), np.asarray(nref))
        for b in range(B):
            T = int(nref[b])
            np.testing.assert_allclose(
                np.asarray(out[b, :T]), np.asarray(ref[b, :T]),
                rtol=2e-5, atol=2e-5,
            )


    def test_high_precision_blocked_under_gspmd(self):
        """The f64 high path's default blocked Levinson (auto backend)
        must partition under GSPMD and stay bit-exact with the unsharded
        scan solve — the sharded-auto path selects 'blocked:15' too."""
        from speech_recognition_tools_tpu.dsp import fdlp_spectrogram_sharded
        from jax.sharding import Mesh

        assert jax.device_count() >= 8
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "time"))
        B, n = 2, 16000
        rs = np.random.RandomState(7)
        x = (rs.randn(B, n) * 1000).astype(np.float64)
        lens = np.array([n, n - 5000], np.int32)

        ref, nref = fdlp_spectrogram_batch(
            x, lens, FdlpConfig(nfilters=6, precision="high",
                                lpc_backend="scan:unroll=4")
        )
        out, nout = fdlp_spectrogram_sharded(
            x, lens, FdlpConfig(nfilters=6, precision="high"),
            mesh, data_axis="data", time_axis="time"
        )
        np.testing.assert_array_equal(np.asarray(nout), np.asarray(nref))
        for b in range(B):
            T = int(nref[b])
            np.testing.assert_allclose(
                np.asarray(out[b, :T]), np.asarray(ref[b, :T]),
                rtol=1e-9, atol=1e-9,
            )


class TestInputSharded:
    def test_input_sharded_matches_single_device(self):
        """Sample-sharded featgen (waveform never replicated): parity vs
        the unsharded program, and the compiled executable consumes the
        signal with a sharded (not replicated) input layout."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from speech_recognition_tools_tpu.dsp import (
            fdlp_spectrogram_input_sharded,
        )

        assert jax.device_count() >= 8
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("time",))
        n = 16000 * 6
        rs = np.random.RandomState(4)
        x = (rs.randn(1, n) * 1000).astype(np.float32)
        lens = np.array([n], np.int32)

        cfg = FdlpConfig(nfilters=6)
        ref, nref = fdlp_spectrogram_batch(x, lens, cfg)
        # put the waveform on the mesh already sharded: per-device bytes
        # are n/8 from the start (the HBM claim)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "time")))
        shards = xs.addressable_shards
        assert len(shards) == 8
        assert all(s.data.shape == (1, n // 8) for s in shards)
        out, nout = fdlp_spectrogram_input_sharded(xs, lens, cfg, mesh)
        np.testing.assert_array_equal(np.asarray(nout), np.asarray(nref))
        T = int(nref[0])
        np.testing.assert_allclose(
            np.asarray(out[0, :T]), np.asarray(ref[0, :T]),
            rtol=2e-5, atol=2e-5,
        )

    def test_input_sharded_data_x_time(self):
        from jax.sharding import Mesh

        from speech_recognition_tools_tpu.dsp import (
            fdlp_spectrogram_input_sharded,
        )

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                    ("data", "time"))
        B, n = 2, 16000 * 3
        rs = np.random.RandomState(5)
        x = (rs.randn(B, n) * 1000).astype(np.float32)
        lens = np.full(B, n, np.int32)
        cfg = FdlpConfig(nfilters=5)
        ref, nref = fdlp_spectrogram_batch(x, lens, cfg)
        out, nout = fdlp_spectrogram_input_sharded(
            x, lens, cfg, mesh, data_axis="data"
        )
        np.testing.assert_array_equal(np.asarray(nout), np.asarray(nref))
        for i in range(B):
            T = int(nref[i])
            np.testing.assert_allclose(
                np.asarray(out[i, :T]), np.asarray(ref[i, :T]),
                rtol=2e-5, atol=2e-5,
            )

    def test_input_sharded_rejects_ragged(self):
        from jax.sharding import Mesh

        from speech_recognition_tools_tpu.dsp import (
            fdlp_spectrogram_input_sharded,
        )

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("time",))
        x = np.zeros((1, 16000), np.float32)
        with pytest.raises(ValueError, match="full-length"):
            fdlp_spectrogram_input_sharded(
                x, np.array([12000], np.int32), FdlpConfig(), mesh
            )
