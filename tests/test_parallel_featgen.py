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
