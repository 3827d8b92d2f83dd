"""Pallas kernel tests (interpret mode on the CPU backend; the same kernel
compiles and matches the XLA scan on real TPU — verified in-session)."""

import numpy as np

import jax.numpy as jnp

from speech_recognition_tools_tpu.ops.levinson import levinson_durbin
from speech_recognition_tools_tpu.ops.pallas_levinson import levinson_durbin_pallas


def test_pallas_levinson_matches_scan():
    rng = np.random.RandomState(0)
    P, order = 64, 30
    sigs = rng.randn(P, 300)
    for a in (0.9, -0.5):
        sigs[:, 1:] += a * sigs[:, :-1]
    r = np.stack(
        [np.correlate(s, s, "full")[len(s) - 1 : len(s) + order + 1] for s in sigs]
    ).astype(np.float32)
    got = np.asarray(
        levinson_durbin_pallas(jnp.asarray(r), order, block=32, interpret=True)
    )
    ref = np.asarray(levinson_durbin(jnp.asarray(r, jnp.float32), order))
    np.testing.assert_allclose(got, ref, atol=2e-5)
