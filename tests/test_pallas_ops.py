"""Pallas kernel tests (interpret mode on the CPU backend; the same kernel
compiles on real TPU and is the default FDLP fast-path LPC backend —
measured 2.4x faster than the two-scan path at 65k lanes / order 150,
tied at smaller sizes).

ops/pallas_lpc.lpc_cepstra_pallas fuses autocorr-lags -> Levinson ->
gain -> cepstra in one kernel; parity target is the XLA-scan chain
lpc_to_cepstrum(*lpc_from_autocorr(r, order), lim).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from speech_recognition_tools_tpu.ops.cepstrum import lpc_to_cepstrum
from speech_recognition_tools_tpu.ops.levinson import lpc_from_autocorr
from speech_recognition_tools_tpu.ops.pallas_lpc import lpc_cepstra_pallas


def _ar_lags(P, order, n=300, seed=0):
    rng = np.random.RandomState(seed)
    sigs = rng.randn(P, n)
    for a in (0.9, -0.5):
        sigs[:, 1:] += a * sigs[:, :-1]
    return np.stack(
        [
            np.correlate(s, s, "full")[len(s) - 1 : len(s) + order + 2]
            for s in sigs
        ]
    ).astype(np.float32)


@pytest.mark.parametrize(
    "P,order,lim",
    [(64, 30, 40), (48, 50, 50), (16, 150, 100), (8, 20, 2)],
)
def test_fused_lpc_cepstra_matches_scans(P, order, lim):
    r = jnp.asarray(_ar_lags(P, order))
    got = np.asarray(
        lpc_cepstra_pallas(r, order, lim, block=16, interpret=True)
    )
    xlpc, gg = lpc_from_autocorr(jnp.asarray(r, jnp.float32), order)
    ref = np.asarray(lpc_to_cepstrum(xlpc, gg, lim))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_fused_handles_padding_rows():
    """Block padding rows solve a trivial system and are sliced away."""
    r = jnp.asarray(_ar_lags(10, 12))
    got = np.asarray(lpc_cepstra_pallas(r, 12, 20, block=64, interpret=True))
    assert got.shape == (10, 20)
    assert np.isfinite(got).all()


def test_fdlp_fused_backend_matches_scan_backend():
    """End-to-end: FdlpConfig(lpc_backend='fused') == 'scan' on the same
    waveforms (interpret-mode Pallas on CPU)."""
    from speech_recognition_tools_tpu.dsp import FdlpConfig, fdlp_spectrogram_batch
    from speech_recognition_tools_tpu.dsp import fdlp as fdlp_mod
    from speech_recognition_tools_tpu.ops import pallas_lpc

    rng = np.random.RandomState(1)
    x = (rng.randn(2, 8000) * 1000).astype(np.float32)
    lens = np.array([8000, 6000], np.int32)
    cfg_scan = FdlpConfig(nfilters=6, lpc_backend="scan")
    cfg_fused = FdlpConfig(nfilters=6, lpc_backend="fused")
    ref, nref = fdlp_spectrogram_batch(x, lens, cfg_scan)

    orig = pallas_lpc.lpc_cepstra_pallas
    def interp(r, order, lim, block=512, interpret=False):
        return orig(r, order, lim, block=block, interpret=True)
    pallas_lpc.lpc_cepstra_pallas = interp
    try:
        fdlp_mod._fdlp_impl.clear_cache()
        got, ngot = fdlp_spectrogram_batch(x, lens, cfg_fused)
    finally:
        pallas_lpc.lpc_cepstra_pallas = orig
        fdlp_mod._fdlp_impl.clear_cache()
    np.testing.assert_array_equal(np.asarray(ngot), np.asarray(nref))
    T = int(nref[0])
    np.testing.assert_allclose(
        np.asarray(got[0, :T]), np.asarray(ref[0, :T]), rtol=1e-3, atol=2e-3
    )
