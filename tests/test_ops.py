"""Low-level op tests."""

import numpy as np
import pytest

import jax.numpy as jnp




class TestStridedFraming:
    """The strided-slice framing fast path must match the one-gather
    formulation exactly (which is itself golden vs the reference
    generator in test_dsp_parity)."""

    @pytest.mark.parametrize(
        "srate,frate,flength",
        [
            (16000, 1.0 / (0.75 * 0.5), 0.5),    # FDLP light
            (16000, 1.0 / (0.75 * 1.5), 1.5),    # FDLP production
            (16000, 100.0, 0.025),               # melspec/mfcc geometry
            (8000, 1.0 / (0.75 * 0.5), 0.5),     # 8 kHz
        ],
    )
    def test_matches_gather(self, srate, frate, flength):
        from speech_recognition_tools_tpu.ops.framing import (
            _frame_signal_gather,
            frame_count,
            frame_params,
            frame_signal,
        )

        fp = frame_params(srate, frate, flength)
        rs = np.random.RandomState(3)
        nmax = int(srate * 2.3)
        B = 4
        x = jnp.asarray(rs.randn(B, nmax).astype(np.float32))
        lens = jnp.asarray(
            [nmax, nmax - fp.frate_samples // 2, nmax - 2777,
             max(fp.flength_samples // 2, 100)],
            jnp.int32,
        )
        F = int(frame_count(nmax, fp))
        win = jnp.asarray(np.hamming(fp.flength_samples), jnp.float32)
        got, ngot = frame_signal(x, lens, fp, win, F)
        ref, nref = _frame_signal_gather(x, lens, fp, win, F)
        np.testing.assert_array_equal(np.asarray(ngot), np.asarray(nref))
        for b in range(B):
            nf = int(nref[b])
            np.testing.assert_allclose(
                np.asarray(got[b, :nf]), np.asarray(ref[b, :nf]),
                rtol=0, atol=0,
            )

    def test_short_utterance_fixup_overlap(self):
        """nframes < n_right: left and right fixups overlap; must still
        be exact."""
        from speech_recognition_tools_tpu.ops.framing import (
            _frame_signal_gather,
            frame_count,
            frame_params,
            frame_signal,
        )

        fp = frame_params(16000, 1.0 / (0.75 * 0.5), 0.5)
        rs = np.random.RandomState(4)
        nmax = 16000
        x = jnp.asarray(rs.randn(2, nmax).astype(np.float32))
        lens = jnp.asarray([nmax, 4000], jnp.int32)  # second very short
        F = int(frame_count(nmax, fp))
        win = jnp.ones((fp.flength_samples,), jnp.float32)
        got, ngot = frame_signal(x, lens, fp, win, F)
        ref, nref = _frame_signal_gather(x, lens, fp, win, F)
        for b in range(2):
            nf = int(nref[b])
            np.testing.assert_array_equal(
                np.asarray(got[b, :nf]), np.asarray(ref[b, :nf])
            )

    @pytest.mark.parametrize(
        "srate,frate,flength",
        [
            (16000, 1.0 / (0.75 * 0.5), 0.5),
            (16000, 1.0 / (0.75 * 1.5), 1.5),
            (16000, 100.0, 0.025),
        ],
    )
    def test_gather_free_path_matches(self, srate, frate, flength):
        """min_samples >= extend+2 enables the flip/dynamic-slice reflect
        construction; must equal the gather oracle exactly."""
        from speech_recognition_tools_tpu.ops.framing import (
            _frame_signal_gather,
            frame_count,
            frame_params,
            frame_signal,
        )

        fp = frame_params(srate, frate, flength)
        rs = np.random.RandomState(9)
        nmax = int(srate * 2.1)
        B = 3
        x = jnp.asarray(rs.randn(B, nmax).astype(np.float32))
        lens = jnp.asarray(
            [nmax, max(fp.extend + 2, nmax - 3333), fp.extend + 2],
            jnp.int32,
        )
        F = int(frame_count(nmax, fp))
        win = jnp.asarray(np.hamming(fp.flength_samples), jnp.float32)
        got, ngot = frame_signal(
            x, lens, fp, win, F, min_samples=fp.extend + 2
        )
        ref, nref = _frame_signal_gather(x, lens, fp, win, F)
        np.testing.assert_array_equal(np.asarray(ngot), np.asarray(nref))
        for b in range(B):
            nf = int(nref[b])
            np.testing.assert_array_equal(
                np.asarray(got[b, :nf]), np.asarray(ref[b, :nf])
            )


class TestBluesteinDct:
    """dct2's pow2-FFT Bluestein fast path vs scipy.fftpack (and vs the
    matmul fallback on odd N)."""

    @pytest.mark.parametrize("N", [64, 400, 8000, 24000])
    def test_matches_scipy(self, N):
        from scipy.fftpack import dct as sdct

        from speech_recognition_tools_tpu.ops.dct import dct2

        rs = np.random.RandomState(11)
        x = rs.randn(4, N).astype(np.float32)
        ref = sdct(x.astype(np.float64), type=2, axis=-1)
        got = np.asarray(dct2(jnp.asarray(x)))
        rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert rel < 1e-5, rel

    def test_odd_n_falls_back(self):
        from scipy.fftpack import dct as sdct

        from speech_recognition_tools_tpu.ops.dct import dct2

        rs = np.random.RandomState(12)
        x = rs.randn(3, 401).astype(np.float32)
        ref = sdct(x.astype(np.float64), type=2, axis=-1)
        got = np.asarray(dct2(jnp.asarray(x)))
        rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert rel < 1e-5, rel


class TestBluesteinFft:
    @pytest.mark.parametrize("N", [100, 8000, 24000, 128])
    def test_forward_and_inverse_match_numpy(self, N):
        from speech_recognition_tools_tpu.ops.dct import bluestein_fft

        rs = np.random.RandomState(13)
        x = (rs.randn(3, N) + 1j * rs.randn(3, N)).astype(np.complex64)
        got_f = np.asarray(bluestein_fft(jnp.asarray(x)))
        ref_f = np.fft.fft(x, axis=-1)
        rel = np.max(np.abs(got_f - ref_f)) / np.max(np.abs(ref_f))
        assert rel < 1e-5, rel
        got_i = np.asarray(bluestein_fft(jnp.asarray(x), inverse=True))
        ref_i = np.fft.ifft(x, axis=-1)
        rel = np.max(np.abs(got_i - ref_i)) / np.max(np.abs(ref_i))
        assert rel < 1e-5, rel


class TestFft64:
    """Mixed-radix Stockham f64 FFT + DCT (ops/fft64) — the TPU-era f64
    transform (XLA has no f64 FFT on TPU)."""

    def test_fft_matches_numpy(self):
        from speech_recognition_tools_tpu.ops.fft64 import fft_f64, smooth_even

        rs = np.random.RandomState(3)
        for n in (8, 60, 480, 1024, 4000, 24000):
            assert smooth_even(n)
            x = rs.randn(2, n) + 1j * rs.randn(2, n)
            yr, yi = fft_f64(jnp.asarray(x.real), jnp.asarray(x.imag))
            got = np.asarray(yr) + 1j * np.asarray(yi)
            ref = np.fft.fft(x)
            assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-13

    def test_ifft_roundtrip(self):
        from speech_recognition_tools_tpu.ops.fft64 import fft_f64

        rs = np.random.RandomState(4)
        x = rs.randn(3, 960) + 1j * rs.randn(3, 960)
        yr, yi = fft_f64(jnp.asarray(x.real), jnp.asarray(x.imag))
        zr, zi = fft_f64(yr, yi, inverse=True)
        got = np.asarray(zr) + 1j * np.asarray(zi)
        np.testing.assert_allclose(got, x, atol=1e-12)

    def test_dct_matches_scipy(self):
        import scipy.fftpack as fftpack

        from speech_recognition_tools_tpu.ops.fft64 import dct2_f64

        rs = np.random.RandomState(5)
        # smooth lengths take the direct Makhoul path (on CPU); a
        # non-smooth even length (1022 = 2*7*73) exercises Bluestein
        for n in (4000, 8000, 24000, 1022):
            x = rs.randn(2, n) * 1000
            ours = np.asarray(dct2_f64(jnp.asarray(x)))
            ref = fftpack.dct(x)
            assert np.max(np.abs(ours - ref)) / np.max(np.abs(ref)) < 1e-13

    def test_smoothness_detection(self):
        from speech_recognition_tools_tpu.ops.fft64 import smooth_even

        assert smooth_even(24000) and smooth_even(8000)
        assert not smooth_even(1022)  # factor 7 * 73
        assert not smooth_even(7)


    def test_packed_core_matches_scipy_at_tpu_lengths(self):
        """_dct2_f64_packed is the path every length takes on TPU (the
        mixed-radix stages hang the TPU compiler); exercise it directly
        at the production window lengths the CPU dispatch would
        otherwise route to the direct Makhoul form."""
        import scipy.fftpack as fftpack

        from speech_recognition_tools_tpu.ops.fft64 import _dct2_f64_packed

        rs = np.random.RandomState(6)
        for n in (4000, 8000, 24000):
            x = rs.randn(2, n) * 1000
            v = np.concatenate([x[..., ::2], x[..., 1::2][..., ::-1]], -1)
            ours = np.asarray(_dct2_f64_packed(jnp.asarray(v)))
            ref = fftpack.dct(x)
            assert np.max(np.abs(ours - ref)) / np.max(np.abs(ref)) < 1e-13


class TestScanUnroll:
    """lpc_backend='scan:unroll=N' (the f64 'auto' path) must agree with
    the plain scan — unrolling only changes XLA scheduling."""

    def test_unrolled_scans_match_plain(self):
        from speech_recognition_tools_tpu.ops.cepstrum import lpc_to_cepstrum
        from speech_recognition_tools_tpu.ops.levinson import lpc_from_autocorr

        rs = np.random.RandomState(7)
        sig = rs.randn(6, 2048)
        p, C = 150, 100
        r = np.stack(
            [np.correlate(s, s, "full")[2047 : 2047 + p + 2] for s in sig]
        )
        rj = jnp.asarray(r)
        a1, g1 = lpc_from_autocorr(rj, p, unroll=1)
        a4, g4 = lpc_from_autocorr(rj, p, unroll=4)
        np.testing.assert_allclose(np.asarray(a4), np.asarray(a1), rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(g4), np.asarray(g1), rtol=1e-12)
        c1 = lpc_to_cepstrum(a1, g1, C, unroll=1)
        c4 = lpc_to_cepstrum(a1, g1, C, unroll=4)
        np.testing.assert_allclose(np.asarray(c4), np.asarray(c1), rtol=1e-12, atol=1e-12)

    def test_fdlp_unroll_backend_string(self):
        from speech_recognition_tools_tpu.dsp import (
            FdlpConfig,
            fdlp_spectrogram_batch,
        )

        rng = np.random.RandomState(8)
        x = (rng.randn(2, 8000) * 1000).astype(np.float32)
        lens = np.array([8000, 6000], np.int32)
        ref, nref = fdlp_spectrogram_batch(
            x, lens, FdlpConfig(nfilters=6, lpc_backend="scan")
        )
        got, ngot = fdlp_spectrogram_batch(
            x, lens, FdlpConfig(nfilters=6, lpc_backend="scan:unroll=4")
        )
        np.testing.assert_array_equal(np.asarray(ngot), np.asarray(nref))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

class TestBlockedLevinson:
    """levinson_durbin_blocked (blocked Schur/Szego) is a restructuring of
    the scan recursion, not an approximation: machine-eps agreement at
    every block size, including the degenerate-band guard paths."""

    def _lags(self, sig, p):
        return np.stack(
            [
                np.correlate(s, s, "full")[len(s) - 1 : len(s) + p + 1]
                for s in sig
            ]
        )

    # every geometry except block=15 (the production regime) is a
    # compile-heavy edge case (40-51 s each on the 1-core CI box) —
    # slow-gated; `pytest -m ''` sweeps 1/7/15/40/200
    @pytest.mark.parametrize(
        "block",
        [pytest.param(1, marks=pytest.mark.slow),
         pytest.param(7, marks=pytest.mark.slow), 15,
         pytest.param(40, marks=pytest.mark.slow),
         pytest.param(200, marks=pytest.mark.slow)],
    )
    def test_matches_scan(self, block):
        from speech_recognition_tools_tpu.ops.levinson import (
            levinson_durbin,
            levinson_durbin_blocked,
        )

        rs = np.random.RandomState(11)
        p = 60
        r = jnp.asarray(self._lags(rs.randn(5, 1024), p))
        a0, e0 = levinson_durbin(r, p, return_error=True)
        a1, e1 = levinson_durbin_blocked(r, p, block=block, return_error=True)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=1e-12)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e0), atol=1e-13)

    @pytest.mark.slow
    def test_degenerate_bands_stay_guarded(self):
        """Silent (r=0) and pure-tone (|k|->1 clamp) lanes must stay
        bounded under the same guards as the scan. Exact value agreement
        is impossible there: e underflows towards 0 and k = -num/e
        amplifies the rounding difference between the blocked numerator
        (propagated phi) and the scan's (fresh predictor dot) — even the
        scan's own output in that regime is rounding noise shaped by the
        clamp. A healthy lane in the same batch must still match."""
        from speech_recognition_tools_tpu.ops.levinson import (
            levinson_durbin,
            levinson_durbin_blocked,
        )

        p = 24
        lags = np.arange(p + 1)
        r = np.stack(
            [
                np.zeros(p + 1),                      # silence: r0 == 0
                np.cos(2 * np.pi * 0.1 * lags),       # pure tone: e -> 0
                self._lags(np.random.RandomState(3).randn(1, 512), p - 1)[0],
            ]
        )
        a0, e0 = levinson_durbin(jnp.asarray(r), p, return_error=True)
        a1, e1 = levinson_durbin_blocked(
            jnp.asarray(r), p, block=7, return_error=True
        )
        a0, e0, a1, e1 = (np.asarray(v) for v in (a0, e0, a1, e1))
        # silence lane: all-zero predictor, e stays 1 (identical to scan)
        np.testing.assert_array_equal(a1[0], np.zeros(p))
        np.testing.assert_array_equal(e1[0], 1.0)
        # pure-tone lane: finite, same magnitude class as the guarded
        # scan (no overflow into the downstream cepstrum), e >= 0
        assert np.all(np.isfinite(a1[1])) and np.all(np.isfinite(e1))
        assert np.abs(a1[1]).max() < 100 * max(np.abs(a0[1]).max(), 1.0)
        assert e1[1] >= 0
        # healthy lane: machine-eps agreement, degenerate lanes in the
        # batch must not perturb it
        np.testing.assert_allclose(a1[2], a0[2], atol=1e-12)
        np.testing.assert_allclose(e1[2], e0[2], atol=1e-13)

    def test_complex_raises(self):
        from speech_recognition_tools_tpu.ops.levinson import (
            levinson_durbin_blocked,
        )

        r = jnp.ones((2, 5), jnp.complex128)
        with pytest.raises(NotImplementedError):
            levinson_durbin_blocked(r, 4)

    def test_fdlp_blocked_backend_string(self):
        from speech_recognition_tools_tpu.dsp import (
            FdlpConfig,
            fdlp_spectrogram_batch,
        )

        rng = np.random.RandomState(9)
        x = (rng.randn(2, 8000) * 1000).astype(np.float32)
        lens = np.array([8000, 6000], np.int32)
        ref, nref = fdlp_spectrogram_batch(
            x, lens, FdlpConfig(nfilters=6, lpc_backend="scan")
        )
        got, ngot = fdlp_spectrogram_batch(
            x, lens, FdlpConfig(nfilters=6, lpc_backend="blocked:5")
        )
        np.testing.assert_array_equal(np.asarray(ngot), np.asarray(nref))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
