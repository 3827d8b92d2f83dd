"""On-chip (JAX) enhancement pipeline vs the host golden implementations.

enhance/beamforming.py and enhance/wpe.py are themselves golden-tested
against nn-gev / the reference WPE flow (test_decode_eval_enhance.py), so
matching them transitively matches the reference. The on-chip pipeline
routes every complex eigensolve/solve through ops/clinalg's real symmetric
embedding (the TPU-lowerable form); these tests pin

  * the embedding algebra itself (eigh_c / solve_hpd_c vs numpy),
  * GEV / MVDR / WPE / quantile-mask parity with the host pipeline,
  * that the full waveform->waveform chain jits as one program.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_recognition_tools_tpu.enhance import beamforming as bf
from speech_recognition_tools_tpu.enhance import masks
from speech_recognition_tools_tpu.enhance import onchip
from speech_recognition_tools_tpu.enhance import wpe as wpe_host
from speech_recognition_tools_tpu.ops import clinalg


def _random_hpd(rng, b, n, dtype=np.complex128):
    m = rng.standard_normal((b, n, n)) + 1j * rng.standard_normal((b, n, n))
    return (m @ np.conj(np.swapaxes(m, -1, -2)) + 0.1 * np.eye(n)).astype(dtype)


class TestClinalg:
    def test_eigh_c_matches_numpy(self):
        rng = np.random.default_rng(0)
        h = _random_hpd(rng, 5, 6)
        w, v = clinalg.eigh_c(jnp.asarray(h))
        w, v = np.asarray(w), np.asarray(v)
        np.testing.assert_allclose(w, np.linalg.eigvalsh(h), rtol=1e-10,
                                   atol=1e-10)
        resid = np.einsum("bij,bjk->bik", h, v) - v * w[:, None, :]
        assert np.abs(resid).max() < 1e-9
        norms = np.sum(np.abs(v) ** 2, axis=-2)
        np.testing.assert_allclose(norms, 1.0, atol=1e-12)

    def test_principal_eigvec(self):
        rng = np.random.default_rng(1)
        h = _random_hpd(rng, 3, 5)
        top = np.asarray(clinalg.principal_eigvec_c(jnp.asarray(h)))
        w_ref = np.linalg.eigvalsh(h)[:, -1]
        resid = np.einsum("bij,bj->bi", h, top) - w_ref[:, None] * top
        assert np.abs(resid).max() < 1e-9

    def test_solve_hpd(self):
        rng = np.random.default_rng(2)
        a = _random_hpd(rng, 4, 5)
        b = rng.standard_normal((4, 5, 3)) + 1j * rng.standard_normal((4, 5, 3))
        x = np.asarray(clinalg.solve_hpd_c(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(
            np.einsum("bij,bjk->bik", a, x), b, atol=1e-9
        )

    def test_float32_path(self):
        # the dtype the TPU path actually runs
        rng = np.random.default_rng(3)
        h = _random_hpd(rng, 2, 4, dtype=np.complex64)
        w, v = clinalg.eigh_c(jnp.asarray(h))
        assert np.asarray(v).dtype == np.complex64
        resid = np.einsum("bij,bjk->bik", h, np.asarray(v)) - np.asarray(
            v
        ) * np.asarray(w)[:, None, :]
        assert np.abs(resid).max() < 1e-3


@pytest.fixture(scope="module")
def stft_like():
    rng = np.random.default_rng(7)
    F, D, T = 33, 4, 50
    x = rng.standard_normal((F, D, T)) + 1j * rng.standard_normal((F, D, T))
    sp = rng.uniform(0.0, 1.0, (F, T))
    return x, sp, 1.0 - sp


class TestOnchipVsHost:
    def test_gev_pipeline(self, stft_like):
        x, sp, nz = stft_like
        y_host = bf.gev_beamform(x, sp, nz)
        y_dev = np.asarray(
            jax.jit(onchip.gev_beamform_onchip)(
                jnp.asarray(x), jnp.asarray(sp), jnp.asarray(nz)
            )
        )
        # phase alignment makes relative phases deterministic; one global
        # phase remains free
        phi = np.angle(np.vdot(y_host, y_dev))
        err = np.abs(y_dev * np.exp(-1j * phi) - y_host).max()
        assert err / np.abs(y_host).max() < 1e-10

    def test_gev_normalization(self, stft_like):
        # w^H Phi_NN w = 1, the scipy.eigh(a, b) convention the host keeps
        x, sp, nz = stft_like
        phi_x = bf.power_spectral_density_matrix(x, sp)
        phi_n = bf.power_spectral_density_matrix(x, nz)
        w = np.asarray(
            onchip.gev_vector_onchip(jnp.asarray(phi_x), jnp.asarray(phi_n))
        )
        quad = np.einsum("fa,fab,fb->f", w.conj(), phi_n, w).real
        np.testing.assert_allclose(quad, 1.0, rtol=1e-8)

    def test_mvdr_weights(self, stft_like):
        x, sp, nz = stft_like
        phi_x = bf.power_spectral_density_matrix(x, sp)
        phi_n = bf.power_spectral_density_matrix(x, nz)
        atf = np.asarray(clinalg.principal_eigvec_c(jnp.asarray(phi_x)))
        w_host = bf.mvdr_vector(atf, phi_n)
        w_dev = np.asarray(
            onchip.mvdr_vector_onchip(jnp.asarray(atf), jnp.asarray(phi_n))
        )
        # PCA phase is shared (same atf), so weights match directly up to
        # the diagonal loading difference
        assert np.abs(w_dev - w_host).max() / np.abs(w_host).max() < 1e-8

    def test_wpe(self):
        rng = np.random.default_rng(8)
        y = rng.standard_normal((17, 3, 40)) + 1j * rng.standard_normal(
            (17, 3, 40)
        )
        x_host = wpe_host.wpe(y, taps=4, delay=2, iterations=3)
        x_dev = np.asarray(
            jax.jit(
                lambda a: onchip.wpe_onchip(a, taps=4, delay=2, iterations=3)
            )(jnp.asarray(y))
        )
        np.testing.assert_allclose(x_dev, x_host, atol=1e-10)

    def test_quantile_mask(self, stft_like):
        x, _, _ = stft_like
        np.testing.assert_array_equal(
            np.asarray(onchip.quantile_mask_onchip(jnp.asarray(x))),
            masks.quantile_mask(x),
        )


def _noisy_scene(n=8000, channels=4, noise=1.0, seed=9):
    rng = np.random.default_rng(seed)
    clean = np.convolve(rng.standard_normal(n), np.ones(8) / 8.0, mode="same")
    t = np.arange(n) / 8000.0
    clean *= 0.5 + 0.5 * np.sin(2 * np.pi * 4.0 * t) ** 2
    mc = np.stack([np.roll(clean, d) for d in range(channels)])
    return clean, mc + rng.standard_normal(mc.shape) * noise


class TestFullChain:
    def test_chain_matches_host_composition(self):
        # the same mask policy + host gev_beamform, composed by hand,
        # must agree with the one-program chain up to one global phase
        # (compared pre-synthesis: synthesis bakes the phase into the
        # waveform as a benign cos/Hilbert mix)
        from speech_recognition_tools_tpu.enhance.stft import stft

        _, noisy = _noisy_scene()
        X = np.asarray(stft(jnp.asarray(noisy)))  # (ch, T, F)
        spc = np.asarray(onchip.quantile_mask_onchip(jnp.asarray(X)))
        spf = np.median(np.transpose(spc, (2, 0, 1)), axis=1)  # (F, T)
        y_host = bf.gev_beamform(
            np.transpose(X, (2, 0, 1)), spf, 1.0 - spf
        )
        y_dev = np.asarray(
            jax.jit(
                lambda s: onchip.gev_enhance_chain(s, return_stft=True)
            )(jnp.asarray(noisy))
        )
        phi = np.angle(np.vdot(y_host, y_dev))
        err = np.abs(y_dev * np.exp(-1j * phi) - y_host).max()
        assert err / np.abs(y_host).max() < 1e-9

    def test_chain_jits_and_enhances(self):
        # delayed copies of one source + strong white noise: the
        # beamformed output's spectrogram should track the clean source
        # better than any single noisy channel. (Waveform-domain
        # correlation is NOT a valid metric here — the GEV weights carry
        # a global phase, so the synthesized waveform is an arbitrary
        # cos/Hilbert mix of the underlying source.)
        from speech_recognition_tools_tpu.enhance.stft import stft

        clean, noisy = _noisy_scene()
        out = np.asarray(
            jax.jit(onchip.gev_enhance_chain)(jnp.asarray(noisy))
        )
        assert out.shape == clean.shape

        def magcorr(a, b):
            A = np.abs(np.asarray(stft(jnp.asarray(a)))).ravel()
            B = np.abs(np.asarray(stft(jnp.asarray(b)))).ravel()
            A -= A.mean()
            B -= B.mean()
            return (A @ B) / np.sqrt((A @ A) * (B @ B))

        c_out = magcorr(out, clean)
        c_in = max(magcorr(noisy[d], clean) for d in range(4))
        assert c_out > c_in + 0.02, (c_out, c_in)
