"""Tests for multichannel data simulation (dsp.simulate — the
Generate_mcTrainData_cut.m / CHiME3_simulate_data analogue), GEV phase
correction, and the REVERB-style chained recipe."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_recognition_tools_tpu.dsp.simulate import (
    fft_convolve_full,
    simulate_corpus,
    simulate_utterance,
    synth_rir,
)

RS = np.random.RandomState(11)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestSynthRir:
    def test_shape_and_direct_path(self):
        rir = np.asarray(synth_rir(jax.random.key(0), n_channels=4, fs=16000,
                                   t60=0.3))
        assert rir.shape[0] == 4
        # each channel's direct path is a unit impulse at the geometric delay
        mic_delay = round(2.9e-4 * 16000)
        for c in range(4):
            arrival = 40 + c * mic_delay
            assert rir[c, arrival] == pytest.approx(1.0)
            np.testing.assert_allclose(rir[c, :arrival], 0.0, atol=1e-12)

    def test_t60_decay(self):
        fs = 16000
        rir = np.asarray(synth_rir(jax.random.key(1), 1, fs, t60=0.4,
                                   rir_len=int(0.6 * fs)))
        # tail energy at T60 should be ~60 dB below the early tail
        early = np.mean(rir[0, 100:300] ** 2)
        late = np.mean(rir[0, int(0.4 * fs):] ** 2)
        db = 10 * np.log10(late / early)
        assert db < -40, db


class TestConvolve:
    def test_matches_numpy(self):
        sig = RS.randn(777)
        rir = RS.randn(123)
        ours = np.asarray(fft_convolve_full(jnp.asarray(sig), jnp.asarray(rir)))
        np.testing.assert_allclose(ours, np.convolve(sig, rir), atol=1e-8)


class TestSimulateUtterance:
    def test_snr_and_components(self):
        fs = 16000
        clean = jnp.asarray(RS.randn(fs).astype(np.float32))
        rirs = synth_rir(jax.random.key(0), 3, fs, 0.3)
        obs, wet, ns = simulate_utterance(
            jax.random.key(1), clean, rirs, None, snr_db=10.0,
            return_components=True,
        )
        assert obs.shape == (3, fs)
        np.testing.assert_allclose(np.asarray(obs), np.asarray(wet + ns),
                                   atol=1e-5)
        # realised SNR on channel 0 is the requested one
        snr = 10 * np.log10(
            float(jnp.mean(wet[0] ** 2)) / float(jnp.mean(ns[0] ** 2))
        )
        assert abs(snr - 10.0) < 0.1, snr


class TestSimulateCorpus:
    @pytest.mark.slow
    def test_artefacts(self, tmp_path):
        utts = [(f"u{i}", RS.randn(8000).astype(np.float32)) for i in range(3)]
        meta = simulate_corpus(
            utts, str(tmp_path / "wav"), fs=16000, n_channels=2, snr_db=15.0,
            seed=3,
        )
        assert set(meta) == {"u0", "u1", "u2"}
        for name in ["wav.scp", "clean.scp", "wet.scp", "noise.scp",
                     "wav_ch0.scp", "wav_ch1.scp"]:
            assert os.path.exists(tmp_path / "wav" / name), name
        from scipy.io.wavfile import read as wav_read

        sr, sig = wav_read(tmp_path / "wav" / "u0_ch1.wav")
        assert sr == 16000 and sig.shape == (8000,)
        # mixture = wet + noise at ch0
        _, obs = wav_read(tmp_path / "wav" / "u0_ch0.wav")
        _, wet = wav_read(tmp_path / "wav" / "u0_wet.wav")
        _, ns = wav_read(tmp_path / "wav" / "u0_noise.wav")
        np.testing.assert_allclose(obs, wet + ns, atol=1e-4)


class TestPhaseCorrection:
    def test_aligns_neighbouring_bins(self):
        from speech_recognition_tools_tpu.enhance.beamforming import (
            phase_correction,
        )

        base = RS.randn(4) + 1j * RS.randn(4)
        phases = RS.rand(64) * 2 * np.pi
        w = base[None, :] * np.exp(1j * phases)[:, None]
        out = phase_correction(w)
        # after correction all bins share (up to a global phase) the base
        corr = out[1:] * out[:-1].conj()
        np.testing.assert_allclose(np.angle(np.sum(corr, axis=1)), 0.0,
                                   atol=1e-10)
        # magnitudes untouched
        np.testing.assert_allclose(np.abs(out), np.abs(w), rtol=1e-12)


@pytest.mark.slow
def test_reverb_recipe_end_to_end(tmp_path):
    """Run the full chained pipeline (simulate -> WPE -> mask/GEV ->
    metrics -> FDLP -> e2e ASR) on a tiny corpus and assert the enhanced
    output beats the noisy channel on the REVERB SE metrics."""
    import json

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # a JAX_PLATFORMS=cpu child can still hang on the axon plugin's
    # tunnel initialisation when the tunnel is wedged (observed
    # 2026-08-17); drop the plugin env entirely like
    # __graft_entry__._reexec_virtual does
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "recipes", "reverb_demo", "run.py"),
         "--expdir", str(tmp_path / "exp"), "--num_utts", "12",
         "--masknet_epochs", "12", "--e2e_epochs", "2"],
        capture_output=True, text=True, env=env, timeout=3000,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    scores = json.load(open(tmp_path / "exp" / "se_scores.json"))
    noisy, enh = scores["noisy"], scores["enhanced"]
    assert enh["pesq"] > noisy["pesq"] + 0.3, (noisy, enh)
    assert enh["srmr"] > noisy["srmr"], (noisy, enh)
    assert enh["cepsdist"] < noisy["cepsdist"], (noisy, enh)
    # chain artefacts: enhanced wavs, FDLP feats, e2e hyp text + WER report
    assert os.path.exists(tmp_path / "exp" / "enhanced.scp")
    assert os.path.exists(tmp_path / "exp" / "fdlp.scp")
    assert os.path.exists(tmp_path / "exp" / "hyp.text")
