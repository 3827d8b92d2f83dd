"""Multichannel corpus simulation: synthetic room impulse responses,
reverberant mixing, and a corpus driver.

Reference behaviour: the REVERB/CHiME recipes generate multi-condition
training data by convolving clean speech with measured multichannel RIRs
and adding recorded noise at a fixed SNR
(/root/reference/e2e/reverb/local/Generate_mcTrainData_cut.m: SNRdB=20,
24 RIR variants x small/medium/large rooms, per-utterance random pick;
/root/reference/recipes/chime4/local/CHiME3_simulate_data_patched_parallel.m:
noise-estimate + scaled clean superposition per channel).

TPU redesign: measured RIR wavs don't ship with the toolkit, so RIRs are
*synthesised* — a coherent direct path with geometric inter-channel delays
plus an exponentially decaying diffuse tail (decorrelated across
channels), parameterised by T60. All convolution/mixing is batched jitted
XLA with power-of-two FFTs (non-pow2 TPU FFT is pathologically slow), so
a corpus simulates as a handful of compiled programs rather than a
per-file MATLAB loop.
"""

import jax
import jax.numpy as jnp
import numpy as np




def synth_rir(
    key,
    n_channels: int = 4,
    fs: int = 16000,
    t60: float = 0.4,
    rir_len: int | None = None,
    direct_delay: int = 40,
    mic_spacing_s: float = 2.9e-4,
    direct_to_reverb_db: float = 3.0,
):
    """Synthesise a (C, L) multichannel RIR.

    Each channel gets a unit direct-path impulse at
    direct_delay + c * round(mic_spacing_s * fs) (a far-field source off
    the array axis: ~10 cm spacing -> ~0.29 ms inter-mic delay), followed
    by a diffuse tail of Gaussian noise with an exp(-t * 6.9 / T60)
    envelope. The tail is partially correlated across channels (shared
    early reflections, decorrelated late field) — the structure GEV/MVDR
    beamforming exploits.
    """
    if rir_len is None:
        rir_len = int(1.5 * t60 * fs)
    rir_len = max(rir_len, direct_delay + 8)
    k_shared, k_diffuse = jax.random.split(key)
    t = jnp.arange(rir_len) / fs
    decay = jnp.exp(-6.9077 * t / t60)  # ln(10^3) = 6.9077: -60 dB at T60
    shared = jax.random.normal(k_shared, (rir_len,))
    diffuse = jax.random.normal(k_diffuse, (n_channels, rir_len))
    # early (first ~50 ms) reflections coherent, late field decorrelated
    early = jnp.clip(1.0 - t / 0.05, 0.0, 1.0)
    tail = (early * shared[None, :] + (1.0 - early) * diffuse) * decay[None, :]
    # zero the tail before the direct path arrives
    mic_delay = int(round(mic_spacing_s * fs))
    arrivals = direct_delay + mic_delay * jnp.arange(n_channels)
    tmask = jnp.arange(rir_len)[None, :] > arrivals[:, None]
    tail = tail * tmask
    # direct path: unit impulse per channel, tail scaled for the target DRR
    direct = jax.nn.one_hot(arrivals, rir_len, dtype=tail.dtype)
    tail_energy = jnp.sqrt(jnp.sum(tail**2, axis=1, keepdims=True))
    g = 10.0 ** (-direct_to_reverb_db / 20.0) / jnp.maximum(tail_energy, 1e-12)
    return direct + g * tail


def fft_convolve_full(sig, rir):
    """Full convolution along the last axis via pow2 rFFT.

    sig (..., N), rir (..., L) -> (..., N + L - 1); leading dims broadcast.
    """
    n = sig.shape[-1] + rir.shape[-1] - 1
    from speech_recognition_tools_tpu.ops.dct import _next_pow2

    nfft = _next_pow2(max(n, 2))
    S = jnp.fft.rfft(sig, nfft)
    H = jnp.fft.rfft(rir, nfft)
    return jnp.fft.irfft(S * H, nfft)[..., :n]


def simulate_utterance(
    key, clean, rirs, noise=None, snr_db: float = 20.0,
    return_components: bool = False,
):
    """One clean (N,) utterance -> (C, N) reverberant noisy observation.

    Matches the Generate_mcTrainData_cut.m recipe: reverberant image =
    conv(clean, rir_c) cut back to N samples; additive noise scaled so the
    *first channel* sits at snr_db (the reference scales by the energy of
    channel 1 and applies the same gain to every channel, keeping the
    noise spatially coherent with its own field).

    noise: (C, >=N) multichannel noise, (M,) mono (re-used on every
    channel), or None for white Gaussian noise.
    """
    C = rirs.shape[0]
    n = clean.shape[-1]
    wet = fft_convolve_full(clean[None, :], rirs)[:, :n]
    if noise is None:
        ns = jax.random.normal(key, (C, n), wet.dtype)
    elif noise.ndim == 1:
        off = jax.random.randint(key, (), 0, max(noise.shape[0] - n, 1))
        ns = jnp.broadcast_to(
            jax.lax.dynamic_slice(noise, (off,), (n,))[None, :], (C, n)
        )
    else:
        off = jax.random.randint(key, (), 0, max(noise.shape[-1] - n, 1))
        ns = jax.lax.dynamic_slice(noise, (0, off), (C, n))
    e_s = jnp.mean(wet[0] ** 2)
    e_n = jnp.mean(ns[0] ** 2)
    g = jnp.sqrt(e_s / jnp.maximum(e_n * 10.0 ** (snr_db / 10.0), 1e-20))
    if return_components:
        # parallel wet-speech / scaled-noise images — the CHiME simulation's
        # .Clean/.Noise artefacts that IBM mask training consumes
        return wet + g * ns, wet, g * ns
    return wet + g * ns


def simulate_corpus(
    clean_utts,
    out_dir: str,
    *,
    fs: int = 16000,
    n_channels: int = 4,
    snr_db: float = 20.0,
    t60_choices=(0.25, 0.5, 0.7),
    noise=None,
    seed: int = 0,
):
    """Simulate a multi-condition multichannel corpus.

    clean_utts: iterable of (utt_id, (N,) float array). Writes
    <out_dir>/<utt>_ch<k>.wav plus wav_ch<k>.scp per channel, a combined
    wav.scp (channel 0), and clean reference wavs + clean.scp — the same
    artefact layout the REVERB data prep stages produce (wav dir + per
    condition scp).  Returns the per-utterance metadata dict.

    Per utterance a T60 is drawn from t60_choices and a fresh RIR is
    synthesised — the analogue of Generate_mcTrainData_cut.m's random
    pick among its 24 measured RIRs.
    """
    import os

    from scipy.io.wavfile import write as wav_write

    os.makedirs(out_dir, exist_ok=True)
    key = jax.random.key(seed)
    scps = {c: [] for c in range(n_channels)}
    clean_scp, meta = [], {}
    for utt, sig in clean_utts:
        sig = np.asarray(sig, np.float32)
        key, k_rir, k_mix, k_t60 = jax.random.split(key, 4)
        t60 = float(
            np.asarray(t60_choices)[
                int(jax.random.randint(k_t60, (), 0, len(t60_choices)))
            ]
        )
        rirs = synth_rir(k_rir, n_channels, fs, t60)
        obs, wet, ns = simulate_utterance(
            k_mix, jnp.asarray(sig), rirs, noise, snr_db,
            return_components=True,
        )
        obs = np.asarray(obs)
        clean_path = os.path.join(out_dir, f"{utt}_clean.wav")
        wav_write(clean_path, fs, sig)
        clean_scp.append(f"{utt} {clean_path}")
        wav_write(
            os.path.join(out_dir, f"{utt}_wet.wav"), fs,
            np.asarray(wet[0], np.float32),
        )
        wav_write(
            os.path.join(out_dir, f"{utt}_noise.wav"), fs,
            np.asarray(ns[0], np.float32),
        )
        for c in range(n_channels):
            path = os.path.join(out_dir, f"{utt}_ch{c}.wav")
            wav_write(path, fs, np.asarray(obs[c], np.float32))
            scps[c].append(f"{utt} {path}")
        meta[utt] = {"t60": t60, "snr_db": snr_db, "n_channels": n_channels}
    for c in range(n_channels):
        with open(os.path.join(out_dir, f"wav_ch{c}.scp"), "w") as f:
            f.write("\n".join(scps[c]) + "\n")
    with open(os.path.join(out_dir, "wav.scp"), "w") as f:
        f.write("\n".join(scps[0]) + "\n")
    with open(os.path.join(out_dir, "clean.scp"), "w") as f:
        f.write("\n".join(clean_scp) + "\n")
    for kind in ("wet", "noise"):
        with open(os.path.join(out_dir, f"{kind}.scp"), "w") as f:
            for line in clean_scp:
                utt, path = line.split(None, 1)
                f.write(f"{utt} {path.replace('_clean.wav', f'_{kind}.wav')}\n")
    return meta
