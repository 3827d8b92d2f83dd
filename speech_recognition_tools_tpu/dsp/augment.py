"""Waveform augmentation: additive noise at target SNR, reverberation by RIR
convolution with cross-correlation alignment, AWGN, and the 'diff' FIR.

Parity targets: /root/reference/src/featgen/features.py:24-60,110-115
(add_noise_to_wav, add_agwn, addReverb) and the 'diff' FIR branch of the
featgen CLIs (computeFDLPSpectrogram.py:162-166).

TPU-first: noise mixing and the FIR run as jitted batched ops; the random
noise-segment offset comes from a JAX PRNG key instead of global numpy
state. RIR convolution uses FFT convolution (overlap is full-length).
"""

import jax
import jax.numpy as jnp
import numpy as np

# FIR used by the reference's `--add_noise diff` branch.
DIFF_FIR = np.array([1, 2, 3, 2, 0, -2, -5, -2, 0, 2, 3, 2, 1], dtype=np.float64)


def add_noise_snr(key, sig, noise, snr_db, num_samples=None):
    """Mix a random segment of `noise` into `sig` at `snr_db`.

    sig: (N,) or (B, N); noise: (M,) with M >= N. The reference draws the
    noise offset as floor(rand * (len(noise) - len(sig))).
    """
    if sig.ndim == 1:
        sig = sig[None]
        squeeze = True
    else:
        squeeze = False
    B, N = sig.shape
    n = N if num_samples is None else num_samples
    max_off = jnp.maximum(noise.shape[0] - (jnp.zeros((B,), jnp.int32) + n), 1)
    u = jax.random.uniform(key, (B,))
    off = jnp.floor(u * max_off).astype(jnp.int32)
    idx = off[:, None] + jnp.arange(N)[None, :]
    ns = jnp.take(noise, jnp.clip(idx, 0, noise.shape[0] - 1), axis=0)
    if num_samples is not None:
        mask = (jnp.arange(N)[None, :] < jnp.reshape(num_samples, (B, 1))).astype(
            sig.dtype
        )
    else:
        mask = jnp.ones_like(sig)
    denom = jnp.sum(mask, axis=1)
    e_s = jnp.sum((sig * mask) ** 2, axis=1) / denom
    e_n = jnp.sum((ns * mask) ** 2, axis=1) / denom
    alp = jnp.sqrt(e_s / (e_n * (10.0 ** (snr_db / 10.0))))
    out = sig + alp[:, None] * ns * mask
    return out[0] if squeeze else out


def add_awgn(sig, noise, snr_db):
    """Scaled additive noise of the same length (features.py:47-60)."""
    p_sig = jnp.mean(sig**2, axis=-1, keepdims=True)
    p_noise = jnp.mean(noise**2, axis=-1, keepdims=True)
    k = jnp.sqrt(p_sig / (p_noise * 10.0 ** (snr_db / 10.0)))
    return sig + k * noise


def apply_diff_fir(sig):
    """'diff' augmentation: convolve with the fixed FIR, mode='same'."""
    fir = jnp.asarray(DIFF_FIR, sig.dtype)
    x = sig[None] if sig.ndim == 1 else sig
    out = jax.vmap(lambda s: jnp.convolve(s, fir, mode="same"))(x)
    return out[0] if sig.ndim == 1 else out


def add_reverb(sig, rir, num_samples=None):
    """Convolve with a RIR and re-align by cross-correlation peak
    (features.py:110-115): out = conv(sig, rir); lag = argmax of
    correlate(sig, out, 'valid'); return out[lag : lag + len(sig)].

    sig: (N,) single utterance (host-callable, jit-compatible for fixed N).
    """
    n = sig.shape[-1]
    m = rir.shape[-1]
    full = jnp.convolve(sig, rir)  # length n + m - 1
    # np.correlate(sig, out, 'valid') with len(out) > len(sig) slides the
    # *shorter* over the longer: c[k] = sum_j sig[j] * out[j + k], k < m.
    # indM = len(c) - argmax(c).
    # numpy evaluates correlate(sig, out) with the shorter array first by
    # computing correlate(out, sig) reversed, so xxc[k] = c[m-1-k].
    c = jax.vmap(lambda k: jnp.sum(sig * jax.lax.dynamic_slice(full, (k,), (n,))))(
        jnp.arange(m)
    )
    xxc = c[::-1]
    ind_m = m - jnp.argmax(xxc)
    out = jax.lax.dynamic_slice(full, (ind_m,), (n,))
    return out
