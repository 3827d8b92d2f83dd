"""MFCC features (parity:
/root/reference/src/featgen/computeMfccFeatures.py extractMelEnergyFeats).

Reference quirks preserved: the signal is scaled by 2^-15 (unlike the FDLP
and mel paths), the FFT is computed with n = nfft/2 + 1 points (not nfft),
the DCT is unnormalised type-II, and the first 13 coefficients are kept.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from jax.scipy.fft import dct as jdct

from speech_recognition_tools_tpu.dsp.filterbanks import mel_filterbank
from speech_recognition_tools_tpu.ops.framing import (
    bucketed_min_samples, frame_count, frame_params, frame_signal,
)
from speech_recognition_tools_tpu.ops.windows import WINDOWS
from speech_recognition_tools_tpu.utils.splice import splice_feats


@dataclass(frozen=True)
class MfccConfig:
    srate: int = 16000
    nfilters: int = 30
    fduration: float = 0.02
    frate: int = 100
    nfft: int = 1024
    context: int | None = None
    window: str = "hamming"
    num_ceps: int = 13


@partial(jax.jit, static_argnames=("cfg", "max_samples", "min_samples"))
def _mfcc_impl(signals, num_samples, cfg: MfccConfig, max_samples: int,
               min_samples: int | None = None):
    fp = frame_params(cfg.srate, cfg.frate, cfg.fduration)
    dtype = signals.dtype
    fbank = mel_filterbank(cfg.nfilters, cfg.nfft, cfg.srate)
    win = jnp.asarray(WINDOWS[cfg.window](fp.flength_samples), dtype)

    signals = signals / (2.0**15)
    max_frames = int(frame_count(max_samples, fp))
    frames, num_frames = frame_signal(signals, num_samples, fp, win,
                                      max_frames, min_samples=min_samples)

    npts = int(cfg.nfft / 2 + 1)
    mag = jnp.abs(jnp.fft.fft(frames, n=npts, axis=-1))
    mel = jnp.log10(
        jnp.einsum(
            "bfn,kn->bfk",
            mag,
            jnp.asarray(fbank, dtype),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    mfcc = jdct(mel, type=2, axis=-1)[..., : cfg.num_ceps]
    if cfg.context:
        mfcc = jax.vmap(lambda f: splice_feats(f, cfg.context))(mfcc)
    return mfcc, num_frames


def mfcc_batch(signals, num_samples, cfg: MfccConfig = MfccConfig(), *, dtype=jnp.float32):
    signals = jnp.asarray(signals, dtype)
    num_samples = jnp.asarray(num_samples, jnp.int32)
    fp = frame_params(cfg.srate, cfg.frate, cfg.fduration)
    return _mfcc_impl(signals, num_samples, cfg, int(signals.shape[1]),
                      bucketed_min_samples(num_samples, fp))
