"""Log/power mel spectrum (parity:
/root/reference/src/featgen/computeMelSpectrum.py compute_mel_spectrum):
|FFT(frames, nfft)|[:, :nfft/2+1] @ fbank.T then log10 or square.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from speech_recognition_tools_tpu.dsp.filterbanks import parse_fbank_type
from speech_recognition_tools_tpu.ops.framing import (
    bucketed_min_samples, frame_count, frame_params, frame_signal,
)
from speech_recognition_tools_tpu.ops.windows import WINDOWS


@dataclass(frozen=True)
class MelConfig:
    srate: int = 16000
    nfilters: int = 23
    fduration: float = 0.02
    frate: int = 100
    nfft: int = 1024
    spectrum_type: str = "log"  # 'log' | 'power'
    fbank_type: str = "mel,1"
    window: str = "hamming"


@partial(jax.jit, static_argnames=("cfg", "max_samples", "min_samples"))
def _mel_impl(signals, num_samples, cfg: MelConfig, max_samples: int,
              min_samples: int | None = None):
    fp = frame_params(cfg.srate, cfg.frate, cfg.fduration)
    dtype = signals.dtype
    fbank = parse_fbank_type(cfg.fbank_type, cfg.nfilters, cfg.nfft, cfg.srate)
    win = jnp.asarray(WINDOWS[cfg.window](fp.flength_samples), dtype)

    max_frames = int(frame_count(max_samples, fp))
    frames, num_frames = frame_signal(signals, num_samples, fp, win,
                                      max_frames, min_samples=min_samples)

    nbins = cfg.nfft // 2 + 1
    mag = jnp.abs(jnp.fft.rfft(frames, n=cfg.nfft, axis=-1))[..., :nbins]
    mel = jnp.einsum(
        "bfn,kn->bfk",
        mag,
        jnp.asarray(fbank, dtype),
        preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    if cfg.spectrum_type == "log":
        feats = jnp.log10(mel)
    elif cfg.spectrum_type == "power":
        feats = mel**2
    else:
        raise ValueError("spectrum_type must be 'log' or 'power'")
    return feats, num_frames


def mel_spectrum_batch(signals, num_samples, cfg: MelConfig = MelConfig(), *, dtype=jnp.float32):
    """Mel spectrum for a zero-padded batch.

    Returns (feats (B, Fmax, nfilters), num_frames (B,)).
    """
    signals = jnp.asarray(signals, dtype)
    num_samples = jnp.asarray(num_samples, jnp.int32)
    fp = frame_params(cfg.srate, cfg.frate, cfg.fduration)
    return _mel_impl(signals, num_samples, cfg, int(signals.shape[1]),
                     bucketed_min_samples(num_samples, fp))
