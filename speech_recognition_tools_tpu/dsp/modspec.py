"""FDLP modulation spectral features (M-vectors).

Parity target: /root/reference/src/featgen/computeModulationSpectrum.py
getFeats (:30-205): per 10 ms frame and mel/cochlear band, LPC->cepstral
modulation coefficients coeff_0..coeff_n, with optional complex modulation
(analytic ifft, complex LPC), 1/f noise compensation, absolute value,
even-coefficient subsetting and unity-gain; output frames x
(nfilters * feat_len). Default analysis window is hanning (square with
--no_window).

TPU-first structure: frames x bands LPC problems are flattened and chunked
under lax.map (frame rate is 100 Hz with 0.5 s windows, so the problem count
is ~50x the FDLP spectrogram's — chunking bounds FFT workspace).
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tools_tpu.dsp.filterbanks import parse_fbank_type
from speech_recognition_tools_tpu.ops.autocorr import circular_autocorr
from speech_recognition_tools_tpu.ops.cepstrum import lpc_to_cepstrum
from speech_recognition_tools_tpu.ops.framing import (
    bucketed_min_samples,
    frame_count,
    frame_params,
    frame_signal,
)
from speech_recognition_tools_tpu.ops.levinson import lpc_from_autocorr
from speech_recognition_tools_tpu.ops.windows import WINDOWS


@dataclass(frozen=True)
class ModSpecConfig:
    srate: int = 16000
    nfilters: int = 15
    coeff_0: int = 5
    coeff_n: int = 30
    order: int = 50
    fduration: float = 0.5
    frate: int = 100
    fbank_type: str = "mel,1"
    keep_even: bool = False
    complex_modulation: bool = False
    compensate_noise: bool = False
    absolute_value: bool = False
    set_unity_gain: bool = False
    no_window: bool = False
    problem_chunk: int = 4096  # LPC problems per lax.map block

    @property
    def coeff_num(self) -> int:
        return self.coeff_n - self.coeff_0 + 1

    @property
    def feat_len(self) -> int:
        if self.keep_even:
            temp = np.arange(0, self.coeff_num)
            if self.coeff_0 % 2 == 0:
                return temp[1::2].shape[0]
            return temp[0::2].shape[0]
        if self.complex_modulation:
            return self.coeff_num if self.absolute_value else 2 * self.coeff_num
        return self.coeff_num


@partial(jax.jit, static_argnames=("cfg", "max_samples", "min_samples"))
def _modspec_impl(signals, num_samples, cfg: ModSpecConfig, max_samples: int,
                  min_samples: int | None = None):
    dtype = signals.dtype
    window = "square" if cfg.no_window else "hanning"
    fp = frame_params(cfg.srate, cfg.frate, cfg.fduration)
    dur = (
        int(cfg.fduration * cfg.srate)
        if cfg.complex_modulation
        else int(2 * cfg.fduration * cfg.srate)
    )
    fbank = parse_fbank_type(cfg.fbank_type, cfg.nfilters, dur, cfg.srate)
    fbank = fbank[:, :-1]

    win = jnp.asarray(WINDOWS[window](fp.flength_samples), dtype)
    max_frames = int(frame_count(max_samples, fp))
    frames, num_frames = frame_signal(signals, num_samples, fp, win,
                                      max_frames, min_samples=min_samples)
    B = signals.shape[0]

    if cfg.complex_modulation:
        half = int(cfg.fduration * cfg.srate / 2)
        n = frames.shape[-1]
        if frames.dtype == jnp.float32 and n & (n - 1):
            # non-pow2 XLA FFT is ~1e4x slower on TPU; Bluestein runs it
            # as pow2 FFTs (c64 — the f64 parity path keeps jnp.fft,
            # which is exact on CPU)
            from speech_recognition_tools_tpu.ops.dct import bluestein_fft

            trans = bluestein_fft(frames, inverse=True)[..., :half]
        else:
            trans = jnp.fft.ifft(frames, axis=-1)[..., :half]
    else:
        from speech_recognition_tools_tpu.ops.dct import dct2

        trans = dct2(frames) * jnp.asarray(
            1.0 / np.sqrt(2 * int(cfg.srate * cfg.fduration)), dtype
        )
    ndct = trans.shape[-1]
    assert fbank.shape[1] == ndct, (fbank.shape, ndct)

    # flatten (B*F, ndct)
    P0 = B * max_frames
    trans = trans.reshape(P0, ndct)
    NB = cfg.nfilters
    P = P0 * NB
    fbank_d = jnp.asarray(fbank, trans.dtype if cfg.complex_modulation else dtype)

    coeff_num = cfg.coeff_num
    lim = cfg.coeff_n
    keepreal = not cfg.complex_modulation

    from speech_recognition_tools_tpu.ops.autocorr import (
        banded_autocorr,
        banded_supports_separable,
    )

    if banded_supports_separable(fbank, cfg.order + 2):
        # shared-lag path (real AND complex): the banded autocorrelation
        # computes the signal lag products once per frame and contracts
        # them against all bands on the MXU (ops/autocorr; the complex
        # case runs as two real einsums) — instead of a circular FFT per
        # (frame x band) problem — then the fused Pallas kernel (real
        # f32 on TPU) or XLA scans run the LPC+cepstrum recursions over
        # P0*NB lanes. Chunk the frame axis to bound the lag workspace.
        nlags = cfg.order + 2
        isz = 8 if jnp.iscomplexobj(trans) else 4
        frame_chunk = max(
            64, min(P0, (1 << 28) // (isz * 2 * ndct * 4))
        )  # ~0.25 GB lag workspace
        npad0 = (-P0) % frame_chunk
        tpad = jnp.concatenate(
            [trans, jnp.zeros((npad0, ndct), trans.dtype)], axis=0
        ).reshape(-1, frame_chunk, ndct)
        r = jax.lax.map(
            lambda t: banded_autocorr(t, jnp.real(fbank_d), nlags), tpad
        )  # (nc, fc, NB, nlags)
        r = r.reshape(-1, NB, nlags)[:P0].reshape(P0 * NB, nlags)
        if r.dtype == jnp.float32:
            # f32 diagonal loading — same near-periodic pole-explosion
            # guard as dsp/fdlp._band_cepstra (see comment there)
            r = r.at[..., 0].mul(1.0 + 1e-4)
        on_tpu = jax.default_backend() in ("tpu", "axon")
        if on_tpu and r.dtype == jnp.float32:
            from speech_recognition_tools_tpu.ops.pallas_lpc import (
                lpc_cepstra_pallas,
            )

            cep = lpc_cepstra_pallas(
                r, cfg.order, lim, unity_gain=cfg.set_unity_gain
            )
        else:
            # lane-chunked scans (the complex Levinson carries
            # (lanes, order) state; chunking bounds it)
            lane_chunk = min(cfg.problem_chunk * 16, r.shape[0])
            npadl = (-r.shape[0]) % lane_chunk
            rp = jnp.concatenate(
                [r, jnp.zeros((npadl, nlags), r.dtype)], axis=0
            ).reshape(-1, lane_chunk, nlags)

            def lpc_block(rb):
                xlpc, gg = lpc_from_autocorr(rb, cfg.order)
                if cfg.set_unity_gain:
                    gg = jnp.ones_like(gg)
                return lpc_to_cepstrum(xlpc, gg, lim)

            cep = jax.lax.map(lpc_block, rp).reshape(-1, lim)[: r.shape[0]]
        if keepreal:
            cep = jnp.real(cep)
        ceps = cep.reshape(B, max_frames, NB, lim)
    else:
        # complex-modulation (or wrap-support) path: per-problem
        # circular autocorrelation, chunked
        chunk = min(cfg.problem_chunk, P)
        npad = (-P) % chunk
        prob_idx = jnp.arange(P + npad)
        bf = jnp.minimum(prob_idx // NB, P0 - 1)
        band = prob_idx % NB
        bf_blocks = bf.reshape(-1, chunk)
        band_blocks = band.reshape(-1, chunk)

        def block(args):
            bfb, bandb = args
            z = jnp.take(trans, bfb, axis=0) * jnp.take(fbank_d, bandb, axis=0)
            r = circular_autocorr(z, cfg.order + 2, keepreal=keepreal)
            if r.dtype == jnp.float32:
                r = r.at[..., 0].mul(1.0 + 1e-4)
            xlpc, gg = lpc_from_autocorr(r, cfg.order)
            if cfg.set_unity_gain:
                gg = jnp.ones_like(gg)
            cep = lpc_to_cepstrum(xlpc, gg, lim)
            if keepreal:
                cep = jnp.real(cep)
            return cep  # (chunk, lim)

        ceps = jax.lax.map(block, (bf_blocks, band_blocks))
        ceps = ceps.reshape(-1, lim)[:P].reshape(B, max_frames, NB, lim)

    if cfg.compensate_noise:
        if cfg.complex_modulation:
            fmax = coeff_num / cfg.fduration
        else:
            fmax = coeff_num / (2 * cfg.fduration)
        faxis = jnp.asarray(np.linspace(0, fmax, cfg.coeff_n), ceps.real.dtype)
        ceps = ceps * faxis

    sel = ceps[..., cfg.coeff_0 - 1 : cfg.coeff_n]  # coeff_0..coeff_n (1-based)
    if cfg.complex_modulation:
        if cfg.absolute_value:
            feat = jnp.abs(sel)
        else:
            feat = jnp.concatenate([jnp.real(sel), jnp.imag(sel)], axis=-1)
    else:
        feat = jnp.abs(sel) if cfg.absolute_value else sel
    if cfg.keep_even:
        start = 1 if cfg.coeff_0 % 2 == 0 else 0
        feat = feat[..., start::2]

    feat = feat.reshape(B, max_frames, NB * cfg.feat_len).astype(dtype)
    return feat, num_frames


def modulation_spectrum_batch(
    signals, num_samples, cfg: ModSpecConfig = ModSpecConfig(), *, dtype=jnp.float32
):
    """M-vector features for a zero-padded batch.

    Returns (feats (B, Fmax, nfilters*feat_len), num_frames (B,)).
    """
    signals = jnp.asarray(signals, dtype)
    num_samples = jnp.asarray(num_samples, jnp.int32)
    fp = frame_params(cfg.srate, cfg.frate, cfg.fduration)
    return _modspec_impl(signals, num_samples, cfg, int(signals.shape[1]),
                         bucketed_min_samples(num_samples, fp))
