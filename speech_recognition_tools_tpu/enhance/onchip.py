"""Single-program on-chip enhancement: masks -> GEV/MVDR -> iSTFT on TPU.

The host implementations in enhance/beamforming.py and enhance/wpe.py are
the golden numeric references (themselves golden-tested against
nn-gev/fgnt/beamforming.py); this module re-expresses the same pipelines
as jittable JAX so the whole 8-channel front-end — STFT, mask estimation,
PSD accumulation, GEV (or MVDR) weights, phase alignment, BAN, synthesis —
compiles into ONE XLA program with no complex array ever leaving the
device. The eigensolves that previously forced a host round-trip (complex
`eigh` does not lower to TPU) run through `ops.clinalg`'s real symmetric
embedding, which does.

Numerics: every function accepts complex64 (TPU) or complex128 (CPU x64
tests) and keeps the input precision end-to-end. Eigenvector phase is
arbitrary per bin exactly as in the host pipeline; `gev_beamform_onchip`
resolves it the same way (inter-bin phase alignment), so host and on-chip
outputs agree up to one global phase (tests align it explicitly).

Parity targets: enhance/beamforming.py (nn-gev fgnt/beamforming.py:7-187),
enhance/wpe.py (nara-wpe's iterative MIMO-WPE as wrapped by
/root/reference/e2e/reverb/local/run_wpe.py:29-49), and
enhance/masks.py::quantile_mask (fgnt/mask_estimation.py:115-131).
"""

import numpy as np

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from speech_recognition_tools_tpu.enhance.stft import istft, stft
from speech_recognition_tools_tpu.ops import clinalg


def _hermitize(m):
    return 0.5 * (m + jnp.conj(jnp.swapaxes(m, -1, -2)))


def _load_diag(phi, diag_load):
    """Relative diagonal loading with an absolute floor (matches the host
    gev_vector: covers complex64 PSD accumulation noise and exactly-zero
    silence bins)."""
    d = phi.shape[-1]
    load = max(diag_load, 64.0 * np.finfo(phi.dtype).eps)
    tr = jnp.abs(jnp.trace(phi, axis1=-2, axis2=-1).real)[..., None, None]
    return phi + (load * tr / d + 1e-15) * jnp.eye(d, dtype=phi.dtype)


def quantile_mask_onchip(observations, quantile_fraction=0.98,
                         quantile_weight=0.999):
    """Lorenz-curve quantile mask (enhance/masks.py::quantile_mask) in JAX."""
    power = jnp.abs(observations) ** 2
    flat = jnp.sort(power.ravel())[::-1]
    lorenz = jnp.cumsum(flat) / jnp.sum(flat)
    k = jnp.searchsorted(lorenz, quantile_fraction, side="left")
    threshold = flat[jnp.maximum(k - 1, 0)]
    mask = (power > threshold).astype(power.dtype)
    return 0.5 + quantile_weight * (mask - 0.5)


def power_spectral_density_onchip(observation, mask=None):
    """Mask-weighted spatial PSD: (bins, sensors, frames) -> (bins, s, s)."""
    if mask is None:
        weighted = observation
        norm = jnp.asarray(float(observation.shape[-1]), observation.real.dtype)
    else:
        mask = mask.astype(observation.real.dtype)
        weighted = observation * mask[:, None, :]
        norm = jnp.maximum(mask.sum(axis=-1), 1e-6)[:, None, None]
    psd = weighted @ jnp.conj(jnp.swapaxes(observation, -1, -2))
    return psd / norm


def gev_vector_onchip(target_psd_matrix, noise_psd_matrix,
                      diag_load: float = 1e-10):
    """Max-SNR (GEV) weights, batched over bins, as one TPU program.

    Same whitened formulation as the host gev_vector — Phi_NN = L L^H,
    principal eigenvector v of L^-1 Phi_XX L^-H, w = L^-H v — but carried
    out in the real symmetric embedding E(H) = [[A,-B],[B,A]]
    (ops/clinalg.py): E is a *-homomorphism, so chol/solve/eigh of the
    embedded matrices compute exactly the complex quantities, and real
    symmetric eigh lowers to TPU. The top eigenvalue of the embedded
    whitened matrix is the (doubled) top GEV eigenvalue; any real vector
    in its 2-dim eigenspace maps back to a valid complex principal
    eigenvector (phase/mixing ambiguity only, as with any eigh).

    Normalization matches the host/scipy convention w^H Phi_NN w = 1
    (it falls out: u^T E(N) u = w^H N w and the whitened eigvec is unit).
    """
    phi_x = clinalg.embed_hermitian(_hermitize(target_psd_matrix))
    phi_n = _load_diag(_hermitize(noise_psd_matrix), diag_load)
    en = clinalg.embed_hermitian(phi_n)
    L = jnp.linalg.cholesky(en)
    a = jsl.solve_triangular(L, phi_x, lower=True)
    m = jsl.solve_triangular(L, jnp.swapaxes(a, -1, -2), lower=True)
    m = 0.5 * (m + jnp.swapaxes(m, -1, -2))
    _, v2 = jnp.linalg.eigh(m)
    u = jsl.solve_triangular(
        jnp.swapaxes(L, -1, -2), v2[..., -1:], lower=False
    )
    return clinalg._unembed_vec(u)[..., 0]


def mvdr_vector_onchip(atf_vector, noise_psd_matrix,
                       diag_load: float = 1e-10):
    """MVDR weights w = Phi_NN^-1 d / (d^H Phi_NN^-1 d) on TPU.

    The host version LU-solves; complex LU does not lower to TPU, so this
    uses the HPD Cholesky solve in the real embedding (Phi_NN is HPD once
    diagonally loaded — same loading policy as the GEV path)."""
    d = atf_vector
    phi = _load_diag(_hermitize(noise_psd_matrix), diag_load)
    phi = jnp.broadcast_to(phi, d.shape + d.shape[-1:])
    num = clinalg.solve_hpd_c(phi, d[..., None])[..., 0]
    den = jnp.einsum("...d,...d->...", jnp.conj(d), num)
    return num / den[..., None]


def phase_correction_onchip(vector):
    """Inter-bin phase alignment (host phase_correction), cumulative-sum
    form: w'(f) = w(f) * exp(-j * sum_{g<=f} angle(<w(g), w(g-1)>))."""
    corr = jnp.einsum("fd,fd->f", vector[1:], jnp.conj(vector[:-1]))
    phases = jnp.concatenate(
        [jnp.zeros((1,), corr.real.dtype), jnp.angle(corr)]
    )
    rot = jnp.exp(jax.lax.complex(jnp.zeros_like(phases), -jnp.cumsum(phases)))
    return vector * rot[:, None]


def blind_analytic_normalization_onchip(vector, noise_psd_matrix):
    """BAN post-gain g(f) = sqrt(|w^H Phi^2 w|)/|w^H Phi w| per bin."""
    phw = jnp.einsum("...ab,...b->...a", noise_psd_matrix, vector)
    nom = jnp.einsum(
        "...a,...ab,...b->...", jnp.conj(phw), noise_psd_matrix, vector
    )
    den = jnp.einsum("...a,...a->...", jnp.conj(vector), phw)
    return vector * (jnp.abs(jnp.sqrt(nom)) / jnp.abs(den))[..., None]


def apply_beamforming_vector_onchip(vector, mix):
    return jnp.einsum("...a,...at->...t", jnp.conj(vector), mix)


def gev_beamform_onchip(mix_stft, speech_mask, noise_mask, ban=True,
                        phase_correct=True):
    """Full GEV pipeline on device (host gev_beamform semantics).

    mix_stft: (bins, sensors, frames) complex; masks: (bins, frames).
    Returns (bins, frames) beamformed STFT (global phase arbitrary)."""
    phi_xx = power_spectral_density_onchip(mix_stft, speech_mask)
    phi_nn = power_spectral_density_onchip(mix_stft, noise_mask)
    w = gev_vector_onchip(phi_xx, phi_nn)
    if phase_correct:
        w = phase_correction_onchip(w)
    if ban:
        w = blind_analytic_normalization_onchip(w, phi_nn)
    return apply_beamforming_vector_onchip(w, mix_stft)


def mvdr_beamform_onchip(mix_stft, speech_mask, noise_mask):
    """MVDR pipeline with PCA steering from the speech PSD, on device."""
    phi_xx = power_spectral_density_onchip(mix_stft, speech_mask)
    phi_nn = power_spectral_density_onchip(mix_stft, noise_mask)
    atf = clinalg.principal_eigvec_c(_hermitize(phi_xx))
    w = mvdr_vector_onchip(atf, phi_nn)
    return apply_beamforming_vector_onchip(w, mix_stft)


def wpe_onchip(Y, taps: int = 10, delay: int = 3, iterations: int = 5,
               eps: float = 1e-10):
    """Iterative MIMO-WPE on device (host enhance/wpe.py::wpe semantics).

    Y: (F, D, T) complex STFT. The per-iteration correlation solve
    R G = P (R Hermitian PD after relative loading) runs through the real
    embedding Cholesky; the fixed iteration count unrolls under jit."""
    F, D, T = Y.shape
    K = taps * D
    blocks = []
    for k in range(taps):
        shift = delay + k
        if shift < T:
            blk = jnp.pad(Y[:, :, : T - shift], ((0, 0), (0, 0), (shift, 0)))
        else:
            blk = jnp.zeros_like(Y)
        blocks.append(blk)
    Yt = jnp.concatenate(blocks, axis=1)  # (F, K, T)
    X = Y
    for _ in range(iterations):
        power = jnp.maximum(jnp.mean(jnp.abs(X) ** 2, axis=1), eps)
        w = (1.0 / power).astype(Y.real.dtype)
        R = jnp.einsum("fkt,flt,ft->fkl", Yt, jnp.conj(Yt), w)
        P = jnp.einsum("fkt,fdt,ft->fkd", Yt, jnp.conj(Y), w)
        tr = jnp.trace(R, axis1=1, axis2=2).real[:, None, None]
        R = R + (eps * tr / K) * jnp.eye(K, dtype=R.dtype)
        G = clinalg.solve_hpd_c(R, P)
        X = Y - jnp.einsum("fkd,fkt->fdt", jnp.conj(G), Yt)
    return X


def gev_enhance_chain(signals, size: int = 1024, shift: int = 256,
                      ban=True, phase_correct=True, return_stft=False):
    """Multichannel waveform -> enhanced waveform, entirely on device.

    signals: (sensors, samples) real. STFT -> quantile speech/noise masks
    -> GEV (+phase alignment, +BAN) -> iSTFT. Returns (samples,) real —
    only real arrays cross the host boundary, which matters on backends
    that cannot transfer complex buffers (NOTES.md axon gotcha).

    return_stft=True skips the synthesis and returns the beamformed
    (bins, frames) STFT instead (e.g. to feed spectral features directly,
    or for exact parity testing against the host pipeline — the waveform
    carries a residual global-phase ambiguity that synthesis bakes in)."""
    n = signals.shape[-1]
    X = stft(signals, size=size, shift=shift)  # (ch, T, F)
    sp = quantile_mask_onchip(X)
    Xf = jnp.transpose(X, (2, 0, 1))  # (F, ch, T)
    # per-bin masks: median over channels of the per-channel mask
    spf = jnp.median(jnp.transpose(sp, (2, 0, 1)), axis=1)  # (F, T)
    nzf = 1.0 - spf
    Yf = gev_beamform_onchip(Xf, spf, nzf, ban=ban,
                             phase_correct=phase_correct)
    if return_stft:
        return Yf
    y = istft(jnp.transpose(Yf, (1, 0)), size=size, shift=shift)
    return y[..., :n]
