"""Mask-driven beamforming: PSD matrices, PCA steering, MVDR, GEV, BAN.

Parity target: nn-gev/fgnt/beamforming.py (:7-187). The per-bin
eigendecompositions operate on tiny (sensors x sensors) Hermitian matrices —
host-side numpy/scipy (complex eigensolvers don't lower to TPU); the STFT
and mask work feeding them is JAX (enhance.stft, models).
"""

import numpy as np
from numpy.linalg import solve
from scipy.linalg import eig, eigh


def power_spectral_density_matrix(observation, mask=None):
    """Weighted PSD matrix (reference :7-29).

    observation: (bins, sensors, frames) complex; mask: (bins, frames).
    Returns (bins, sensors, sensors).
    """
    bins_, sensors, frames = observation.shape
    if mask is None:
        mask = np.ones((bins_, frames))
    if mask.ndim == 2:
        mask = mask[:, np.newaxis, :]
    normalization = np.maximum(np.sum(mask, axis=-1, keepdims=True), 1e-6)
    psd = np.einsum("...dt,...et->...de", mask * observation, observation.conj())
    return psd / normalization


def pca_vector(target_psd_matrix):
    """Principal eigenvector per bin (reference :32-56)."""
    shape = target_psd_matrix.shape
    mat = target_psd_matrix.reshape((-1,) + shape[-2:])
    eigenvals, eigenvecs = np.linalg.eigh(mat)
    # eigh sorts ascending: last eigenvector is the principal one
    vec = eigenvecs[..., -1]
    return vec.reshape(shape[:-1])


def mvdr_vector(atf_vector, noise_psd_matrix):
    """MVDR weights w = Phi_NN^-1 d / (d^H Phi_NN^-1 d) (reference :59-81)."""
    while atf_vector.ndim > noise_psd_matrix.ndim - 1:
        noise_psd_matrix = np.expand_dims(noise_psd_matrix, axis=0)
    noise_psd_matrix = 0.5 * (
        noise_psd_matrix + np.conj(noise_psd_matrix.swapaxes(-1, -2))
    )
    # numpy >= 2.0 treats a 2-D rhs as a matrix; make the vector explicit
    numerator = solve(noise_psd_matrix, atf_vector[..., None])[..., 0]
    denominator = np.einsum("...d,...d->...", atf_vector.conj(), numerator)
    return numerator / np.expand_dims(denominator, axis=-1)


def gev_vector(target_psd_matrix, noise_psd_matrix):
    """Generalized eigenvector beamformer (reference :84-104)."""
    bins_, sensors, _ = target_psd_matrix.shape
    w = np.empty((bins_, sensors), dtype=np.complex128)
    for f in range(bins_):
        try:
            eigenvals, eigenvecs = eigh(
                target_psd_matrix[f], noise_psd_matrix[f]
            )
        except np.linalg.LinAlgError:
            eigenvals, eigenvecs = eig(
                target_psd_matrix[f], noise_psd_matrix[f]
            )
        w[f] = eigenvecs[:, np.argmax(eigenvals)]
    return w


def blind_analytic_normalization(vector, noise_psd_matrix):
    """BAN post-filter reducing GEV distortions (reference :107-124):
    |sqrt(w^H Phi Phi w)| / |w^H Phi w| per bin."""
    nom = np.einsum(
        "...a,...ab,...bc,...c->...",
        vector.conj(), noise_psd_matrix, noise_psd_matrix, vector,
    )
    denom = np.einsum(
        "...a,...ab,...b->...", vector.conj(), noise_psd_matrix, vector
    )
    normalization = np.abs(np.sqrt(nom)) / np.abs(denom)
    return vector * normalization[..., np.newaxis]


def apply_beamforming_vector(vector, mix):
    """(bins, sensors) weights applied to (bins, sensors, frames)."""
    return np.einsum("...a,...at->...t", vector.conj(), mix)


def gev_beamform(mix_stft, speech_mask, noise_mask, ban=True):
    """Full GEV pipeline: PSDs from masks -> GEV weights (+BAN) -> output.

    mix_stft: (bins, sensors, frames); masks: (bins, frames).
    Returns (bins, frames) beamformed STFT.
    """
    phi_xx = power_spectral_density_matrix(mix_stft, speech_mask)
    phi_nn = power_spectral_density_matrix(mix_stft, noise_mask)
    w = gev_vector(phi_xx, phi_nn)
    if ban:
        w = blind_analytic_normalization(w, phi_nn)
    return apply_beamforming_vector(w, mix_stft)


def mvdr_beamform(mix_stft, speech_mask, noise_mask):
    """MVDR pipeline with PCA steering vector from the speech PSD."""
    phi_xx = power_spectral_density_matrix(mix_stft, speech_mask)
    phi_nn = power_spectral_density_matrix(mix_stft, noise_mask)
    atf = pca_vector(phi_xx)
    w = mvdr_vector(atf, phi_nn)
    return apply_beamforming_vector(w, mix_stft)
