"""Feature transforms: deltas, PCA estimation/application.

Native equivalents of the Kaldi binaries the reference pipes through
(SURVEY.md §2.5): add-deltas (standard Kaldi delta computation with
window 2), est-pca / transform-feats (PCA transform estimation and
application for the tandem pipeline, get_Tandem_feats.sh:43-56).
"""

import jax.numpy as jnp
import numpy as np


def add_deltas(feats, order: int = 2, window: int = 2):
    """Append delta (and delta-delta...) features.

    Kaldi convention: delta_t = sum_k k*(x[t+k]-x[t-k]) / (2*sum_k k^2),
    with edge frames clamped. feats: (..., T, D) -> (..., T, D*(order+1)).
    """
    T = feats.shape[-2]
    denom = 2 * sum(k * k for k in range(1, window + 1))
    outs = [feats]
    cur = feats
    for _ in range(order):
        delta = jnp.zeros_like(cur)
        for k in range(1, window + 1):
            idx_p = jnp.clip(jnp.arange(T) + k, 0, T - 1)
            idx_m = jnp.clip(jnp.arange(T) - k, 0, T - 1)
            delta = delta + k * (
                jnp.take(cur, idx_p, axis=-2) - jnp.take(cur, idx_m, axis=-2)
            )
        cur = delta / denom
        outs.append(cur)
    return jnp.concatenate(outs, axis=-1)


def estimate_pca(feats, dim: int | None = None, normalize_variance=False):
    """Estimate a PCA transform from (N, D) frames (est-pca equivalent).

    Returns (transform (dim, D), mean (D,)); apply as (x - mean) @ T.T.
    """
    x = np.asarray(feats, np.float64)
    mean = x.mean(axis=0)
    xc = x - mean
    cov = xc.T @ xc / x.shape[0]
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    d = dim or x.shape[1]
    T = evecs[:, :d].T
    if normalize_variance:
        T = T / np.sqrt(np.maximum(evals[:d], 1e-12))[:, None]
    return T, mean


def apply_pca(feats, transform, mean):
    return (feats - mean) @ np.asarray(transform).T
