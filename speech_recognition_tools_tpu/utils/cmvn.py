"""Cepstral mean/variance normalisation.

The reference shells out to Kaldi compute-cmvn-stats / apply-cmvn
(SURVEY.md §2.5); here CMVN is a pair of jitted ops so the whole pipeline
stays on-device. Masked variants handle padded batches.
"""

import jax.numpy as jnp


def cmvn_stats(feats: jnp.ndarray):
    """Global mean/std over the frame axis. feats: (T, D) or (B, T, D)."""
    axes = tuple(range(feats.ndim - 1))
    mean = jnp.mean(feats, axis=axes)
    std = jnp.std(feats, axis=axes)
    return mean, std


def cmvn_stats_masked(feats: jnp.ndarray, num_frames: jnp.ndarray):
    """Global mean/std over valid frames of a padded batch.

    feats: (B, T, D); num_frames: (B,). Returns ((D,), (D,)).
    """
    B, T, D = feats.shape
    mask = (jnp.arange(T)[None, :] < num_frames[:, None]).astype(feats.dtype)
    count = jnp.sum(mask)
    m = mask[..., None]
    mean = jnp.sum(feats * m, axis=(0, 1)) / count
    var = jnp.sum((feats - mean) ** 2 * m, axis=(0, 1)) / count
    return mean, jnp.sqrt(var)


def apply_cmvn(feats, mean, std, norm_var: bool = True):
    out = feats - mean
    if norm_var:
        out = out / jnp.where(std == 0, 1.0, std)
    return out


def apply_cmvn_per_utterance(feats, num_frames, norm_var: bool = True):
    """Per-utterance CMVN over a padded batch (the reference's
    apply-cmvn per-utt mode, decode_dnn.sh:53-57).

    feats: (B, T, D); num_frames: (B,).
    """
    B, T, D = feats.shape
    m = (jnp.arange(T)[None, :] < num_frames[:, None]).astype(feats.dtype)
    m3 = m[..., None]
    count = jnp.maximum(jnp.sum(m, axis=1), 1.0)[:, None]
    mean = jnp.sum(feats * m3, axis=1) / count
    out = (feats - mean[:, None, :]) * m3
    if norm_var:
        var = jnp.sum((feats - mean[:, None, :]) ** 2 * m3, axis=1) / count
        std = jnp.sqrt(var)
        out = out / jnp.where(std == 0, 1.0, std)[:, None, :]
    return out
