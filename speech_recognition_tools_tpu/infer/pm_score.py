"""Per-utterance performance-monitoring confidence scores.

Parity targets: pm_score_contrastive_ae_multilayer.py (:150-260 — frozen
RNN-AE reconstruction of mean-normalised AM outputs; contrastive score =
mean over frames of positive loss / time-shifted negative loss),
pm_score_feedforward_AEAR.py / pm_score_feedforward_generative.py
(plain reconstruction losses).
"""

import jax.numpy as jnp


def _framewise(kind, pred, target):
    if kind == "l1":
        return jnp.mean(jnp.abs(pred - target), axis=-1)
    return jnp.mean((pred - target) ** 2, axis=-1)


def pm_score_reconstruction(pm_apply, pm_params, seq, lengths, loss="mse"):
    """Mean reconstruction loss per utterance. seq: (B, T, D)."""
    out = pm_apply(pm_params, seq, lengths)
    recon = out[0] if isinstance(out, tuple) else out
    fw = _framewise(loss, recon, seq)  # (B, T)
    mask = (jnp.arange(seq.shape[1])[None, :] < lengths[:, None]).astype(fw.dtype)
    return jnp.sum(fw * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1.0)


def pm_score_contrastive(
    pm_apply, pm_params, seq, lengths, time_shifts=(3, 5, 7),
    loss="l1", neg_weight=1.0,
):
    """Contrastive PM score: mean(pos / neg) over the trimmed interior,
    with negatives at +-each time shift (reference :227-257)."""
    out = pm_apply(pm_params, seq, lengths)
    recon = out[0] if isinstance(out, tuple) else out
    max_ts = max(time_shifts)
    sl_lo, sl_hi = max_ts, seq.shape[1] - max_ts - 1
    pos = _framewise(loss, recon[:, sl_lo:sl_hi], seq[:, sl_lo:sl_hi])
    neg = jnp.zeros_like(pos)
    for t in time_shifts:
        neg += _framewise(loss, recon[:, sl_lo:sl_hi], seq[:, sl_lo + t : sl_hi + t])
        neg += _framewise(loss, recon[:, sl_lo:sl_hi], seq[:, sl_lo - t : sl_hi - t])
    neg = neg * neg_weight / (2 * len(time_shifts))
    ratio = pos / jnp.maximum(neg, 1e-12)
    valid = (
        jnp.arange(sl_lo, sl_hi)[None, :] < (lengths[:, None] - max_ts - 1)
    ).astype(ratio.dtype)
    return jnp.sum(ratio * valid, axis=1) / jnp.maximum(jnp.sum(valid, axis=1), 1.0)
