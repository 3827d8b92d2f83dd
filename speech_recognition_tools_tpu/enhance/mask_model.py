"""Neural T-F mask estimators.

Parity target: nn-gev/nn_models.py (:25-66): BLSTMMaskEstimator
(513 -> BLSTM 256 -> two clipped-ReLU 513 layers -> sigmoid speech/noise
masks) and SimpleFWMaskEstimator, trained with binary cross-entropy against
ideal binary masks (:20-23).
"""

import jax.numpy as jnp
from flax import linen as nn

from speech_recognition_tools_tpu.models.cnn import MaskedLSTMLayer


class _BiLSTM(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, lengths):
        fwd = MaskedLSTMLayer(self.features, name="fwd")(x, lengths)
        # reverse within valid region: flip, run, flip back
        T = x.shape[1]
        idx = lengths[:, None] - 1 - jnp.arange(T)[None, :]
        idx = jnp.clip(idx, 0, T - 1)
        rev = jnp.take_along_axis(x, idx[..., None], axis=1)
        bwd = MaskedLSTMLayer(self.features, name="bwd")(rev, lengths)
        bwd = jnp.take_along_axis(bwd, idx[..., None], axis=1)
        return fwd + bwd


class BLSTMMaskEstimator(nn.Module):
    """(B, T, bins) magnitude spectra -> (speech_mask, noise_mask)."""

    bins: int = 513
    hidden: int = 256

    @nn.compact
    def __call__(self, y, lengths):
        x = _BiLSTM(self.hidden, name="blstm")(y, lengths)
        x = jnp.clip(nn.Dense(self.bins, name="relu_1")(x), 0.0, 1.0)
        x = jnp.clip(nn.Dense(self.bins, name="relu_2")(x), 0.0, 1.0)
        speech = nn.sigmoid(nn.Dense(self.bins, name="speech_mask")(x))
        noise = nn.sigmoid(nn.Dense(self.bins, name="noise_mask")(x))
        return speech, noise


class SimpleFWMaskEstimator(nn.Module):
    bins: int = 513
    hidden: int = 1024

    @nn.compact
    def __call__(self, y, lengths=None):
        x = jnp.clip(nn.Dense(self.hidden, name="relu_1")(y), 0.0, 1.0)
        speech = nn.sigmoid(nn.Dense(self.bins, name="speech_mask")(x))
        noise = nn.sigmoid(nn.Dense(self.bins, name="noise_mask")(x))
        return speech, noise


def mask_estimator_loss(speech_mask, noise_mask, ibm_x, ibm_n, lengths=None):
    """Mean of the two binary cross-entropies (reference :20-23)."""
    eps = 1e-7

    def bce(pred, target):
        pred = jnp.clip(pred, eps, 1 - eps)
        e = -(target * jnp.log(pred) + (1 - target) * jnp.log(1 - pred))
        if lengths is None:
            return jnp.mean(e)
        mask = (
            jnp.arange(e.shape[1])[None, :] < lengths[:, None]
        ).astype(e.dtype)[..., None]
        return jnp.sum(e * mask) / jnp.maximum(jnp.sum(mask) * e.shape[-1], 1)

    return 0.5 * (bce(speech_mask, ibm_x) + bce(noise_mask, ibm_n))
