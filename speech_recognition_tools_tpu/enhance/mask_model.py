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


def train_mask_estimator(
    examples,
    bins: int,
    *,
    hidden: int = 256,
    epochs: int = 10,
    learning_rate: float = 3e-3,
    seed: int = 0,
    log_fn=None,
):
    """Train a BLSTMMaskEstimator on (clean_stft, noise_stft) pairs.

    The nn-gev training flow (nn-gev/train.py): ideal binary masks from
    the parallel clean/noise spectra are the BCE targets; the input is the
    mixture magnitude. `examples` is a list of ((T,F) complex clean,
    (T,F) complex noise) pairs — e.g. per-channel STFTs of a simulated
    corpus. Returns (model, params, losses).
    """
    import jax
    import numpy as np
    import optax

    model = BLSTMMaskEstimator(bins=bins, hidden=hidden)
    X0, N0 = examples[0]
    T = X0.shape[0]
    y0 = normalize_mask_input(np.abs(X0 + N0))[None]
    l0 = jnp.asarray([T])
    params = model.init({"params": jax.random.key(seed)}, y0, l0)
    tx = optax.adam(learning_rate)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, y, ibm_x, ibm_n, lengths):
        def loss_fn(p):
            sm, nm = model.apply(p, y, lengths)
            return mask_estimator_loss(sm, nm, ibm_x, ibm_n, lengths)

        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), opt, l

    losses = []
    for ep in range(epochs):
        ep_losses = []
        for X, N in examples:
            ibm_x = np.abs(X) ** 2 > np.abs(N) ** 2
            y = normalize_mask_input(np.abs(X + N))[None]
            lengths = jnp.asarray([X.shape[0]])
            params, opt, l = step(
                params, opt, y,
                jnp.asarray(ibm_x[None], jnp.float32),
                jnp.asarray((~ibm_x)[None], jnp.float32),
                lengths,
            )
            ep_losses.append(float(l))
        losses.append(float(np.mean(ep_losses)))
        if log_fn:
            log_fn(f"mask-net epoch {ep}: bce {losses[-1]:.4f}")
    return model, params, losses


def normalize_mask_input(mag):
    """Scale-invariant input for the mask nets: magnitudes divided by
    their utterance mean (sigmoid nets are not scale-equivariant, and
    corpus levels vary by tens of dB). Used by train_mask_estimator and
    estimate_masks so training and inference always agree."""
    import numpy as np

    mag = np.asarray(mag, np.float32)
    return jnp.asarray(mag / max(float(mag.mean()), 1e-12))


def estimate_masks(model, params, mag_per_channel):
    """Per-channel masks, median-combined across channels (the nn-gev
    beamform.py combination rule). mag_per_channel: (C, T, F) magnitudes.
    Returns (speech_mask, noise_mask) as (T, F) numpy arrays."""
    import jax.numpy as jnp
    import numpy as np

    C, T, _ = mag_per_channel.shape
    y = jnp.stack([normalize_mask_input(m) for m in mag_per_channel])
    sm, nm = model.apply(params, y, jnp.asarray([T] * C))
    return np.median(np.asarray(sm), axis=0), np.median(np.asarray(nm), axis=0)
