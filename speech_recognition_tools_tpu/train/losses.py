"""Masked sequence losses.

The reference flattens padded batches with pad2list before computing CE
(train_rnn_nnet_classifier.py:183-210); on TPU we keep static shapes and
mask instead — identical math, no ragged gathers.
"""

import jax.numpy as jnp
import optax


def _mask(lengths, max_len):
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def masked_cross_entropy(logits, labels, lengths):
    """Mean CE over valid frames. logits (B,T,C), labels (B,T) int."""
    m = _mask(lengths, logits.shape[1]).astype(logits.dtype)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_frame_error(logits, labels, lengths):
    """Frame error rate (%) over valid frames — the reference trainers'
    per-epoch FER metric (train_rnn_nnet_classifier.py:36-44)."""
    m = _mask(lengths, logits.shape[1])
    wrong = (jnp.argmax(logits, axis=-1) != labels) & m
    return 100.0 * jnp.sum(wrong) / jnp.maximum(jnp.sum(m), 1)


def masked_mse(pred, target, lengths):
    m = _mask(lengths, pred.shape[1]).astype(pred.dtype)[..., None]
    return jnp.sum((pred - target) ** 2 * m) / jnp.maximum(
        jnp.sum(m) * pred.shape[-1], 1.0
    )


def masked_l1(pred, target, lengths):
    m = _mask(lengths, pred.shape[1]).astype(pred.dtype)[..., None]
    return jnp.sum(jnp.abs(pred - target) * m) / jnp.maximum(
        jnp.sum(m) * pred.shape[-1], 1.0
    )
