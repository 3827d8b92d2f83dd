"""Optimizer factory mirroring the reference's zoo
(train_rnn_nnet_classifier.py:123-134: adam/adadelta/sgd/adagrad/rmsprop)
plus gradient clipping (:209)."""

import optax


def make_optimizer(
    name: str, learning_rate, clip_threshold: float | None = 1.0
):
    name = name.lower()
    if name == "adam":
        tx = optax.adam(learning_rate)
    elif name == "adadelta":
        tx = optax.adadelta(learning_rate)
    elif name == "sgd":
        tx = optax.sgd(learning_rate)
    elif name == "adagrad":
        tx = optax.adagrad(learning_rate)
    elif name == "rmsprop":
        tx = optax.rmsprop(learning_rate)
    else:
        raise ValueError(f"Unknown optimizer {name}")
    if clip_threshold:
        tx = optax.chain(optax.clip_by_global_norm(clip_threshold), tx)
    return tx
