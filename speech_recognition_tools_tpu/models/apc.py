"""Autoregressive Predictive Coding (APC) pretraining.

The reference clones the external Autoregressive-Predictive-Coding repo and
drives it from recipes/wsj/run_apc.sh:70-80 (PYTHONPATH wiring in
recipes/timit/path.sh). Native equivalent: a unidirectional GRU stack
predicts the frame `time_shift` steps ahead with L1 loss; any hidden layer
serves as the pretrained representation.
"""

import jax.numpy as jnp
from flax import linen as nn

from speech_recognition_tools_tpu.models.recurrent import GRUStack


class APC(nn.Module):
    num_layers: int = 3
    hidden_size: int = 512

    @nn.compact
    def __call__(self, feats, lengths, deterministic: bool = True):
        h = GRUStack(self.num_layers, self.hidden_size, name="rnn")(
            feats, lengths
        )
        pred = nn.Dense(feats.shape[-1], name="postnet")(h)
        return pred, h


def apc_loss(pred, feats, lengths, time_shift: int = 3):
    """L1 between pred[:, :-k] and feats[:, k:] over valid frames."""
    k = time_shift
    p = pred[:, :-k]
    t = feats[:, k:]
    valid = (
        jnp.arange(p.shape[1])[None, :] < (lengths - k)[:, None]
    ).astype(p.dtype)[..., None]
    return jnp.sum(jnp.abs(p - t) * valid) / jnp.maximum(
        jnp.sum(valid) * p.shape[-1], 1.0
    )
