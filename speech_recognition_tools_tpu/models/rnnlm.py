"""Recurrent language model for shallow fusion.

Parity target: the reference trains word/char RNNLMs via ESPnet lm_train.py
(run_fdlp_e1.sh:405-417; conf/lm.yaml: 1 layer, 1000 units) and fuses them
in decoding with lm-weight 1.0 (conf/decode.yaml). This is the native
equivalent: embedding -> GRU stack -> vocab logits, with a scoring helper
for beam-search fusion.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from speech_recognition_tools_tpu.models.recurrent import GRUStack


class RNNLM(nn.Module):
    """cell='gru' (native default) or 'lstm' — the latter matches
    ESPnet's default LM cell, so imported ESPnet LMs
    (io/torch_import.py::convert_espnet_lm) rebuild exactly."""

    vocab_size: int
    embed_dim: int = 256
    hidden: int = 1000
    layers: int = 1
    cell: str = "gru"

    @nn.compact
    def __call__(self, tokens, lengths=None):
        """tokens (B, U) -> next-token logits (B, U, V)."""
        if lengths is None:
            lengths = jnp.full((tokens.shape[0],), tokens.shape[1], jnp.int32)
        h = nn.Embed(self.vocab_size, self.embed_dim, name="embed")(
            jnp.maximum(tokens, 0)
        )
        if self.cell == "lstm":
            from speech_recognition_tools_tpu.models.cnn import (
                MaskedLSTMLayer,
            )

            for i in range(self.layers):
                h = MaskedLSTMLayer(self.hidden, name=f"rnn_{i}")(h, lengths)
        else:
            h = GRUStack(self.layers, self.hidden, name="rnn")(h, lengths)
        return nn.Dense(self.vocab_size, name="output")(h)


def lm_loss(model, params, tokens, lengths):
    """Next-token CE over valid positions (targets = tokens shifted)."""
    logits = model.apply(params, tokens[:, :-1], lengths - 1)
    tgt = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, jnp.maximum(tgt, 0)[..., None], -1)[..., 0]
    valid = (
        jnp.arange(tgt.shape[1])[None, :] < (lengths - 1)[:, None]
    ).astype(nll.dtype)
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def make_fusion_scorer(model, params):
    """Returns lm_apply(prefix_tokens (K, U)) -> (K, V) next-token logprobs
    for beam_search shallow fusion."""

    def score(prefix):
        logits = model.apply(params, prefix)
        return jax.nn.log_softmax(logits[:, -1], axis=-1)

    return score


def make_jit_fusion_scorer(model, params):
    """Jittable shallow-fusion scorer for beam_search_jit's in-scan hook:
    lm_apply(tokens (K, max_len+1) with -1 padding, step_idx) -> (K, V).

    The GRU runs over the fixed-width token buffer masked to the current
    prefix length, so the call is shape-static inside lax.scan. Scoring a
    prefix is O(L) per step (O(L^2) per search) — the simple, correct
    formulation; carry-state fusion is the optimisation if LM scoring
    ever dominates (the decoder itself is already O(L^2))."""

    def lm_apply(tokens, step_idx):
        lengths = jnp.full((tokens.shape[0],), step_idx + 1, jnp.int32)
        logits = model.apply(params, tokens, lengths)
        return jax.nn.log_softmax(jnp.take(logits, step_idx, axis=1), -1)

    return lm_apply
