"""Fully-jitted joint CTC/attention beam search.

The host-loop beam search (models/transformer_asr.beam_search) dispatches
one decoder call per step; for serving, this version runs the entire search
as a single lax.scan over a static max_len budget — one XLA program per
(encoder-frames, max_len) shape bucket, finished beams masked in-graph.
Scores are identical to the host-loop version (same attention + exact CTC
prefix + length penalty combination); LM fusion hooks in as a jittable
scorer.
"""

from functools import partial

import jax
import jax.numpy as jnp

from speech_recognition_tools_tpu.decode.ctc_prefix import (
    ctc_prefix_scores,
    init_prefix_state,
)

NEG_INF = -1e30


@partial(
    jax.jit,
    static_argnames=("model", "beam_size", "max_len", "ctc_weight",
                     "penalty", "lm_apply", "lm_weight", "incremental"),
)
def beam_search_jit(
    model,
    params,
    feats,
    lengths,
    *,
    beam_size: int = 10,
    max_len: int = 100,
    ctc_weight: float = 0.3,
    penalty: float = 0.0,
    lm_apply=None,
    lm_weight: float = 1.0,
    incremental: bool = False,
):
    """Jitted beam search for one utterance (feats (1, T, D)).

    incremental=True runs the decoder with flax KV caches — O(L) work
    per step with per-step beam reordering of the cache — instead of the
    O(L^2) full-prefix decode_step; token-identical (tests assert it).
    Measured on v5e (adim 256, 6enc/3dec, beam 10): the full-prefix path
    is ~10-25% FASTER up to max_len 200 — the per-step cache gathers and
    (K, 1) matmuls cost more than the redundant-but-fat full-prefix
    attention, so full-prefix is the default; flip it for much longer
    outputs or larger decoders.

    Returns (tokens (K, max_len+1) int32 with sos at 0 and -1 padding,
    scores (K,)); take tokens[argmax(scores)] and strip sos/eos/-1.
    """
    cfg = model.cfg
    from speech_recognition_tools_tpu.models.transformer_asr import (
        TransformerASR,
    )

    memory, enc_len, ctc_logits = model.apply(
        params, feats, lengths, method=TransformerASR.encode
    )
    K, V = beam_size, cfg.vocab_size
    T2 = ctc_logits.shape[1]
    memory = jnp.repeat(memory, K, axis=0)
    enc_len_b = jnp.repeat(enc_len, K, axis=0)
    ctc_logp = jax.nn.log_softmax(ctc_logits[0], -1)

    tokens0 = jnp.full((K, max_len + 1), -1, jnp.int32).at[:, 0].set(cfg.sos_id)
    state = dict(
        tokens=tokens0,
        att_cum=jnp.full((K,), -jnp.inf).at[0].set(0.0),
        lm_cum=jnp.zeros((K,)),
        scores=jnp.full((K,), -jnp.inf).at[0].set(0.0),
        finished=jnp.zeros((K,), bool),
        last_tokens=jnp.full((K,), -1, jnp.int32),
        prefix_lens=jnp.zeros((K,), jnp.int32),
        r_state=init_prefix_state(ctc_logp, enc_len[0], K, cfg.blank_id),
    )
    if incremental:
        _, mut = model.apply(
            params, tokens0, memory, enc_len_b,
            method=TransformerASR.decode_init_cache, mutable=["cache"],
        )
        state["cache"] = mut["cache"]

    def step(state, step_idx):
        if incremental:
            last = jax.lax.dynamic_slice_in_dim(
                state["tokens"], step_idx, 1, axis=1
            )  # (K, 1)
            logits1, mut = model.apply(
                {**params, "cache": state["cache"]},
                last, step_idx, memory, enc_len_b,
                method=TransformerASR.decode_incremental,
                pe_len=max(max_len + 1, 16),
                mutable=["cache"],
            )
            cache = mut["cache"]
            att_logp = jax.nn.log_softmax(logits1[:, 0], axis=-1)
        else:
            dec_logits = model.apply(
                params, state["tokens"], memory, enc_len_b,
                method=TransformerASR.decode_step,
            )
            att_logp = jax.nn.log_softmax(
                jnp.take(dec_logits, step_idx, axis=1), axis=-1
            )  # (K, V)
        new_att = state["att_cum"][:, None] + att_logp
        new_lm = state["lm_cum"][:, None]
        if lm_apply is not None:
            new_lm = new_lm + lm_apply(state["tokens"], step_idx)

        psi, full, r_new = ctc_prefix_scores(
            ctc_logp, enc_len[0], None, state["prefix_lens"],
            state["last_tokens"], state["r_state"], cfg.blank_id,
        )
        last_f = jnp.clip(enc_len[0] - 1, 0, T2 - 1)
        cur_full = jnp.logaddexp(
            state["r_state"][:, last_f, 0], state["r_state"][:, last_f, 1]
        )
        ctc_part = psi.at[:, cfg.eos_id].set(cur_full)
        ctc_part = ctc_part.at[:, cfg.blank_id].set(NEG_INF)

        total = (
            (1.0 - ctc_weight) * new_att
            + ctc_weight * ctc_part
            + lm_weight * new_lm
            + penalty * (step_idx + 1).astype(new_att.dtype)
        )
        fin = state["finished"]
        total = jnp.where(
            fin[:, None],
            jnp.full_like(total, NEG_INF).at[:, cfg.eos_id].set(0.0)
            + jnp.where(fin, state["scores"], 0.0)[:, None],
            total,
        )
        top_scores, top_idx = jax.lax.top_k(total.reshape(-1), K)
        beam_idx = top_idx // V
        tok_idx = (top_idx % V).astype(jnp.int32)

        tokens = state["tokens"][beam_idx]
        tokens = jax.vmap(
            lambda row, t: row.at[step_idx + 1].set(t)
        )(tokens, tok_idx)
        was_fin = fin[beam_idx]
        ends = was_fin | (tok_idx == cfg.eos_id)
        r_picked = r_new[beam_idx, tok_idx]
        new_state = dict(
            tokens=tokens,
            att_cum=new_att.reshape(-1)[top_idx],
            lm_cum=new_lm.reshape(-1)[top_idx],
            scores=top_scores,
            finished=ends,
            last_tokens=jnp.where(
                ends, state["last_tokens"][beam_idx], tok_idx
            ),
            prefix_lens=jnp.where(
                ends,
                state["prefix_lens"][beam_idx],
                state["prefix_lens"][beam_idx] + 1,
            ),
            r_state=jnp.where(
                ends[:, None, None], state["r_state"][beam_idx], r_picked
            ),
        )
        if incremental:
            # reorder the KV caches by surviving-beam parent; scalar
            # cache_index leaves are shared across beams
            new_state["cache"] = jax.tree.map(
                lambda c: c[beam_idx] if c.ndim >= 1 and c.shape[0] == K
                else c,
                cache,
            )
        return new_state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(max_len))
    return state["tokens"], state["scores"]


def tokens_to_list(tokens, scores, eos_id):
    """Host-side: best hypothesis as a python token list."""
    import numpy as np

    best = int(np.argmax(np.asarray(scores)))
    seq = [int(t) for t in np.asarray(tokens)[best, 1:] if t >= 0]
    return [t for t in seq if t != eos_id]


@partial(
    jax.jit,
    static_argnames=("model", "beam_size", "max_len", "ctc_weight",
                     "penalty", "lm_apply", "lm_weight", "incremental"),
)
def beam_search_jit_batched(
    model,
    params,
    feats,
    lengths,
    *,
    beam_size: int = 10,
    max_len: int = 100,
    ctc_weight: float = 0.3,
    penalty: float = 0.0,
    lm_apply=None,
    lm_weight: float = 1.0,
    incremental: bool = False,
):
    """Batched jitted beam search: B independent searches in one program.

    feats (B, T, D), lengths (B,). vmaps the single-utterance search, so
    every step runs (B x K)-wide on device — the serving shape: one
    compiled program per (T, max_len) bucket handles the whole batch.

    Returns (tokens (B, K, max_len+1), scores (B, K)); feed each row to
    tokens_to_list.
    """

    def one(f, l):
        return beam_search_jit(
            model, params, f[None], l[None],
            beam_size=beam_size, max_len=max_len, ctc_weight=ctc_weight,
            penalty=penalty, lm_apply=lm_apply, lm_weight=lm_weight,
            incremental=incremental,
        )

    return jax.vmap(one)(feats, lengths)
