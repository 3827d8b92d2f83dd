"""CTC prefix scoring for joint CTC/attention beam search.

Standard hybrid-decoding prefix score (Watanabe et al. 2017, as used by
ESPnet's asr_recog that the reference invokes): for a hypothesis prefix g,
the CTC score of extending with token c is

    log p_ctc(g·c, ...) aggregated over all alignments,

maintained with per-frame blank / non-blank forward variables. Batched over
(beams x vocab) so one call scores every candidate extension of every beam
in one (T, K, V) scan — TPU-shaped, no per-hypothesis Python loops.
"""

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.where(m <= NEG_INF, 0.0, m)
    return jnp.where(
        m <= NEG_INF, NEG_INF,
        m + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe)),
    )


def ctc_prefix_scores(logp, enc_len, prefixes, prefix_lens, last_tokens,
                      r_prev, blank_id=0):
    """Score all single-token extensions of K prefixes.

    Args:
      logp: (T, V) CTC log-posteriors of one utterance.
      enc_len: scalar valid frame count.
      prefixes: unused except through r_prev/last_tokens (kept for clarity).
      prefix_lens: (K,) prefix lengths (0 for the initial empty prefix).
      last_tokens: (K,) last token of each prefix (-1 if empty).
      r_prev: (K, T, 2) forward variables of each prefix: [..., 0] =
        log p(prefix, ..., ending in non-blank at t), [..., 1] = ending in
        blank. For the empty prefix: nb = -inf, b = cumsum(log p(blank)).
      blank_id: CTC blank index.

    Returns:
      scores: (K, V) log p_ctc of each extension.
      r_new: (K, V, T, 2) forward variables of each extension (gather the
        chosen token's slice to carry into the next step).
    """
    T, V = logp.shape
    K = prefix_lens.shape[0]
    tmask = (jnp.arange(T) < enc_len)[:, None, None]  # (T,1,1)

    # phi[t, k] = log p(prefix unchanged up to t): blank end or repeated last
    r_nb_prev = r_prev[:, :, 0]  # (K, T)
    r_b_prev = r_prev[:, :, 1]
    # for extension token c == last_tokens[k], only the blank-ending path
    # may extend; otherwise both.
    phi_all = _logaddexp(r_nb_prev, r_b_prev)  # (K, T)
    same = jnp.arange(V)[None, :] == last_tokens[:, None]  # (K, V)

    def step(carry, xs):
        r_nb, r_b = carry  # (K, V) each: forward vars of extended prefix
        lp_t, phi_t, phi_b_t, valid = xs  # (V,), (K,), (K,), scalar bool
        phi = jnp.where(same, phi_b_t[:, None], phi_t[:, None])  # (K, V)
        new_nb = _logaddexp(r_nb, phi) + lp_t[None, :]
        new_b = _logaddexp(r_nb, r_b) + lp_t[blank_id]
        new_nb = jnp.where(valid, new_nb, r_nb)
        new_b = jnp.where(valid, new_b, r_b)
        return (new_nb, new_b), (new_nb, new_b)

    init_nb = jnp.full((K, V), NEG_INF)
    init_b = jnp.full((K, V), NEG_INF)
    # t=0 initial: extension token starts at frame 0 only if prefix empty
    # handled by phi at t-1; emulate by prepending a virtual frame where
    # phi_{-1} = 0 for the empty prefix, -inf otherwise.
    empty = prefix_lens == 0
    phi_prev = jnp.concatenate(
        [jnp.where(empty, 0.0, NEG_INF)[None, :], phi_all[:, :-1].T], axis=0
    )  # (T, K): phi at t-1
    phi_b_prev = jnp.concatenate(
        [jnp.where(empty, 0.0, NEG_INF)[None, :], r_b_prev[:, :-1].T], axis=0
    )
    valid = (jnp.arange(T) < enc_len)

    (_, _), (nb_seq, b_seq) = jax.lax.scan(
        step, (init_nb, init_b),
        (logp, phi_prev, phi_b_prev, valid),
    )
    # nb_seq/b_seq: (T, K, V)
    # full-sequence score: all T valid frames collapse to exactly g.c
    last = jnp.clip(enc_len - 1, 0, T - 1)
    final_nb = nb_seq[last]
    final_b = b_seq[last]
    full_scores = _logaddexp(final_nb, final_b)
    # prefix score psi (ESPnet/Watanabe): output *begins* with g.c —
    # logsumexp over t of phi_{t-1} + log p_t(c)
    phi_pick = jnp.where(
        same[None], phi_b_prev[:, :, None], phi_prev[:, :, None]
    )  # (T, K, V)
    contrib = phi_pick + logp[:, None, :]
    contrib = jnp.where(valid[:, None, None], contrib, NEG_INF)
    psi = jax.nn.logsumexp(contrib, axis=0)  # (K, V)
    r_new = jnp.stack(
        [jnp.moveaxis(nb_seq, 0, 2), jnp.moveaxis(b_seq, 0, 2)], axis=-1
    )  # (K, V, T, 2)
    return psi, full_scores, r_new


def init_prefix_state(logp, enc_len, beam_size, blank_id=0):
    """Forward variables of the empty prefix replicated over beams."""
    T = logp.shape[0]
    valid = (jnp.arange(T) < enc_len).astype(logp.dtype)
    b = jnp.cumsum(logp[:, blank_id] * valid)
    b = jnp.where(jnp.arange(T) < enc_len, b, b[jnp.clip(enc_len - 1, 0, T - 1)])
    nb = jnp.full((T,), NEG_INF)
    r = jnp.stack([nb, b], axis=-1)  # (T, 2)
    return jnp.broadcast_to(r[None], (beam_size, T, 2))
