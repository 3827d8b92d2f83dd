"""Batched greedy and Viterbi decoding as lax.scan programs.

The Viterbi decoder runs max-product over a dense (S, S) log-transition
matrix — suitable for phone-loop / HMM-topology decoding on-device; full
WFST lattice decoding remains an external integration point via the ark
bridge (SURVEY.md §2.5).
"""

import jax
import jax.numpy as jnp
import numpy as np


def greedy_decode(loglikes, lengths=None):
    """Frame-wise argmax. loglikes (B, T, S) -> (B, T) int32."""
    ids = jnp.argmax(loglikes, axis=-1).astype(jnp.int32)
    if lengths is not None:
        mask = jnp.arange(ids.shape[1])[None, :] < lengths[:, None]
        ids = jnp.where(mask, ids, -1)
    return ids


def collapse_repeats(ids):
    """Host-side: collapse consecutive repeats, drop -1 padding."""
    out = []
    prev = None
    for i in np.asarray(ids):
        if i < 0:
            break
        if i != prev:
            out.append(int(i))
        prev = i
    return out


def viterbi_decode(loglikes, log_trans, log_init=None, lengths=None):
    """Batched Viterbi over a dense transition matrix.

    Args:
      loglikes: (B, T, S) emission log-likelihoods.
      log_trans: (S, S) log transition matrix, log_trans[i, j] = log
        p(s_t = j | s_{t-1} = i).
      log_init: (S,) initial log-probs (default uniform).
      lengths: (B,) valid frame counts.

    Returns:
      path: (B, T) int32 best state sequence (frames past length = -1).
      score: (B,) best path log-probability.
    """
    B, T, S = loglikes.shape
    if log_init is None:
        log_init = jnp.zeros(S) - jnp.log(S)
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)

    def step(delta, obs):
        ll, t = obs
        cand = delta[:, :, None] + log_trans[None, :, :]  # (B, S_prev, S)
        back = jnp.argmax(cand, axis=1).astype(jnp.int32)  # (B, S)
        new = jnp.max(cand, axis=1) + ll
        # freeze past end-of-utterance so the final max is at t = len-1
        keep = (t < lengths)[:, None]
        new = jnp.where(keep, new, delta)
        back = jnp.where(keep, back, jnp.arange(S, dtype=jnp.int32)[None, :])
        return new, back

    delta0 = log_init[None, :] + loglikes[:, 0]
    ts = jnp.arange(1, T)
    delta, backs = jax.lax.scan(
        step, delta0, (jnp.swapaxes(loglikes[:, 1:], 0, 1), ts)
    )
    score = jnp.max(delta, axis=-1)
    last = jnp.argmax(delta, axis=-1).astype(jnp.int32)

    def backtrack(carry, back_t):
        # carry = state at time t+1; back_t maps it to the best state at t
        prev = jnp.take_along_axis(back_t, carry[:, None], axis=1)[:, 0]
        return prev, prev

    _, path_rev = jax.lax.scan(backtrack, last, backs, reverse=True)
    path = jnp.concatenate(
        [jnp.swapaxes(path_rev, 0, 1), last[:, None]], axis=1
    )
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    path = jnp.where(mask, path, -1)
    return path, score
