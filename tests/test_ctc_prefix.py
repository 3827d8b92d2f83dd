"""CTC prefix scoring vs brute-force alignment enumeration."""

import itertools

import numpy as np

import jax.numpy as jnp

from speech_recognition_tools_tpu.decode.ctc_prefix import (
    ctc_prefix_scores,
    init_prefix_state,
)

RS = np.random.RandomState(4)
BLANK = 0


def _collapse(path):
    out = []
    prev = -1
    for p in path:
        if p != prev and p != BLANK:
            out.append(p)
        prev = p
    return tuple(out)


def _brute_force(logp, T, V):
    """p(full T-frame collapse == seq) and p(collapse begins with seq)."""
    p = np.exp(logp)
    full = {}
    prefix = {}
    for path in itertools.product(range(V), repeat=T):
        prob = np.prod([p[t, path[t]] for t in range(T)])
        seq = _collapse(path)
        full[seq] = full.get(seq, 0.0) + prob
        for i in range(len(seq) + 1):
            prefix[seq[:i]] = prefix.get(seq[:i], 0.0) + prob
    return full, prefix


def test_matches_bruteforce():
    T, V = 5, 3
    logits = RS.randn(T, V)
    logp = logits - np.log(np.exp(logits).sum(1, keepdims=True))
    full_bf, prefix_bf = _brute_force(logp, T, V)

    lp = jnp.asarray(logp)
    enc_len = jnp.asarray(T)

    # empty prefix -> score all first tokens
    r0 = init_prefix_state(lp, enc_len, 1, BLANK)
    psi, full, r_new = ctc_prefix_scores(
        lp, enc_len, None, jnp.asarray([0]), jnp.asarray([-1]), r0, BLANK
    )
    for c in (1, 2):
        np.testing.assert_allclose(
            float(full[0, c]), np.log(full_bf.get((c,), 1e-300)), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(psi[0, c]), np.log(prefix_bf.get((c,), 1e-300)), rtol=1e-5
        )

    # extend prefix (1,) -> scores of (1, c)
    r1 = r_new[0, 1][None]  # carry token-1's forward vars
    psi2, full2, _ = ctc_prefix_scores(
        lp, enc_len, None, jnp.asarray([1]), jnp.asarray([1]), r1, BLANK
    )
    for c in (1, 2):
        np.testing.assert_allclose(
            float(full2[0, c]), np.log(full_bf.get((1, c), 1e-300)), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(psi2[0, c]), np.log(prefix_bf.get((1, c), 1e-300)), rtol=1e-5
        )


def test_short_enc_len_masking():
    T, V = 6, 3
    logits = RS.randn(T, V)
    logp = logits - np.log(np.exp(logits).sum(1, keepdims=True))
    # scoring with enc_len=4 must equal scoring the truncated matrix
    lp = jnp.asarray(logp)
    r0 = init_prefix_state(lp, jnp.asarray(4), 1, BLANK)
    psi_a, full_a, _ = ctc_prefix_scores(
        lp, jnp.asarray(4), None, jnp.asarray([0]), jnp.asarray([-1]), r0, BLANK
    )
    lp4 = jnp.asarray(logp[:4])
    r04 = init_prefix_state(lp4, jnp.asarray(4), 1, BLANK)
    psi_b, full_b, _ = ctc_prefix_scores(
        lp4, jnp.asarray(4), None, jnp.asarray([0]), jnp.asarray([-1]), r04, BLANK
    )
    np.testing.assert_allclose(np.asarray(full_a), np.asarray(full_b), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(psi_a), np.asarray(psi_b), rtol=1e-5)
