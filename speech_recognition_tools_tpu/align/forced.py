"""Native forced alignment for the hybrid branch (VERDICT r3 missing #3).

The reference gets frame labels from an EXTERNAL Kaldi GMM pipeline
(ali-to-pdf consumed by src/nnet/data_prep_for_seq.py:66-88; produced by
recipes/timit/run_get_hq_ali.sh) — the last external engine in the
flagship hybrid path. Here the alignment loop is self-contained:

  1. `utterance_states`: transcript + lexicon -> the linear HMM state
     chain (pdf = phone * states_per_phone + state, the decode/graph.py
     convention), with optional-silence blocks between words that
     Viterbi may skip (the L_disambig optional-silence topology).
  2. `equal_align`: the flat-start bootstrap (uniform frame split).
  3. `viterbi_align_batch`: exact forced alignment as one jitted
     lax.scan over frames — the (B, S) DP row is elementwise over the
     batch, transitions are two shifted maxes (stay / advance) plus a
     gather for silence skips, so the whole corpus aligns as a single
     TPU program; only the (T, S) backpointer bitplane returns to the
     host for the O(T) traceback.
  4. `realign_corpus`: the train-align loop — train the acoustic model
     on current labels, dump pseudo-loglikes, re-Viterbi — i.e. the
     steam of run_get_hq_ali.sh without Kaldi.

Alignment quality improves monotonically from equal-align (FER tests in
tests/test_forced_align.py).
"""

import numpy as np


class HmmTopology:
    """Per-phone HMM topology + pdf numbering shared by the aligner and
    the decoding graph (decode/graph.py).

    pdf = base[phone] + hmm_state. With uniform state counts this
    degenerates to the legacy convention pdf = phone * states_per_phone
    + state, so existing alignments/graphs are unchanged unless the new
    knobs are used:

      silence_states: the silence phone gets its own (longer) chain —
        the Kaldi-topology tier where silence is a 5-state HMM while
        speech phones are 3-state (run_get_hq_ali.sh's topology via
        prepare_lang; SURVEY §2.7).
      wpd_silence: word-position-dependent silence — utterance-boundary
        silence gets a DISTINCT pdf block (a virtual phone id
        `edge_silence_phone`) from inter-word silence, so the AM can
        model long endpoint silences separately from short pauses.
    """

    def __init__(self, num_phones, states_per_phone=1, silence_phone=None,
                 silence_states=None, wpd_silence=False):
        self.silence_phone = silence_phone
        self.wpd_silence = bool(wpd_silence) and silence_phone is not None
        P = num_phones + (1 if self.wpd_silence else 0)
        self.num_phones = P
        self.edge_silence_phone = (
            num_phones if self.wpd_silence else silence_phone
        )
        st = np.full(P, states_per_phone, np.int32)
        if silence_phone is not None and silence_states:
            st[silence_phone] = silence_states
            if self.wpd_silence:
                st[self.edge_silence_phone] = silence_states
        self._states = st
        self.base = np.concatenate(
            [[0], np.cumsum(st)]
        ).astype(np.int32)
        self.num_pdfs = int(self.base[-1])

    def states(self, p):
        return int(self._states[p])

    def pdf(self, p, k):
        return int(self.base[p]) + k


def read_lexicon(path: str) -> dict:
    """Parse 'word phone-id [phone-id ...]' lines -> {word: [ids]} (the
    one lexicon format every aligner entry point shares)."""
    lexicon = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts:
                lexicon[parts[0]] = [int(x) for x in parts[1:]]
    return lexicon


def utterance_states(words, lexicon, states_per_phone=1,
                     silence_phone=None, topo: "HmmTopology | None" = None):
    """Linear HMM state chain for a transcript.

    Returns (pdfs, skip_to, start_lo):
      pdfs[s]: emitting pdf id of state s (topo.pdf(phone, k); with the
        default uniform topology that is phone * states_per_phone + k)
      skip_to[s]: -1, or the state index an ADVANCE out of state s may
        additionally jump to (the first state after the next optional
        silence block) — silence blocks between/around words are
        optional, exactly like graph.py's splice_hmm_chain topology.
      start_lo: the alternative entry state (first state after a leading
        optional silence block; 0 when there is none) — the path may
        start at state 0 OR start_lo.

    topo: optional HmmTopology for per-phone state counts and
    word-position-dependent silence (utterance-boundary blocks emit
    topo.edge_silence_phone); when given it overrides
    states_per_phone/silence_phone.
    """
    if topo is not None:
        silence_phone = topo.silence_phone
    pdfs, optional = [], []

    def emit(phones, opt):
        for p in phones:
            n_st = (topo.states(p) if topo is not None
                    else states_per_phone)
            for k in range(n_st):
                pdfs.append(
                    topo.pdf(p, k) if topo is not None
                    else p * states_per_phone + k
                )
                optional.append(opt)

    edge_sil = (topo.edge_silence_phone if topo is not None
                else silence_phone)
    emit([edge_sil] if silence_phone is not None else [], True)
    for i, w in enumerate(words):
        if w not in lexicon:
            raise KeyError(f"word not in lexicon: {w!r}")
        emit(lexicon[w], False)
        if silence_phone is not None:
            # trailing block (after the last word) is utterance-boundary
            # silence; inner blocks are inter-word silence
            last = i == len(words) - 1
            emit([edge_sil if last else silence_phone], True)
    pdfs = np.asarray(pdfs, np.int32)
    skip_to = np.full(len(pdfs), -1, np.int32)
    # an advance leaving state s-1 may skip a following optional block
    # [s, s+L): record the jump target s+L on the state BEFORE the block
    i = 0
    while i < len(pdfs):
        if optional[i]:
            j = i
            while j < len(pdfs) and optional[j]:
                j += 1
            if i > 0 and j < len(pdfs):
                skip_to[i - 1] = j
            i = j
        else:
            i += 1
    # a trailing optional silence block is handled by allowing the final
    # state to be either the last real state or the end of the chain —
    # see viterbi_align_batch's two-final readout
    start_lo = 0
    if optional and optional[0]:
        while start_lo < len(optional) and optional[start_lo]:
            start_lo += 1
    return pdfs, skip_to, np.int32(start_lo)


def trailing_optional(pdfs, skip_to, silence_phone, states_per_phone,
                      topo: "HmmTopology | None" = None):
    """Index of the last NON-optional state +1, for the two-final
    readout (an utterance may end before its trailing silence)."""
    if topo is not None:
        silence_phone = topo.silence_phone
    if silence_phone is None:
        return len(pdfs)
    if topo is not None:
        p = topo.edge_silence_phone
        sil_set = {topo.pdf(p, k) for k in range(topo.states(p))}
    else:
        S = states_per_phone
        sil_set = {silence_phone * S + k for k in range(S)}
    s = len(pdfs)
    while s > 0 and int(pdfs[s - 1]) in sil_set:
        s -= 1
    return s


def min_align_frames(pdfs, skip_to, start_lo, fin_lo):
    """Minimum frame count with a valid alignment path: the fewest
    states on any entry->final walk (each visited state emits >= 1
    frame). Moves are advance (s -> s+1) and skip (src -> skip_to[src]).
    Utterances shorter than this are infeasible — viterbi_align_batch
    returns (None, -inf) for them and realign_corpus drops them."""
    S = len(pdfs)
    m = np.full(S + 1, np.iinfo(np.int32).max, np.int64)
    for ent in {0, int(start_lo)}:
        if ent < S:
            m[ent] = 1
    for s in range(S):
        if m[s] == np.iinfo(np.int32).max:
            continue
        if s + 1 <= S:
            m[s + 1] = min(m[s + 1], m[s] + 1)
        dst = int(skip_to[s])
        if dst >= 0:
            m[dst] = min(m[dst], m[s] + 1)
    finals = m[max(fin_lo - 1, 0): S]
    return int(finals.min()) if len(finals) else 1


def equal_align(num_frames, pdfs):
    """Flat-start: distribute frames uniformly over the state chain."""
    S = len(pdfs)
    idx = np.minimum((np.arange(num_frames) * S) // max(num_frames, 1),
                     S - 1)
    return np.asarray(pdfs)[idx].astype(np.int32)


def _viterbi_jit(loglikes, length, pdfs, smask, skip_to, start_lo,
                 self_lp, adv_lp):
    """One utterance's DP under jit (vmapped by the batch wrapper).

    loglikes (Tmax, P) f32; length scalar i32; pdfs (Smax,) i32 (padded
    arbitrary); smask (Smax,) bool valid states; skip_to (Smax,) i32
    (-1 = none). Frames past `length` are frozen (alpha carried, bp =
    stay), so the returned alpha is exactly the t = length-1 row.
    Returns (alpha (Smax,), bp (Tmax, Smax) i8): bp in {0 stay,
    1 advance, 2 skip-advance}."""
    import jax
    import jax.numpy as jnp

    NEG = jnp.float32(-1e30)
    e = jnp.where(smask[None, :], loglikes[:, pdfs], NEG)  # (Tmax, Smax)
    Smax = pdfs.shape[0]
    # skip sources: state s receives a skip from src iff skip_to[src]==s
    skip_src = jnp.full((Smax,), -1, jnp.int32)
    src_idx = jnp.arange(Smax, dtype=jnp.int32)
    valid_skip = skip_to >= 0
    skip_src = skip_src.at[jnp.where(valid_skip, skip_to, 0)].set(
        jnp.where(valid_skip, src_idx, -1), mode="drop"
    )
    has_skip = skip_src >= 0

    sidx = jnp.arange(Smax)
    alpha0 = jnp.where((sidx == 0) | (sidx == start_lo), e[0], NEG)
    active = (jnp.arange(e.shape[0]) < length)[1:]

    def step(alpha, inp):
        et, act = inp
        stay = alpha + self_lp
        adv = jnp.concatenate([NEG[None], alpha[:-1] + adv_lp])
        skip = jnp.where(
            has_skip, alpha[jnp.maximum(skip_src, 0)] + adv_lp, NEG
        )
        best = jnp.maximum(stay, jnp.maximum(adv, skip))
        bp = jnp.where(
            skip >= best, jnp.int8(2),
            jnp.where(adv >= best, jnp.int8(1), jnp.int8(0)),
        )
        return (
            jnp.where(act, best + et, alpha),
            jnp.where(act, bp, jnp.int8(0)),
        )

    alphaT, bps = jax.lax.scan(step, alpha0, (e[1:], active))
    bps = jnp.concatenate([jnp.zeros((1, Smax), jnp.int8), bps])
    return alphaT, bps


def viterbi_align_batch(loglikes, lengths, chains, self_loop_prob=0.5):
    """Exact forced alignment of a padded batch.

    Args:
      loglikes: (B, Tmax, P) float log-likelihood (or scaled posterior)
        matrices.
      lengths: (B,) true frame counts.
      chains: list of (pdfs, skip_to, start_lo, final_lo) per
        utterance — `utterance_states` outputs plus `trailing_optional`;
        final_lo is the earliest permitted final state +1 (ending inside
        a trailing optional silence is also allowed).
    Returns [(labels (T_b,), score)] per utterance; an utterance with
    no valid path (fewer frames than the shortest chain walk) yields
    (None, -inf).
    """
    import jax
    import jax.numpy as jnp

    B, Tmax, _ = loglikes.shape
    Smax = max(len(c[0]) for c in chains)
    pdfs = np.zeros((B, Smax), np.int32)
    smask = np.zeros((B, Smax), bool)
    skip_to = np.full((B, Smax), -1, np.int32)
    start_lo = np.zeros((B,), np.int32)
    for b, (p, sk, st, _fin) in enumerate(chains):
        pdfs[b, : len(p)] = p
        smask[b, : len(p)] = True
        skip_to[b, : len(sk)] = sk
        start_lo[b] = st
    self_lp = jnp.float32(np.log(self_loop_prob))
    adv_lp = jnp.float32(np.log1p(-self_loop_prob))

    run = jax.jit(jax.vmap(
        lambda ll, ln, pd, sm, sk, st: _viterbi_jit(
            ll, ln, pd, sm, sk, st, self_lp, adv_lp
        )
    ))
    alphaT, bps = run(
        jnp.asarray(loglikes, jnp.float32),
        jnp.asarray(lengths, jnp.int32), jnp.asarray(pdfs),
        jnp.asarray(smask), jnp.asarray(skip_to),
        jnp.asarray(start_lo),
    )
    # only the backpointer bitplane + final DP row cross to the host;
    # the traceback is O(T) per utterance
    alphaT = np.asarray(alphaT)
    bps = np.asarray(bps)
    out = []
    for b, (p, sk, st_lo, fin_lo) in enumerate(chains):
        T = int(lengths[b])
        S = len(p)
        # final: last real state, or anywhere in a trailing optional block
        fin_states = np.arange(max(fin_lo - 1, 0), S)
        s = int(fin_states[int(np.argmax(alphaT[b, fin_states]))])
        score = float(alphaT[b, s])
        # infeasible utterance (fewer frames than the shortest chain
        # path, or emission floor saturated the DP): no valid traceback
        # exists — report it instead of crashing on a bad backpointer
        if T < min_align_frames(p, sk, st_lo, fin_lo) or score <= -1e29:
            out.append((None, -np.inf))
            continue
        labels = np.zeros(T, np.int32)
        for t in range(T - 1, -1, -1):
            labels[t] = p[s]
            mv = bps[b, t, s]
            if t > 0:
                if mv == 1:
                    s -= 1
                elif mv == 2:
                    s = int(np.where(sk[:S] == s)[0][0])
        assert s in (0, int(st_lo)), (s, st_lo)
        out.append((labels, score))
    return out


def realign_corpus(feats, texts, lexicon, *, states_per_phone=1,
                   silence_phone=None, silence_states=None,
                   wpd_silence=False, self_loop_prob=0.5,
                   num_iters=2, am_epochs=5, hidden_dim=96, num_layers=1,
                   batch_size=8, seed=0, converge_tol=0.002,
                   history=None, iter_callback=None, log=print):
    """Flat-start + iterative Viterbi realignment -> frame labels.

    feats: {utt: (T, D)}; texts: {utt: 'word word ...'}. Trains the
    standard GRU AM (models/recurrent.RNNClassifier via train/trainer)
    on the current labels each iteration, converts its posteriors to
    pseudo-loglikes (log p(s|x) - log prior), and re-aligns. Returns
    ({utt: (T,) pdf labels}, num_pdfs).

    Topology tier (VERDICT r4 #6): silence_states gives the silence
    phone its own chain length (Kaldi's 5-state silence / 3-state
    phones), wpd_silence separates utterance-boundary from inter-word
    silence pdfs — both via HmmTopology, shared with the decode graph.

    Iteration schedule: each realignment logs the fraction of frames
    whose label changed; the loop stops early once that falls below
    converge_tol (FER-convergence). Pass history=[] to receive the
    per-iteration dicts {iter, am_loss, frames_changed_pct}.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from speech_recognition_tools_tpu import models as M
    from speech_recognition_tools_tpu.train import masked_cross_entropy

    num_phones = 1 + max(
        max(ph for phs in lexicon.values() for ph in phs),
        silence_phone if silence_phone is not None else 0,
    )
    topo = HmmTopology(
        num_phones, states_per_phone, silence_phone,
        silence_states=silence_states, wpd_silence=wpd_silence,
    )
    utts = [u for u in feats if u in texts]
    chains = {}
    for u in list(utts):
        p, sk, st = utterance_states(
            texts[u].split(), lexicon, topo=topo
        )
        fin_lo = trailing_optional(p, sk, silence_phone, states_per_phone,
                                   topo=topo)
        if feats[u].shape[0] < min_align_frames(p, sk, st, fin_lo):
            log(f"WARNING: {u}: {feats[u].shape[0]} frames < shortest "
                f"chain path — infeasible transcript, dropping")
            utts.remove(u)
            continue
        chains[u] = (p, sk, st, fin_lo)
    if not utts:
        raise ValueError("no alignable utterances (all infeasible)")
    num_pdfs = topo.num_pdfs
    labels = {u: equal_align(feats[u].shape[0], chains[u][0]) for u in utts}

    # The corpus stays RAGGED on the host (the per-utt feats dict) and is
    # densified one batch at a time: one (N, Tmax, D)+(N, Tmax, P) dense
    # materialisation would OOM host and HBM on real corpora (WSJ ~37k
    # utts). Batches are length-sorted buckets padded to a quantized
    # Tmax so the jitted step compiles a handful of shapes, not O(N).
    n = len(utts)
    lens = np.asarray([feats[u].shape[0] for u in utts], np.int32)
    D = next(iter(feats.values())).shape[1]
    by_len = sorted(range(n), key=lambda i: int(lens[i]))
    buckets = [by_len[k : k + batch_size] for k in range(0, n, batch_size)]

    def quantized_t(idx):
        t = max(int(lens[i]) for i in idx)
        return min(
            -(-t // 128) * 128, max(int(lens[i]) for i in range(n))
        )

    def dense_batch(idx, with_labels):
        tb = quantized_t(idx)
        rows = batch_size  # fixed rows: pad with empty (len 0) utts
        f = np.zeros((rows, tb, D), np.float32)
        y = np.zeros((rows, tb), np.int32) if with_labels else None
        ls = np.zeros(rows, np.int32)
        for r, i in enumerate(idx):
            T = int(lens[i])
            f[r, :T] = feats[utts[i]]
            ls[r] = T
            if with_labels:
                y[r, :T] = labels[utts[i]]
        out = (jnp.asarray(f), jnp.asarray(ls))
        return out + ((jnp.asarray(y),) if with_labels else ())

    model = M.RNNClassifier(
        num_layers=num_layers, hidden_size=hidden_dim, out_size=num_pdfs
    )

    for it in range(num_iters):
        f0, l0 = dense_batch(buckets[0], with_labels=False)
        params = model.init(
            {"params": jax.random.key(seed + it)}, f0[:1], l0[:1]
        )
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, f, l, y):
            def loss_fn(pr):
                return masked_cross_entropy(model.apply(pr, f, l), y, l)

            loss, g = jax.value_and_grad(loss_fn)(params)
            u2, opt = tx.update(g, opt)
            return optax.apply_updates(params, u2), opt, loss

        rs = np.random.RandomState(seed + it)
        border = np.arange(len(buckets))
        last = None
        for ep in range(am_epochs):
            rs.shuffle(border)  # shuffle bucket order; buckets stay
            # length-homogeneous so padding waste stays low
            for bi in border:
                f, l, y = dense_batch(buckets[bi], with_labels=True)
                params, opt, last = step(params, opt, f, l, y)
        log(f"align iter {it}: AM loss {float(last):.4f}")

        counts = np.bincount(
            np.concatenate([labels[u] for u in utts]), minlength=num_pdfs
        ).astype(np.float64)
        prior = np.log((counts + 1.0) / (counts.sum() + num_pdfs))
        apply_jit = jax.jit(model.apply)
        changed = total_frames = 0
        for idx in buckets:
            f, l = dense_batch(idx, with_labels=False)
            logits = np.asarray(apply_jit(params, f, l))[: len(idx)]
            logp = logits - _logsumexp(logits)
            pseudo_ll = logp - prior[None, None, :].astype(np.float32)
            aligned = viterbi_align_batch(
                pseudo_ll, lens[idx], [chains[utts[i]] for i in idx],
                self_loop_prob=self_loop_prob,
            )
            # a saturated DP (None labels) keeps the previous iteration's
            # alignment rather than killing the whole corpus
            for i, a in zip(idx, aligned):
                if a[0] is None:
                    log(f"WARNING: {utts[i]}: Viterbi found no valid path "
                        f"this iteration — keeping previous labels")
                else:
                    changed += int(np.sum(labels[utts[i]] != a[0]))
                    total_frames += len(a[0])
                    labels[utts[i]] = a[0]
        pct = changed / max(total_frames, 1)
        log(f"align iter {it}: labels changed {100.0 * pct:.2f}% "
            f"of {total_frames} frames")
        if history is not None:
            history.append({
                "iter": it, "am_loss": float(last),
                "frames_changed_pct": round(100.0 * pct, 3),
            })
        if iter_callback is not None:
            # e.g. score FER-vs-truth per iteration without retaining
            # every intermediate label set in memory
            iter_callback(it, labels)
        # FER-convergence: once realignment stops moving labels, more
        # train-align rounds only burn compute
        if pct < converge_tol:
            log(f"align converged at iter {it} "
                f"(changed {100.0 * pct:.2f}% < {100.0 * converge_tol}%)")
            break
    return labels, num_pdfs


def _logsumexp(x):
    m = np.max(x, axis=-1, keepdims=True)
    return m + np.log(np.sum(np.exp(x - m), axis=-1, keepdims=True))
