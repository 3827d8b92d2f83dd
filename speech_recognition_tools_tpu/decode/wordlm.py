"""Look-ahead word-LM fusion for character-level beam search.

Parity target: the reference's e2e recipes fuse a WORD RNNLM into the
char-level ESPnet decoder (`use_wordlm=true`, lm_vocabsize 65000,
/root/reference/e2e/wsj/run_fdlp_e1.sh:36-39,516-519 passes
`--word-rnnlm` to asr_recog.py). A word LM cannot be applied token-by-
token to char hypotheses; ESPnet bridges the two vocabularies with a
lexical prefix tree whose subtree probabilities provide per-character
look-ahead scores. This module is the native equivalent, redesigned
rather than transplanted:

- every tree node stores the EXACT sorted array of word ids under it,
  so a subtree mass is one vectorised gather+sum over the word-LM
  distribution (no reliance on lexically-contiguous id ranges);
- the word-LM next-word distribution p(.|h) is computed on device by
  the native RNNLM (models/rnnlm.py — imported ESPnet word LMs rebuild
  exactly via io/torch_import.py::convert_espnet_lm) and memoised per
  word history, so the per-step host work is a short tree walk;
- scores factorise exactly: spelling an in-lexicon word w char-by-char
  and closing it with <space> accumulates log p(w | h, in-lexicon)
  (the per-node ratios telescope), and the in-tree next-token scores
  at any node sum to probability 1 (tests/test_wordlm.py pins both).

Scoring contract (per char step, given word history h and the partial
word's tree node n; Z(n) = mass of node n under p(.|h)):

  child char c        log Z(n_c) - log Z(n)
  <space>, n terminal log p(w_n) - log Z(n)        (closes word w_n)
  <space>, else       log(p(unk) * oov_penalty)    (closes an OOV word)
  off-tree char       log(p(unk) * oov_penalty)    (enters OOV mode)
  char in OOV mode    log(oov_penalty)
  <space> in OOV mode 0.0                          (unk already charged)
  <sos/eos>           the matching <space> score + log p(<eos> | h, w)

so an OOV word costs log p(unk) + n_chars * log(oov_penalty), and the
end-of-sentence column already includes the word-level <eos>
probability (the beam search has no separate final() hook — the eos
column IS the final score).
"""

from collections import OrderedDict

import numpy as np

import jax
import jax.numpy as jnp

NEG = -1.0e30  # "never pick" score that stays nan-free in arithmetic


def word_vocab_from_dict(path: str, n_vocab: int | None = None) -> dict:
    """Parse an ESPnet-style word dict ('word id' per line, e.g.
    data/local/wordlm_train/wordlist_65000.txt) into {word: id}.
    '<eos>' is appended at max_id+1 when the file omits it (ESPnet's
    load_labeldict convention); '<unk>' must be present. With n_vocab
    (the LM embedding rows) the ids are validated against it."""
    vocab = {}
    with open(path) as f:
        for lineno, line in enumerate(f, 1):
            parts = line.split()
            if not parts:
                continue
            if len(parts) != 2:
                raise ValueError(
                    f"word dict {path}:{lineno}: expected 'word id', got "
                    f"{line.rstrip()!r} (a silently skipped line would "
                    "turn every affected word into an OOV)"
                )
            vocab[parts[0]] = int(parts[1])
    if "<unk>" not in vocab:
        raise ValueError(f"word dict {path} has no <unk> entry")
    if "<eos>" not in vocab:
        vocab["<eos>"] = max(vocab.values()) + 1
    if n_vocab is not None and max(vocab.values()) >= n_vocab:
        raise ValueError(
            f"word dict {path} ids reach {max(vocab.values())} but the "
            f"word LM has only {n_vocab} embedding rows"
        )
    return vocab


class _Node:
    __slots__ = ("children", "wid", "ids", "_idbuf")

    def __init__(self):
        self.children = {}
        self.wid = -1  # word id if a lexicon word ends exactly here
        self.ids = None  # np.ndarray of word ids under this node
        self._idbuf = []


def make_lexical_tree(word_vocab: dict, char_vocab: dict) -> _Node:
    """Prefix tree over the words' char-id spellings. Words containing
    characters outside the ASR char vocabulary and special '<...>'
    entries are skipped (they are unreachable from char hypotheses)."""
    root = _Node()
    for word, wid in word_vocab.items():
        if word.startswith("<") and word.endswith(">"):
            continue
        try:
            cids = [char_vocab[c] for c in word]
        except KeyError:
            continue
        if not cids:
            continue
        node = root
        node._idbuf.append(wid)
        for c in cids:
            node = node.children.setdefault(c, _Node())
            node._idbuf.append(wid)
        node.wid = wid
    stack = [root]
    while stack:
        n = stack.pop()
        n.ids = np.asarray(sorted(n._idbuf), dtype=np.int64)
        n._idbuf = None
        stack.extend(n.children.values())
    return root


class LookaheadWordLM:
    """lm_apply-compatible scorer: __call__(prefix_tokens (K, U)) ->
    (K, char_vocab_size) next-char log scores (models/transformer_asr.py
    beam_search's `lm_apply` hook — host beam search only)."""

    def __init__(self, model, params, word_vocab: dict, char_vocab: dict,
                 oov_penalty: float = 1e-4, cache_size: int = 2048):
        self.model, self.params = model, params
        self.word_vocab = word_vocab
        self.unk_w = word_vocab.get("<unk>")
        # tolerate the char-vocab eos spelling ("<sos/eos>") so an
        # imported LM dir's vocab.json works when it is a real word map
        self.eos_w = word_vocab.get("<eos>", word_vocab.get("<sos/eos>"))
        if self.unk_w is None or self.eos_w is None:
            raise ValueError(
                "word vocab lacks <unk> and/or <eos> — an imported LM "
                "dir's vocab.json may be char-convention; pass the LM's "
                "training wordlist via --word_lm_dict instead"
            )
        # a char-convention map (e.g. an imported ESPnet CHAR LM's
        # vocab.json) also carries <unk>/<sos/eos>, so it passes the
        # guard above — but fusing a 'lexicon' of single characters is
        # silent garbage. <blank>/<space> never appear in a real word
        # list; their presence identifies the char convention.
        if "<blank>" in word_vocab or "<space>" in word_vocab:
            raise ValueError(
                "word vocab contains <blank>/<space> — this is a CHAR-"
                "convention map, not a word lexicon; pass the word LM's "
                "training wordlist via --word_lm_dict instead"
            )
        self.space_c = char_vocab.get("<space>")
        self.eos_c = char_vocab["<sos/eos>"]
        self.blank_c = char_vocab.get("<blank>", 0)
        self.n_char = len(char_vocab)
        self.oov_penalty = float(oov_penalty)
        self.root = make_lexical_tree(word_vocab, char_vocab)
        if self.root.ids.size == 0:
            raise ValueError("no lexicon word is spellable in the char "
                             "vocabulary — check the word dict")
        # word-history tuple -> np.ndarray (Vw,) f32 probs, LRU-bounded:
        # a full-test-set decode visits unboundedly many histories and a
        # 65k-word row is ~260 KB, so an uncapped memo would grow to GBs
        self._dist = OrderedDict()
        self._cache_size = int(cache_size)
        self._score = jax.jit(self._score_dev)

    def _score_dev(self, tokens, last):
        # tokens are right-padded to a pow2 bucket so decode compiles
        # O(log max_history) programs instead of one per history length;
        # the RNN is causal, so positions <= `last` ignore the padding
        logits = self.model.apply(self.params, tokens)
        return jax.nn.log_softmax(logits[0, last], axis=-1)

    def _probs(self, hist: tuple) -> np.ndarray:
        out = self._dist.get(hist)
        if out is None:
            length = len(hist) + 1
            cap = 1 << (length - 1).bit_length()  # next pow2 >= length
            toks = np.zeros((1, cap), np.int32)
            toks[0, 0] = self.eos_w
            toks[0, 1:length] = hist
            out = np.exp(
                np.asarray(
                    self._score(jnp.asarray(toks), length - 1)
                )
            ).astype(np.float32)
            self._dist[hist] = out
            if len(self._dist) > self._cache_size:
                self._dist.popitem(last=False)
        else:
            self._dist.move_to_end(hist)
        return out

    def _parse(self, chars):
        """Char prefix -> (word-history tuple, node-or-None, in_tree).
        node None means the partial word has left the tree (OOV mode);
        a fresh word starts at the root."""
        hist = []
        node, clean = self.root, True
        for c in chars:
            c = int(c)
            if c == self.eos_c:
                break
            if c == self.space_c:
                hist.append(node.wid if (clean and node.wid >= 0)
                            else self.unk_w)
                node, clean = self.root, True
                continue
            if clean and c in node.children:
                node = node.children[c]
            else:
                node, clean = None, False
        return tuple(hist), node, clean

    def __call__(self, prefix_tokens):
        prefix = np.asarray(prefix_tokens)
        out = np.empty((prefix.shape[0], self.n_char), np.float32)
        for k in range(prefix.shape[0]):
            out[k] = self._row(prefix[k, 1:])  # [0] is <sos>
        return jnp.asarray(out)

    def _row(self, chars) -> np.ndarray:
        hist, node, in_tree = self._parse(chars)
        probs = self._probs(hist)
        unk_p = max(probs[self.unk_w], 1e-30)
        log_oov = np.log(unk_p) + np.log(self.oov_penalty)
        y = np.empty(self.n_char, np.float32)
        if in_tree:
            # entering OOV mode is allowed from any in-tree node
            y[:] = log_oov
            z = max(probs[node.ids].sum(dtype=np.float64), 1e-30)
            for c, child in node.children.items():
                y[c] = np.log(
                    max(probs[child.ids].sum(dtype=np.float64), 1e-30)
                ) - np.log(z)
            if node.wid >= 0:
                end = np.log(max(probs[node.wid], 1e-30)) - np.log(z)
                closing = node.wid
            else:
                end, closing = log_oov, self.unk_w
        else:  # OOV mode: flat per-char penalty, word closes as <unk>
            y[:] = np.log(self.oov_penalty)
            end, closing = 0.0, self.unk_w
        if self.space_c is not None:
            y[self.space_c] = end
        y[self.eos_c] = end + np.log(
            max(self._probs(hist + (closing,))[self.eos_w], 1e-30)
        )
        y[self.blank_c] = NEG
        return y
