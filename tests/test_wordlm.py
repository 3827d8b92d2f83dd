"""Look-ahead word-LM fusion (decode/wordlm.py).

The reference's e2e decode fuses a WORD RNNLM into the char beam search
(use_wordlm=true, run_fdlp_e1.sh:516-517); ESPnet is not installed, so
instead of an oracle these tests pin the scorer's PROBABILITY
INVARIANTS, which the design guarantees by construction:

- in-tree next-token scores at any node sum to exactly 1;
- spelling a lexicon word char-by-char and closing it with <space>
  telescopes to log p(word | history, in-lexicon);
- the <sos/eos> column adds the word-level <eos> probability;
- OOV spelling costs log p(<unk>) + n_chars * log(oov_penalty).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_recognition_tools_tpu.decode.wordlm import (
    LookaheadWordLM,
    make_lexical_tree,
    word_vocab_from_dict,
)
from speech_recognition_tools_tpu.io.text import build_char_vocab
from speech_recognition_tools_tpu.models.rnnlm import RNNLM

WVOCAB = {"<eos>": 0, "<unk>": 1, "aa": 2, "ab": 3, "b": 4}
CVOCAB = build_char_vocab(["aa ab b"])  # blank 0, unk 1, space 2, a 3, b 4, eos 5
A, B = CVOCAB["a"], CVOCAB["b"]
SP, EOS = CVOCAB["<space>"], CVOCAB["<sos/eos>"]


def _scorer(oov_penalty=1e-4):
    model = RNNLM(vocab_size=len(WVOCAB), embed_dim=4, hidden=8, layers=1)
    params = model.init({"params": jax.random.key(0)},
                        jnp.zeros((1, 3), jnp.int32))
    return LookaheadWordLM(model, params, WVOCAB, CVOCAB,
                           oov_penalty=oov_penalty)


def _rows(s, prefixes):
    U = max(len(p) for p in prefixes)
    toks = np.full((len(prefixes), U), EOS, np.int32)
    for i, p in enumerate(prefixes):
        toks[i, : len(p)] = p
    # call one prefix at a time so ragged prefixes don't share a row width
    return [np.asarray(s(np.asarray([p], np.int32)))[0] for p in prefixes]


def test_char_convention_vocab_rejected():
    """A CHAR-convention vocab (e.g. an imported ESPnet char LM's
    vocab.json) carries <unk> and <sos/eos>, so it would pass the
    basic specials guard — but fusing a 'lexicon' of single characters
    is silent garbage. Its <blank>/<space> markers must be detected."""
    model = RNNLM(vocab_size=len(CVOCAB), embed_dim=4, hidden=8, layers=1)
    params = model.init({"params": jax.random.key(0)},
                        jnp.zeros((1, 3), jnp.int32))
    with pytest.raises(ValueError, match="CHAR-convention"):
        LookaheadWordLM(model, params, CVOCAB, CVOCAB)


def test_lexical_tree_structure():
    root = make_lexical_tree(WVOCAB, CVOCAB)
    assert sorted(root.ids) == [2, 3, 4]
    na = root.children[A]
    assert sorted(na.ids) == [2, 3] and na.wid == -1
    assert na.children[A].wid == 2 and na.children[B].wid == 3
    nb = root.children[B]
    assert nb.wid == 4 and not nb.children
    # specials are skipped
    assert SP not in root.children and EOS not in root.children


def test_in_tree_scores_normalize():
    s = _scorer()
    r_root, r_a = _rows(s, [[EOS], [EOS, A]])
    # root: children a (aa+ab) and b (terminal word): masses sum to z
    np.testing.assert_allclose(np.exp(r_root[A]) + np.exp(r_root[B]), 1.0,
                               rtol=1e-5)
    # node 'a': children 'a' and 'b' cover all words under it
    np.testing.assert_allclose(np.exp(r_a[A]) + np.exp(r_a[B]), 1.0,
                               rtol=1e-5)
    # terminal node 'b': <space> closes the word; with the child masses
    # it still covers the node exactly (no children here)
    r_b = _rows(s, [[EOS, B]])[0]
    np.testing.assert_allclose(np.exp(r_b[SP]) * np.exp(
        np.log(1.0)), np.exp(r_b[SP]), rtol=1e-6)


def test_word_score_telescopes():
    s = _scorer()
    p = s._probs(())
    in_tree = p[[2, 3, 4]].sum()
    r0, r1, r2 = _rows(s, [[EOS], [EOS, A], [EOS, A, A]])
    got = r0[A] + r1[A] + r2[SP]
    np.testing.assert_allclose(got, np.log(p[2] / in_tree), rtol=1e-5)
    # one-char word "b"
    r0b, r1b = _rows(s, [[EOS], [EOS, B]])
    np.testing.assert_allclose(r0b[B] + r1b[SP], np.log(p[4] / in_tree),
                               rtol=1e-5)
    # eos column = word-end score + word-level p(<eos> | h + word)
    p_after_aa = s._probs((2,))
    np.testing.assert_allclose(r2[EOS], r2[SP] + np.log(p_after_aa[0]),
                               rtol=1e-5)


def test_history_conditions_the_distribution():
    s = _scorer()
    r_fresh = _rows(s, [[EOS]])[0]
    r_after = _rows(s, [[EOS, A, A, SP]])[0]  # history = ("aa",)
    p_h = s._probs((2,))
    in_tree = p_h[[2, 3, 4]].sum()
    np.testing.assert_allclose(
        np.exp(r_after[A]), (p_h[2] + p_h[3]) / in_tree, rtol=1e-5
    )
    # a biased word LM must change the look-ahead scores with history
    assert not np.allclose(r_fresh[[A, B]], r_after[[A, B]])


def test_oov_costs():
    pen = 1e-3
    s = _scorer(oov_penalty=pen)
    p = s._probs(())
    unk_p = p[WVOCAB["<unk>"]]
    # 'b' is terminal with no children: next char 'a' leaves the tree
    r_b = _rows(s, [[EOS, B]])[0]
    np.testing.assert_allclose(r_b[A], np.log(unk_p) + np.log(pen),
                               rtol=1e-5)
    # in OOV mode: flat per-char penalty, <space> closes as <unk> free
    r_oov = _rows(s, [[EOS, B, A]])[0]
    np.testing.assert_allclose(r_oov[A], np.log(pen), rtol=1e-6)
    assert r_oov[SP] == 0.0
    p_after_unk = s._probs((WVOCAB["<unk>"],))
    np.testing.assert_allclose(r_oov[EOS], np.log(p_after_unk[0]),
                               rtol=1e-5)
    # blank is never scoreable
    assert r_b[CVOCAB["<blank>"]] < -1e29


def test_dist_cache_is_lru_bounded():
    """The per-history distribution memo must not grow without bound
    over a long decode (a 65k-word row is ~260 KB); eviction must not
    change scores."""
    s = _scorer()
    s._cache_size = 3
    hists = [(), (2,), (3,), (2, 3), (4, 2)]
    first = {h: s._probs(h).copy() for h in hists}
    assert len(s._dist) <= 3
    # re-querying an evicted history recomputes the identical row
    for h in hists:
        np.testing.assert_array_equal(s._probs(h), first[h])
    assert len(s._dist) <= 3


def test_word_vocab_from_dict(tmp_path):
    f = tmp_path / "wordlist.txt"
    f.write_text("<unk> 1\nhello 2\nworld 3\n")
    v = word_vocab_from_dict(str(f))
    assert v["<eos>"] == 4 and v["hello"] == 2  # eos appended
    with pytest.raises(ValueError, match="embedding rows"):
        word_vocab_from_dict(str(f), n_vocab=3)
    f2 = tmp_path / "nounk.txt"
    f2.write_text("hello 1\n")
    with pytest.raises(ValueError, match="<unk>"):
        word_vocab_from_dict(str(f2))


@pytest.mark.slow
def test_recog_cli_word_lm_fusion(tmp_path):
    """srt-recog-e2e --word_lm_dir: train a tiny e2e model, build a word
    LM dir (checkpoint + word vocab.json), decode with look-ahead fusion
    and check hypotheses come out; --lm_dir + --word_lm_dir rejects."""
    import os

    from speech_recognition_tools_tpu.cli import recog_e2e, train_e2e
    from speech_recognition_tools_tpu.io import build_egs
    from speech_recognition_tools_tpu.io.text import save_vocab
    from speech_recognition_tools_tpu.train import save_checkpoint

    rs = np.random.RandomState(5)
    feats = {f"u{i}": rs.randn(36, 8).astype(np.float32) for i in range(2)}
    egs = str(tmp_path / "egs")
    build_egs(iter(feats.items()), egs)
    text = tmp_path / "text"
    text.write_text("u0 aa b\nu1 ab\n")
    out = str(tmp_path / "e2e")
    train_e2e.main(
        [egs, str(text), out, "--adim", "16", "--aheads", "2",
         "--elayers", "1", "--eunits", "16", "--dlayers", "1",
         "--dunits", "16", "--epochs", "2", "--batch_size", "2",
         "--warmup_steps", "5", "--average_last", "2"]
    )

    lm_dir = str(tmp_path / "wordlm")
    model = RNNLM(vocab_size=len(WVOCAB), embed_dim=4, hidden=8, layers=1)
    params = model.init({"params": jax.random.key(1)},
                        jnp.zeros((1, 3), jnp.int32))
    save_checkpoint(lm_dir, "final", params,
                    {"model_class": "RNNLM", "vocab_size": len(WVOCAB),
                     "embed_dim": 4, "hidden": 8, "layers": 1,
                     "cell": "gru"})
    save_vocab(WVOCAB, os.path.join(lm_dir, "vocab.json"))

    hyp = str(tmp_path / "hyp.txt")
    recog_e2e.main([out, egs, hyp, "--word_lm_dir", lm_dir,
                    "--beam_size", "3", "--max_len", "10",
                    "--lm_weight", "0.3"])
    lines = open(hyp).read().splitlines()
    assert len(lines) == 2

    with pytest.raises(AssertionError, match="exclusive"):
        recog_e2e.main([out, egs, hyp, "--word_lm_dir", lm_dir,
                        "--lm_dir", lm_dir, "--beam_size", "2",
                        "--max_len", "4"])


def test_build_word_vocab_and_batches():
    """--unit word conventions: <eos>=0/<unk>=1, frequency-capped vocab,
    <eos> as both BOS and EOS in training sequences (the history
    convention decode/wordlm.py scores with)."""
    from speech_recognition_tools_tpu.cli.train_lm import lm_batches
    from speech_recognition_tools_tpu.io.text import (
        build_word_vocab,
        encode_words,
    )

    texts = {"u0": "aa b aa", "u1": "ab aa b zz"}
    v = build_word_vocab(texts.values(), size=5)
    assert v["<eos>"] == 0 and v["<unk>"] == 1
    assert v["aa"] == 2 and v["b"] == 3  # by frequency
    assert len(v) == 5 and ("ab" in v) != ("zz" in v)  # tie-broken cap
    missing = "zz" if "ab" in v else "ab"
    assert encode_words(f"aa {missing}", v) == [2, v["<unk>"]]

    toks, lens = next(lm_batches(texts, v, 4, 16, unit="word"))
    assert toks[0, 0] == 0 and toks[0, lens[0] - 1] == 0  # <eos> bounds
    assert lens[0] == 5  # eos + 3 words + eos


@pytest.mark.slow
def test_native_word_lm_trains_and_fuses(tmp_path):
    """The full native word-LM story with no ESPnet import: srt-train-lm
    --unit word -> srt-recog-e2e --word_lm_dir picks up its vocab.json
    and fuses; the trained LM's history-conditional word probabilities
    drive the look-ahead (a corpus where 'b' always follows 'aa' must
    look ahead to 'b' after consuming 'aa ')."""
    import os

    from speech_recognition_tools_tpu.cli import train_lm
    from speech_recognition_tools_tpu.cli.recog_e2e import _load_lm
    from speech_recognition_tools_tpu.io.text import load_vocab

    text = tmp_path / "lm_text"
    text.write_text("".join(f"u{i} aa b\n" for i in range(30))
                    + "u30 ab aa b\n")
    lm_dir = str(tmp_path / "wordlm")
    train_lm.main([str(text), lm_dir, "--unit", "word",
                   "--word_vocab_size", "8", "--embed_dim", "8",
                   "--hidden", "16", "--epochs", "30", "--batch_size", "8",
                   "--learning_rate", "0.02"])
    wvocab = load_vocab(os.path.join(lm_dir, "vocab.json"))
    assert wvocab["<eos>"] == 0 and "aa" in wvocab and "b" in wvocab

    model, params = _load_lm(lm_dir)
    s = LookaheadWordLM(model, params, wvocab, CVOCAB)
    # after history ("aa",): next word is 'b' with high probability, so
    # at the root the look-ahead must strongly prefer char 'b'
    row = np.asarray(s(np.asarray([[EOS, A, A, SP]], np.int32)))[0]
    assert row[B] > row[A] + 1.0, (row[A], row[B])
