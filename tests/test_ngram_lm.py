"""n-gram LM tests: probability normalisation, KN behaviour, ARPA
round-trip, perplexity sanity, CLI artefacts (reference
train_universal_lm.sh pipeline)."""

import math

import numpy as np

from speech_recognition_tools_tpu.models.ngram_lm import (
    BOS,
    EOS,
    UNK,
    NgramLM,
    read_arpa,
    sentences_from_text,
    train_ngram_lm,
    write_arpa,
)

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "the cat ate the fish",
    "a dog chased the cat",
    "the fish swam",
    "a cat and a dog",
] * 3


def _sents():
    return sentences_from_text(CORPUS)


class TestTraining:
    def test_conditional_distributions_normalise(self):
        lm = train_ngram_lm(_sents(), order=3)
        words = sorted(lm.vocab | {UNK})
        # sum_w P(w | ctx) ~ 1 for several contexts, incl. backed-off ones
        for ctx in [(), ("the",), ("the", "cat"), ("dog", "sat"),
                    ("unseen_w", "the"), (BOS, BOS)]:
            total = sum(10.0 ** lm.score(ctx, w) for w in words)
            assert abs(total - 1.0) < 1e-6, (ctx, total)

    def test_seen_ngram_beats_unseen(self):
        lm = train_ngram_lm(_sents(), order=3)
        assert lm.score(("the",), "cat") > lm.score(("the",), "swam")

    def test_perplexity_lower_on_train_than_random(self):
        lm = train_ngram_lm(_sents(), order=3)
        ppl_train = lm.perplexity(_sents())
        rs = np.random.RandomState(0)
        vocab = sorted(lm.vocab - {EOS, UNK})
        rand = [[vocab[rs.randint(len(vocab))] for _ in range(6)]
                for _ in range(10)]
        assert ppl_train < lm.perplexity(rand)

    def test_higher_order_helps(self):
        s = _sents()
        p1 = train_ngram_lm(s, order=1).perplexity(s)
        p3 = train_ngram_lm(s, order=3).perplexity(s)
        assert p3 < p1

    def test_oov_mapping(self):
        sents = sentences_from_text(["the zyx cat"], lexicon={"the", "cat"})
        assert sents == [["the", UNK, "cat"]]


class TestArpa:
    def test_roundtrip(self, tmp_path):
        lm = train_ngram_lm(_sents(), order=3)
        path = str(tmp_path / "lm.arpa.gz")
        write_arpa(lm, path)
        lm2 = read_arpa(path)
        assert lm2.order == 3
        for ctx in [(), ("the",), ("the", "cat"), ("fish",)]:
            for w in ["cat", "sat", "swam", EOS]:
                a = lm.score(ctx, w)
                b = lm2.score(ctx, w)
                assert abs(a - b) < 5e-6, (ctx, w, a, b)
        assert abs(lm.perplexity(_sents()) - lm2.perplexity(_sents())) < 0.01


class TestCli:
    def test_builds_artefacts(self, tmp_path):
        from speech_recognition_tools_tpu.cli import train_ngram

        text = tmp_path / "text"
        text.write_text(
            "\n".join(f"utt{i} {t}" for i, t in enumerate(CORPUS)) + "\n"
        )
        lex = tmp_path / "lexicon.txt"
        lex.write_text("the t\ncat c\ndog d\nsat s\non o\nmat m\nlog l\n"
                       "ate a\nfish f\na a\nchased ch\nswam sw\nand an\n")
        out = str(tmp_path / "lm")
        train_ngram.main([str(text), out, "--lexicon", str(lex),
                          "--order", "3", "--heldout", "3"])
        import os

        assert os.path.exists(os.path.join(out, "3gram.arpa.gz"))
        assert os.path.exists(os.path.join(out, "word.counts"))
        lm = read_arpa(os.path.join(out, "3gram.arpa.gz"))
        assert lm.perplexity(_sents()[:3]) < 100.0


def test_arpa_roundtrip_preserves_bos_backoff(tmp_path):
    """Backoff-only contexts (BOS-headed) must survive ARPA export: they
    anchor the start-state back-off arcs of decoding graphs (regression:
    write_arpa used to drop them, changing scores after a round-trip)."""
    from speech_recognition_tools_tpu.models.ngram_lm import (
        BOS,
        read_arpa,
        train_ngram_lm,
        write_arpa,
    )

    sents = [s.split() for s in ["a b", "b a", "a a b", "b"]]
    lm = train_ngram_lm(sents, order=2)
    p = str(tmp_path / "lm.arpa")
    write_arpa(lm, p)
    lm2 = read_arpa(p)
    for ctx in [(BOS,), ("a",), ()]:
        for w in ["a", "b", "zzz"]:
            assert abs(lm.score(ctx, w) - lm2.score(ctx, w)) < 1e-4, (ctx, w)
    assert (BOS,) in lm2.backoff
