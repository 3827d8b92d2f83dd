"""recipes/make_synth_corpus.py — the stand-in for real corpus mounts
(dress rehearsals + controlled WER A/Bs). Checks the generated layout
is exactly what run_corpus consumes and the ground-truth alignments
line up with the audio at 100 Hz."""

import importlib.util
import os
import pickle

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "make_synth_corpus", os.path.join(REPO, "recipes", "make_synth_corpus.py")
)
msc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(msc)

spec2 = importlib.util.spec_from_file_location(
    "run_corpus", os.path.join(REPO, "recipes", "run_corpus.py")
)
run_corpus = importlib.util.module_from_spec(spec2)
spec2.loader.exec_module(run_corpus)


def test_layout_alignment_and_preflight(tmp_path):
    from scipy.io.wavfile import read as wav_read

    out = str(tmp_path / "corpus")
    msc.main([
        "--out", out, "--train_hours", "0.004",
        "--dev_minutes", "0.15", "--test_minutes", "0.15",
        "--n_words", "12",
    ])
    # lexicon: letters map to phone ids 1..26 (silence = 0)
    lex = {}
    for line in open(os.path.join(out, "lexicon.txt")):
        w, *ph = line.split()
        lex[w] = [int(p) for p in ph]
        assert [ord(c) - ord("a") + 1 for c in w] == lex[w]
    assert len(lex) == 12

    for name in ("train", "dev", "test"):
        d = os.path.join(out, name)
        scp = dict(
            line.split(None, 1)
            for line in open(os.path.join(d, "wav.scp")).read().splitlines()
        )
        texts = dict(
            line.split(None, 1)
            for line in open(os.path.join(d, "text")).read().splitlines()
        )
        alis = pickle.load(open(os.path.join(d, "ali.pkl"), "rb"))
        assert set(scp) == set(texts) == set(alis)
        for utt, path in scp.items():
            sr, sig = wav_read(path.strip())
            assert sr == 16000
            # frame labels exactly cover the audio at 100 Hz
            assert len(alis[utt]) == len(sig) // (sr // 100)
            # label phone runs match the transcript: words are always
            # separated by >= 1 silence frame, and within a word
            # adjacent repeated letters merge into one run
            lab = alis[utt]
            runs = []
            prev = 0
            for x in lab:
                x = int(x)
                if x != 0 and x != prev:
                    runs.append(x)
                prev = x
            exp2 = []
            for w in texts[utt].split():
                last = None
                for p in lex[w]:
                    if p != last:
                        exp2.append(p)
                    last = p
                last = None
            assert runs == exp2, (utt, runs[:10], exp2[:10])

    # the generated corpus preflights READY against the production config
    res = run_corpus.main([
        "--config", os.path.join(REPO, "recipes/configs/wsj_fdlp_e2e.json"),
        "--data", out, "--expdir", str(tmp_path / "exp"), "--check_data",
    ])
    assert res == []
