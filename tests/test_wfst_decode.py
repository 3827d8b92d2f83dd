"""Native WFST decode stack: graph builder (HMM x lexicon x n-gram) +
C++ beam-Viterbi decoder (native/fst_decode.cpp), verified against the
exhaustive pure-Python Viterbi and against ground-truth word sequences.

Reference parity target: Kaldi mkgraph + latgen-faster-mapped
(decode_dnn.sh:121-143) — graph-based hybrid decoding of TPU-dumped
log-likelihoods, here with no external toolkit.
"""

import numpy as np
import pytest

from speech_recognition_tools_tpu.decode.graph import (
    DecodingGraph,
    GraphConfig,
    build_decoding_graph,
)
from speech_recognition_tools_tpu.decode.wfst import (
    WfstDecoder,
    decode_py,
)
from speech_recognition_tools_tpu.models.ngram_lm import train_ngram_lm

RS = np.random.RandomState(7)

LEX = {"go": [0], "stop": [1, 2], "left": [3], "right": [4, 0]}
SENTS = [
    "go stop".split(), "go left".split(), "stop go".split(),
    "right stop".split(), "go stop left".split(), "stop".split(),
    "left right go".split(), "go go stop".split(),
]


@pytest.fixture(scope="module")
def graph(tmp_path_factory):
    lm = train_ngram_lm(SENTS, order=2)
    g = build_decoding_graph(lm, LEX, GraphConfig(states_per_phone=2))
    path = str(tmp_path_factory.mktemp("graph") / "hclg.txt")
    g.write(path)
    return g, path


def _loglikes_for(words, g: DecodingGraph, S=2, frames_per_state=3,
                  noise=0.0):
    """Synthesize (T, P) loglikes strongly favouring the pdf chain of
    `words` under the graph's pdf convention."""
    pdfs = []
    for w in words:
        for ph in LEX[w]:
            for st in range(S):
                pdfs += [ph * S + st] * frames_per_state
    T, P = len(pdfs), g.num_pdfs
    ll = np.full((T, P), -10.0, np.float32)
    ll[np.arange(T), pdfs] = 0.0
    if noise:
        ll += RS.randn(T, P).astype(np.float32) * noise
    return ll


class TestGraph:
    def test_shapes_and_symbols(self, graph):
        g, _ = graph
        assert g.num_pdfs == 5 * 2
        assert set(g.words) == set(LEX)
        assert g.num_states > 10
        assert 0 in {a[0] for a in g.arcs}  # start state has arcs

    def test_write_words(self, graph, tmp_path):
        g, _ = graph
        p = g.write_words(str(tmp_path / "words.txt"))
        lines = open(p).read().splitlines()
        assert lines[0] == "<eps> 0"
        assert len(lines) == len(LEX) + 1


class TestNativeDecoder:
    def test_loads(self, graph):
        g, path = graph
        dec = WfstDecoder(path)
        assert dec.num_states == g.num_states
        assert dec.num_arcs == len(g.arcs)

    @pytest.mark.parametrize(
        "words", [["go", "stop"], ["stop"], ["left", "right", "go"]]
    )
    def test_recovers_word_sequence(self, graph, words):
        g, path = graph
        dec = WfstDecoder(path)
        ll = _loglikes_for(words, g)
        ids, cost = dec.decode(ll, acoustic_scale=1.0, beam=100.0,
                               max_active=0)
        inv = g.id_to_word()
        assert [inv[i] for i in ids] == words
        assert np.isfinite(cost)

    def test_matches_python_reference(self, graph):
        """Wide-beam native decode == exhaustive python Viterbi on noisy
        loglikes (cost and word sequence)."""
        g, path = graph
        dec = WfstDecoder(path)
        for trial in range(3):
            words = [list(LEX)[i] for i in RS.randint(0, 4, 2 + trial)]
            ll = _loglikes_for(words, g, noise=1.0)
            ids_c, cost_c = dec.decode(ll, acoustic_scale=0.7, beam=1e9,
                                       max_active=0)
            ids_p, cost_p = decode_py(path, ll, acoustic_scale=0.7)
            assert ids_c == ids_p
            assert abs(cost_c - cost_p) < 1e-3, (cost_c, cost_p)

    def test_beam_pruning_still_finds_path(self, graph):
        g, path = graph
        dec = WfstDecoder(path)
        ll = _loglikes_for(["go", "stop"], g, noise=0.3)
        ids_wide, cost_wide = dec.decode(ll, acoustic_scale=1.0, beam=1e9)
        ids_narrow, cost_narrow = dec.decode(
            ll, acoustic_scale=1.0, beam=12.0, max_active=200
        )
        assert ids_narrow == ids_wide
        assert abs(cost_narrow - cost_wide) < 1e-3

    def test_lm_prior_breaks_ties(self, graph):
        """With uninformative acoustics the LM should pick a high-prob
        word; 'go' dominates the training corpus unigrams."""
        g, path = graph
        dec = WfstDecoder(path)
        T, P = 4, g.num_pdfs
        ll = np.zeros((T, P), np.float32)
        ids, _ = dec.decode(ll, acoustic_scale=0.01, beam=1e9)
        inv = g.id_to_word()
        assert len(ids) >= 1
        assert inv[ids[0]] in LEX


class TestOptionalSilence:
    def test_silence_topology(self, tmp_path):
        lm = train_ngram_lm(SENTS, order=2)
        g = build_decoding_graph(
            lm, LEX, GraphConfig(states_per_phone=2, silence_phone=5)
        )
        path = str(tmp_path / "hclg_sil.txt")
        g.write(path)
        dec = WfstDecoder(path)
        # silence frames (pdf 10,11) around the word chain still decode
        S = 2
        chain = []
        for ph in LEX["go"]:
            for st in range(S):
                chain += [ph * S + st] * 3
        sil = [5 * S, 5 * S + 1] * 2
        pdfs = sil + chain + sil
        ll = np.full((len(pdfs), g.num_pdfs), -10.0, np.float32)
        ll[np.arange(len(pdfs)), pdfs] = 0.0
        ids, _ = dec.decode(ll, acoustic_scale=1.0, beam=1e9)
        assert [g.id_to_word()[i] for i in ids] == ["go"]

    def test_topology_tier_matches_aligner(self, tmp_path):
        """Graph built with silence_states + wpd_silence shares the
        aligner's HmmTopology pdf numbering, and decodes a label chain
        PRODUCED by the aligner's utterance_states (the exact
        pdf-consistency contract between stage 2 and stage 5 of
        run_corpus; VERDICT r4 #6)."""
        from speech_recognition_tools_tpu.align import (
            HmmTopology,
            trailing_optional,
            utterance_states,
        )

        lm = train_ngram_lm(SENTS, order=2)
        cfg = GraphConfig(states_per_phone=2, silence_phone=5,
                          silence_states=3, wpd_silence=True)
        g = build_decoding_graph(lm, LEX, cfg)
        topo = HmmTopology(6, 2, 5, silence_states=3, wpd_silence=True)
        assert g.num_pdfs == topo.num_pdfs
        # aligner-side chain for 'go stop' with edge + inner silences
        words = ["go", "stop"]
        p, sk, st = utterance_states(words, LEX, topo=topo)
        # forced path: every state once, silences included
        pdfs = [int(x) for x in p]
        ll = np.full((len(pdfs), g.num_pdfs), -10.0, np.float32)
        ll[np.arange(len(pdfs)), pdfs] = 0.0
        path = str(tmp_path / "hclg_topo.txt")
        g.write(path)
        dec = WfstDecoder(path)
        ids, cost = dec.decode(ll, acoustic_scale=1.0, beam=1e9)
        assert [g.id_to_word()[i] for i in ids] == words
        assert np.isfinite(cost)


class TestDecodeCli:
    def test_full_chain(self, tmp_path):
        """train_ngram -> build-graph -> decode ark -> WER vs truth.
        The end-to-end native hybrid decode path (decode_dnn.sh shape)."""
        from speech_recognition_tools_tpu.cli import decode_wfst, train_ngram
        from speech_recognition_tools_tpu.io.kaldi_ark import write_ark_scp

        text = tmp_path / "text"
        text.write_text(
            "".join(f"u{i} {' '.join(s)}\n" for i, s in enumerate(SENTS))
        )
        arpa_dir = str(tmp_path / "lm")
        train_ngram.main([str(text), arpa_dir, "--order", "2"])
        import glob

        arpa = glob.glob(arpa_dir + "/*.arpa*")[0]

        lexicon = tmp_path / "lexicon.txt"
        lexicon.write_text(
            "".join(
                f"{w} {' '.join(str(p) for p in ps)}\n"
                for w, ps in LEX.items()
            )
        )
        graph_dir = str(tmp_path / "graph")
        decode_wfst.main(
            ["build-graph", arpa, str(lexicon), graph_dir,
             "--states_per_phone", "2"]
        )

        # synth loglikes for two utterances
        lm = train_ngram_lm(SENTS, order=2)
        g = build_decoding_graph(lm, LEX, GraphConfig(states_per_phone=2))
        truth = {"utt1": ["go", "stop"], "utt2": ["left", "right", "go"]}
        arks = {k: _loglikes_for(v, g) for k, v in truth.items()}
        write_ark_scp(arks, str(tmp_path / "loglikes"))

        ref = tmp_path / "ref_text"
        ref.write_text(
            "".join(f"{k} {' '.join(v)}\n" for k, v in truth.items())
        )
        out = str(tmp_path / "hyp.txt")
        decode_wfst.main(
            ["decode", graph_dir, str(tmp_path / "loglikes.ark"), out,
             "--acoustic_scale", "1.0", "--beam", "100"]
        )
        hyps = dict(
            line.split(maxsplit=1) for line in open(out).read().splitlines()
        )
        assert hyps["utt1"].strip() == "go stop"
        assert hyps["utt2"].strip() == "left right go"

    def test_threaded_decode_matches_serial(self, graph, tmp_path):
        from speech_recognition_tools_tpu.cli import decode_wfst
        from speech_recognition_tools_tpu.io.kaldi_ark import write_ark_scp

        g, path = graph
        gdir = tmp_path / "graph"
        gdir.mkdir()
        import shutil

        shutil.copy(path, gdir / "HCLG.txt")
        g.write_words(str(gdir / "words.txt"))
        arks = {
            f"u{i}": _loglikes_for(
                [list(LEX)[j] for j in RS.randint(0, 4, 2)], g, noise=0.5
            )
            for i in range(6)
        }
        write_ark_scp(arks, str(tmp_path / "ll"))
        outs = []
        for nt in ("1", "4"):
            out = str(tmp_path / f"hyp{nt}.txt")
            decode_wfst.main(
                ["decode", str(gdir), str(tmp_path / "ll.ark"), out,
                 "--acoustic_scale", "1.0", "--num_threads", nt]
            )
            outs.append(sorted(open(out).read().splitlines()))
        assert outs[0] == outs[1]


class TestNbest:
    def test_nbest_first_matches_onebest(self, graph):
        g, path = graph
        dec = WfstDecoder(path)
        ll = _loglikes_for(["go", "stop"], g, noise=0.8)
        one, cost1 = dec.decode(ll, acoustic_scale=0.8, beam=1e9)
        hyps = dec.decode_nbest(ll, nbest=5, acoustic_scale=0.8, beam=1e9)
        assert hyps[0][0] == one
        assert abs(hyps[0][1] - cost1) < 1e-3
        # distinct hypotheses, ascending costs
        seqs = [tuple(h[0]) for h in hyps]
        assert len(set(seqs)) == len(seqs)
        costs = [h[1] for h in hyps]
        assert costs == sorted(costs)
        assert len(hyps) > 1

    def test_rescore_same_lm_keeps_order(self, graph):
        """Removing the graph LM and re-adding the SAME LM must not
        change the ranking (sanity of the exact-removal identity)."""
        from speech_recognition_tools_tpu.decode.wfst import rescore_nbest

        g, path = graph
        lm = train_ngram_lm(SENTS, order=2)
        dec = WfstDecoder(path)
        ll = _loglikes_for(["left", "right"], g, noise=1.0)
        hyps = dec.decode_nbest(ll, nbest=4, acoustic_scale=0.7, beam=1e9)
        res = rescore_nbest(
            hyps, g.id_to_word(), lm,
            lambda ws: lm.sentence_logprob(ws)[0],
        )
        assert [h[0] for h in res] == [h[0] for h in hyps]
        for (i1, c1), (i2, c2) in zip(hyps, res):
            assert abs(c1 - c2) < 0.3, (c1, c2)

    def test_rescore_oracle_lm_promotes_truth(self, graph):
        """An oracle LM that loves the true sequence must rank it first
        even when the acoustics are ambiguous."""
        from speech_recognition_tools_tpu.decode.wfst import rescore_nbest

        g, path = graph
        lm = train_ngram_lm(SENTS, order=2)
        dec = WfstDecoder(path)
        truth = ["stop", "go"]
        ll = _loglikes_for(truth, g, noise=2.0)
        hyps = dec.decode_nbest(ll, nbest=8, acoustic_scale=0.4, beam=1e9)
        inv = g.id_to_word()
        in_list = [
            i for i, h in enumerate(hyps)
            if [inv[w] for w in h[0]] == truth
        ]
        if not in_list:
            pytest.skip("truth fell outside the nbest under this noise")

        def oracle(ws):
            return 0.0 if ws == truth else -50.0

        res = rescore_nbest(hyps, inv, lm, oracle)
        assert [inv[w] for w in res[0][0]] == truth

    def test_cli_nbest_rescoring(self, graph, tmp_path):
        """decode CLI with --nbest + --rescore_arpa + RNNLM rescoring."""
        import shutil

        from speech_recognition_tools_tpu.cli import (
            decode_wfst,
            train_lm,
            train_ngram,
        )
        from speech_recognition_tools_tpu.io.kaldi_ark import write_ark_scp

        g, path = graph
        gdir = tmp_path / "graph"
        gdir.mkdir()
        shutil.copy(path, gdir / "HCLG.txt")
        g.write_words(str(gdir / "words.txt"))

        text = tmp_path / "text"
        text.write_text(
            "".join(f"u{i} {' '.join(s)}\n" for i, s in enumerate(SENTS))
        )
        train_ngram.main([str(text), str(tmp_path / "lm"), "--order", "2"])
        import glob

        arpa = glob.glob(str(tmp_path / "lm") + "/*.arpa*")[0]
        train_lm.main([str(text), str(tmp_path / "rnnlm"), "--embed_dim",
                       "8", "--hidden", "16", "--epochs", "1",
                       "--batch_size", "8"])

        arks = {"u0": _loglikes_for(["go", "stop"], g, noise=0.5)}
        write_ark_scp(arks, str(tmp_path / "ll"))
        out = str(tmp_path / "hyp.txt")
        decode_wfst.main(
            ["decode", str(gdir), str(tmp_path / "ll.ark"), out,
             "--acoustic_scale", "1.0", "--beam", "1000",
             "--nbest", "4", "--rescore_arpa", arpa,
             "--rescore_lm_dir", str(tmp_path / "rnnlm"),
             "--rescore_weight", "0.5"]
        )
        lines = open(out).read().splitlines()
        assert len(lines) == 1 and lines[0].startswith("u0 ")


class TestFuzz:
    def test_random_graphs_match_python(self, tmp_path):
        """Property test: on random connected WFSTs (epsilon cycles with
        positive costs included) the C++ one-best equals the exhaustive
        python Viterbi."""
        rs = np.random.RandomState(123)
        for trial in range(6):
            S = rs.randint(4, 12)
            P = rs.randint(2, 5)
            lines = []
            for s in range(S):
                for _ in range(rs.randint(1, 4)):
                    d = rs.randint(0, S)
                    il = rs.randint(0, P + 1)  # 0 = eps
                    ol = rs.randint(0, 3)
                    w = float(rs.rand() * 2 + (0.1 if il == 0 else 0.0))
                    lines.append(f"{s} {d} {il} {ol} {w:.4f}")
                # chain arc guaranteeing connectivity
                lines.append(
                    f"{s} {(s + 1) % S} {rs.randint(1, P + 1)} 0 0.5"
                )
            finals = sorted(rs.choice(S, 2, replace=False))
            for s in finals:
                lines.append(f"{s} 0.0")
            path = str(tmp_path / f"fuzz{trial}.txt")
            open(path, "w").write("\n".join(lines) + "\n")

            T = rs.randint(2, 7)
            ll = rs.randn(T, P).astype(np.float32)
            dec = WfstDecoder(path)
            ids_c, cost_c = dec.decode(
                ll, acoustic_scale=0.9, beam=1e9, max_active=0
            )
            ids_p, cost_p = decode_py(path, ll, acoustic_scale=0.9)
            assert abs(cost_c - cost_p) < 1e-3, (trial, cost_c, cost_p)
            assert ids_c == ids_p, (trial, ids_c, ids_p)


class TestEdgeCases:
    def test_no_final_state_falls_back_to_best_token(self, tmp_path):
        """Kaldi partial-result behaviour: unreachable finals still
        yield the best partial hypothesis."""
        path = str(tmp_path / "nofinal.txt")
        # 0 -[pdf1/w1]-> 1 -[pdf2/w2]-> 2 ; final state 3 unreachable
        open(path, "w").write("0 1 1 1 0.0\n1 2 2 2 0.0\n3 0.0\n")
        dec = WfstDecoder(path)
        ll = np.zeros((2, 2), np.float32)
        ids, cost = dec.decode(ll, acoustic_scale=1.0, beam=1e9)
        assert ids == [1, 2]

    def test_bad_pdf_id_raises(self, tmp_path):
        path = str(tmp_path / "bad.txt")
        open(path, "w").write("0 1 5 0 0.0\n1 0.0\n")  # pdf 4 >= P=2
        dec = WfstDecoder(path)
        with pytest.raises(RuntimeError):
            dec.decode(np.zeros((1, 2), np.float32))

    def test_zero_frames(self, graph):
        """T=0 decodes to the best zero-arc path (empty or eps-only)."""
        g, path = graph
        dec = WfstDecoder(path)
        ids, cost = dec.decode(np.zeros((0, g.num_pdfs), np.float32),
                               beam=1e9)
        assert ids == [] or all(i > 0 for i in ids)
