#!/usr/bin/env python3
"""FER-vs-iteration curve of the native aligner on a synthetic corpus
with known true alignments (VERDICT r4 #6 'done' criterion).

Compares topology tiers against ground truth (make_synth_corpus writes
exact 100 Hz phone labels):

  equal          flat-start only (iteration -1)
  mono1          1-state monophone + optional silence (round-4 tier)
  topo3          3-state phones, 5-state silence, wpd edge silence
                 (the round-5 Kaldi-topology tier)

FER counts PHONE errors (pdf -> phone via the shared HmmTopology base
table; the wpd edge-silence virtual phone scores as silence). Runs on
CPU — pass --data and --utts to size it.

Usage:
  JAX_PLATFORMS=cpu python bench_captures/aligner_curve.py \
      --data .cache/synth/corpus1h --utts 200 \
      --out bench_captures/<date>_aligner_curve.json
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=".cache/synth/corpus1h")
    ap.add_argument("--utts", type=int, default=200)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--am_epochs", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from speech_recognition_tools_tpu.align import (
        HmmTopology,
        equal_align,
        read_lexicon,
        realign_corpus,
        utterance_states,
    )
    from speech_recognition_tools_tpu.dsp import MelConfig, mel_spectrum_batch
    from speech_recognition_tools_tpu.io.text import read_text_file
    from speech_recognition_tools_tpu.io.wav import read_wav_scp_entry

    d = os.path.join(args.data, "train")
    scp = [ln.split(None, 1) for ln in open(os.path.join(d, "wav.scp"))]
    scp = scp[: args.utts]
    texts = read_text_file(os.path.join(d, "text"))
    truth = pickle.load(open(os.path.join(d, "ali.pkl"), "rb"))
    lexicon = read_lexicon(os.path.join(args.data, "lexicon.txt"))

    # quick mel features on CPU (the aligner is front-end agnostic)
    import jax.numpy as jnp

    mcfg = MelConfig(nfilters=64)
    feats = {}
    for utt, path in scp:
        sig = read_wav_scp_entry(path.strip(), expected_srate=16000)[1]
        sig = np.asarray(sig, np.float32)
        f, n = mel_spectrum_batch(
            sig[None], np.asarray([len(sig)]), mcfg, dtype=jnp.float32
        )
        T = min(int(n[0]), len(truth[utt]))
        feats[utt] = np.asarray(f[0, :T])
    print(f"{len(feats)} utts featurised", flush=True)

    num_phones = 27  # silence 0 + letters 1..26

    def pdf_to_phone(topo):
        base = np.asarray(topo.base)

        def f(lab):
            ph = np.searchsorted(base, lab, side="right") - 1
            if topo.wpd_silence:
                ph = np.where(ph == topo.edge_silence_phone,
                              topo.silence_phone, ph)
            return ph

        return f

    def fer(labels, topo):
        conv = pdf_to_phone(topo)
        err = tot = 0
        for u, lab in labels.items():
            t = truth[u][: len(lab)]
            p = conv(np.asarray(lab))[: len(t)]
            err += int(np.sum(p != t))
            tot += len(t)
        return 100.0 * err / tot

    tiers = {
        "mono1": dict(states_per_phone=1, silence_phone=0),
        "topo3": dict(states_per_phone=3, silence_phone=0,
                      silence_states=5, wpd_silence=True),
    }
    out = {"utts": len(feats), "tiers": {}}
    for name, kw in tiers.items():
        topo = HmmTopology(
            num_phones, kw["states_per_phone"], kw["silence_phone"],
            silence_states=kw.get("silence_states"),
            wpd_silence=kw.get("wpd_silence", False),
        )
        # equal-align (iteration -1) baseline under this topology
        eq = {}
        for u in feats:
            p, sk, st = utterance_states(texts[u].split(), lexicon,
                                         topo=topo)
            eq[u] = equal_align(feats[u].shape[0], p)
        fer_eq = fer(eq, topo)
        hist = []
        curve = [{"iter": -1, "fer_pct": round(fer_eq, 2),
                  "note": "equal-align flat start"}]
        labels, _ = realign_corpus(
            feats, {u: texts[u] for u in feats}, lexicon,
            num_iters=args.iters, am_epochs=args.am_epochs,
            hidden_dim=128, history=hist,
            iter_callback=lambda it, lab: curve.append(
                {"iter": it, "fer_pct": round(fer(lab, topo), 2)}
            ),
            **kw,
        )
        for h, c in zip(hist, curve[1:]):
            c["frames_changed_pct"] = h["frames_changed_pct"]
        out["tiers"][name] = curve
        print(f"{name}: FER curve "
              f"{[c['fer_pct'] for c in curve]}", flush=True)

    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
