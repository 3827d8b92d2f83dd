#!/usr/bin/env python3
"""Demo recipe: the full hybrid pipeline on synthetic data, with the
reference's staged-resume contract (--stage N / --stop_stage M).

Stages (mirroring recipes/timit/run_rnn.sh + run_pm.sh):
  0  data prep: synthesise wavs + alignments, write wav.scp
  1  FDLP featgen (CLI) -> feats ark
  2  egs build (+ global CMVN)
  3  hybrid GRU AM training (LR-revert schedule, resumable)
  4  priors + log-likelihood dump + native Viterbi decode -> FER
  5  PM autoencoder training + PM scores + test-time adaptation

Run:  python recipes/demo/run.py --expdir /tmp/demo --stage 0
"""

import argparse
import os
import pickle
import sys

# allow running straight from a checkout without installation
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--expdir", default="exp/demo")
    p.add_argument("--stage", type=int, default=0)
    p.add_argument("--stop_stage", type=int, default=99)
    p.add_argument("--num_utts", type=int, default=8)
    p.add_argument("--num_classes", type=int, default=5)
    p.add_argument("--srate", type=int, default=16000)
    args = p.parse_args()

    import numpy as np

    from speech_recognition_tools_tpu.cli import (
        adapt_am,
        compute_fdlp_spectrogram,
        compute_prior,
        dump_outputs,
        pm_score_cli,
        train_am,
    )
    from speech_recognition_tools_tpu.io import (
        build_egs,
        read_mat_scp,
    )

    exp = args.expdir
    os.makedirs(exp, exist_ok=True)
    rs = np.random.RandomState(0)

    def in_range(s):
        return args.stage <= s <= args.stop_stage

    if in_range(0):
        print("=== stage 0: data prep")
        from scipy.io.wavfile import write as wav_write

        lines = []
        for i in range(args.num_utts):
            n = args.srate + (i % 3) * args.srate // 2
            sig = (rs.randn(n) * 2000).astype(np.int16)
            path = os.path.join(exp, f"utt{i}.wav")
            wav_write(path, args.srate, sig)
            lines.append(f"utt{i} {path}")
        with open(os.path.join(exp, "wav.scp"), "w") as f:
            f.write("\n".join(lines) + "\n")

    if in_range(1):
        print("=== stage 1: FDLP featgen")
        compute_fdlp_spectrogram.main(
            [os.path.join(exp, "wav.scp"), os.path.join(exp, "fdlp"),
             "--nfilters", "20", "--srate", str(args.srate)]
        )

    if in_range(2):
        print("=== stage 2: egs")
        feats = dict(read_mat_scp(os.path.join(exp, "fdlp.scp")))
        labels = {
            k: rs.randint(0, args.num_classes, v.shape[0]).astype(np.int32)
            for k, v in feats.items()
        }
        with open(os.path.join(exp, "labels.pkl"), "wb") as f:
            pickle.dump(labels, f)
        mean = np.mean(np.concatenate(list(feats.values())), axis=0)
        std = np.std(np.concatenate(list(feats.values())), axis=0)
        build_egs(
            iter(feats.items()), os.path.join(exp, "egs"), labels=labels,
            cmvn=(mean, std), num_targets=args.num_classes,
        )

    if in_range(3):
        print("=== stage 3: hybrid AM training")
        train_am.main(
            [os.path.join(exp, "egs"), os.path.join(exp, "am"),
             "--arch", "rnn", "--num_layers", "1", "--hidden_dim", "32",
             "--epochs", "3", "--batch_size", "4"]
        )

    if in_range(4):
        print("=== stage 4: priors + loglikes + decode")
        compute_prior.main(
            [os.path.join(exp, "egs"), os.path.join(exp, "prior.pkl"),
             "--num_classes", str(args.num_classes)]
        )
        dump_outputs.main(
            [os.path.join(exp, "am"), os.path.join(exp, "egs"),
             os.path.join(exp, "loglikes"),
             "--prior", os.path.join(exp, "prior.pkl")]
        )
        import jax.numpy as jnp

        from speech_recognition_tools_tpu.decode import viterbi_decode
        from speech_recognition_tools_tpu.eval import per_utt_fer

        lls = dict(read_mat_scp(os.path.join(exp, "loglikes.scp")))
        with open(os.path.join(exp, "labels.pkl"), "rb") as f:
            labels = pickle.load(f)
        S = args.num_classes
        trans = np.log(np.full((S, S), 0.1 / (S - 1)) + np.eye(S) * (0.9 - 0.1 / (S - 1)))
        fers = []
        for k, ll in lls.items():
            path, _ = viterbi_decode(
                jnp.asarray(ll)[None], jnp.asarray(trans)
            )
            err = np.mean(np.asarray(path[0]) != labels[k][: ll.shape[0]]) * 100
            fers.append(err)
        print(f"viterbi FER: {np.mean(fers):.1f}%")
        fer = per_utt_fer(lls, labels)
        print(f"argmax FER (mean): {np.mean(list(fer.values())):.1f}%")

    if in_range(5):
        print("=== stage 5: PM + adaptation")
        lls = dict(read_mat_scp(os.path.join(exp, "loglikes.scp")))
        build_egs(iter(lls.items()), os.path.join(exp, "pm_egs"))
        train_am.main(
            [os.path.join(exp, "pm_egs"), os.path.join(exp, "pm"),
             "--arch", "pm_ae", "--num_layers", "1", "--num_layers_dec", "1",
             "--hidden_dim", "16", "--bn_dim", "8", "--epochs", "1",
             "--batch_size", "4", "--loss", "mse"]
        )
        adapt_am.main(
            [os.path.join(exp, "am"), os.path.join(exp, "pm"),
             os.path.join(exp, "egs"), os.path.join(exp, "adapted"),
             "--epochs", "1", "--batch_size", "4",
             "--dev_egs_dir", os.path.join(exp, "egs")]
        )
        pm_score_cli.main(
            ["pm", os.path.join(exp, "am"), os.path.join(exp, "pm"),
             os.path.join(exp, "egs"), os.path.join(exp, "pm.score")]
        )
        with open(os.path.join(exp, "pm.score"), "rb") as f:
            scores = pickle.load(f)
        print(f"PM scores for {len(scores)} utts")

    print("demo recipe done")


if __name__ == "__main__":
    main()
