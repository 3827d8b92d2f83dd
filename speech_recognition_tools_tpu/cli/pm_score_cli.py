"""PM confidence-score CLI (replaces pm_score_*.py and
score_utterance_by_mmeasure.py): reconstruction or contrastive PM scores
from a frozen autoencoder over AM outputs, or decoder-free m-measure from
posterior arks. Scores go to a pickle like the reference."""

import argparse
import pickle


def get_parser():
    p = argparse.ArgumentParser("Per-utterance confidence scores")
    sub = p.add_subparsers(dest="mode", required=True)

    pm = sub.add_parser("pm", help="PM autoencoder scores over AM outputs")
    pm.add_argument("model_dir")
    pm.add_argument("pm_dir")
    pm.add_argument("egs_dir")
    pm.add_argument("out_file")
    pm.add_argument("--cmvn_mean")
    pm.add_argument("--time_shifts", default="3,5,7")
    pm.add_argument("--loss", default="l1", choices=["l1", "mse"])
    pm.add_argument("--contrastive", action="store_true")
    pm.add_argument("--batch_size", type=int, default=16)

    mm = sub.add_parser("mmeasure", help="m-measure from posterior scp")
    mm.add_argument("post_scp")
    mm.add_argument("out_file")
    mm.add_argument("--delta_list", default="5,15,25,35,45,55,65,75")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    if args.mode == "mmeasure":
        from speech_recognition_tools_tpu.infer import mmeasure_scores
        from speech_recognition_tools_tpu.io import read_mat_scp

        deltas = tuple(int(x) for x in args.delta_list.split(","))
        scores = mmeasure_scores(read_mat_scp(args.post_scp), deltas)
        with open(args.out_file, "wb") as f:
            pickle.dump(scores, f)
        print(f"wrote {len(scores)} m-measure scores -> {args.out_file}")
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech_recognition_tools_tpu.cli.adapt_am import _restore_pm
    from speech_recognition_tools_tpu.cli.lifelong_decode import _restore
    from speech_recognition_tools_tpu.infer import (
        pm_score_contrastive,
        pm_score_reconstruction,
    )
    from speech_recognition_tools_tpu.io import iter_egs_batches

    am, am_params, am_cfg = _restore(args.model_dir, args.egs_dir, args.batch_size)
    pm, pm_params, _ = _restore_pm(args, am, am_params)
    pm_mean = np.zeros(am_cfg.get("num_classes"), np.float32)
    if args.cmvn_mean:
        with open(args.cmvn_mean, "rb") as f:
            pm_mean = np.asarray(pickle.load(f))

    shifts = tuple(int(x) for x in args.time_shifts.split(","))
    scores = {}
    for b in iter_egs_batches(args.egs_dir, args.batch_size, drop_labels=True):
        feats = jnp.asarray(b["feats"])
        lengths = jnp.asarray(b["lengths"])
        if am_cfg.get("arch") == "feedforward":
            _, logits = am.apply(am_params, feats)
        else:
            logits = am.apply(am_params, feats, lengths)
        seq = logits - jnp.asarray(pm_mean)
        if args.contrastive:
            s = pm_score_contrastive(
                pm.apply, pm_params, seq, lengths, shifts, args.loss
            )
        else:
            s = pm_score_reconstruction(pm.apply, pm_params, seq, lengths, args.loss)
        for i, key in enumerate(b["keys"]):
            scores[key] = float(s[i])
    with open(args.out_file, "wb") as f:
        pickle.dump(scores, f)
    print(f"wrote {len(scores)} PM scores -> {args.out_file}")


if __name__ == "__main__":
    main()
