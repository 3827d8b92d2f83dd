"""Posterior / log-likelihood dumping CLI.

Replaces extract_posterior.py, dump_genclassifier_outputs.py and
compute_log_prior.py (SURVEY.md §2.3): load a self-describing checkpoint,
run the egs/scp features through the model, write posteriors or
prior-normalised log-likelihoods to a Kaldi ark (the hybrid-decode edge,
decode_dnn.sh stage 0).
"""

import argparse
import pickle


def get_parser():
    p = argparse.ArgumentParser("Dump model outputs for decoding")
    p.add_argument("model_dir", help="checkpoint directory (train_am output)")
    p.add_argument("egs_dir", help="egs dir with the features to decode")
    p.add_argument("save_file", help="output ark base name")
    p.add_argument("--prior", help="pickled log-prior file")
    p.add_argument("--prior_weight", type=float, default=0.8)
    p.add_argument("--add_softmax", action="store_true")
    p.add_argument("--layer", type=int, default=0,
                   help="0=logits, k>0 = k-th embedding layer from the end")
    p.add_argument("--batch_size", type=int, default=32)
    return p


def load_model_from_checkpoint(model_dir):
    """Rebuild a model purely from its checkpoint config (reference
    extract_posterior.py:30-36 contract). Returns (model, ckpt_path, cfg)."""
    import argparse as _ap

    from speech_recognition_tools_tpu.cli.train_am import build_model
    from speech_recognition_tools_tpu.train import latest_checkpoint, load_checkpoint

    path = latest_checkpoint(model_dir) or model_dir
    _, cfg = load_checkpoint(path)
    args = _ap.Namespace(**{k: cfg.get(k) for k in cfg})
    model = build_model(args, cfg["feature_dim"], cfg.get("num_classes"))
    return model, path, cfg


def main(argv=None):
    args = get_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech_recognition_tools_tpu.infer import genclassifier_outputs
    from speech_recognition_tools_tpu.io import iter_egs_batches, write_ark_scp

    from speech_recognition_tools_tpu.train import load_checkpoint

    model, ckpt_path, cfg = load_model_from_checkpoint(args.model_dir)

    # shape-init to build the template, then restore the stored arrays
    first = next(iter_egs_batches(args.egs_dir, args.batch_size))
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    if cfg.get("arch") == "feedforward":
        template = model.init(rngs, jnp.asarray(first["feats"]))
    else:
        template = model.init(
            rngs, jnp.asarray(first["feats"]), jnp.asarray(first["lengths"])
        )
    payload, _ = load_checkpoint(ckpt_path, template={"params": template})
    params = payload["params"]

    log_prior = None
    if args.prior:
        with open(args.prior, "rb") as f:
            log_prior = jnp.asarray(pickle.load(f))

    out = {}
    for batch in iter_egs_batches(args.egs_dir, args.batch_size):
        feats = jnp.asarray(batch["feats"])
        lengths = jnp.asarray(batch["lengths"])
        if cfg.get("arch") == "feedforward":
            embeds, logits = model.apply(params, feats)
            taps = embeds
        else:
            result = model.apply(
                params, feats, lengths, rngs={"sample": jax.random.key(2)}
            )
            logits = result[0] if isinstance(result, tuple) else result
            taps = result[0] if isinstance(result, tuple) else []
        if args.layer > 0:
            sel = taps[-args.layer]
        else:
            sel = genclassifier_outputs(
                logits, log_prior, args.prior_weight,
                add_softmax=args.add_softmax,
            )
        sel = np.asarray(sel)
        for i, key in enumerate(batch["keys"]):
            out[key] = sel[i, : int(batch["lengths"][i])]
    write_ark_scp(out, args.save_file)
    print(f"wrote {len(out)} utterances -> {args.save_file}.ark")


if __name__ == "__main__":
    main()
