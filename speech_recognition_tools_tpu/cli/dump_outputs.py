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


def arch_init(model, cfg, rngs, feats, lengths):
    """Arch-aware shape-init for checkpoint templates."""
    import jax.numpy as jnp

    arch = cfg.get("arch")
    if arch == "feedforward":
        return model.init(rngs, feats)
    if arch == "multimod":
        K = cfg.get("comp_num", 2)
        D = feats.shape[-1] // K
        streams = [feats[..., k * D : (k + 1) * D] for k in range(K)]
        return model.init(rngs, streams, lengths)
    if arch in ("cnn", "vae_cnn", "rs_vae"):
        x = jnp.swapaxes(feats, 1, 2)[:, None]
        return model.init(rngs, x)
    if arch == "cldnn":
        return model.init(rngs, jnp.swapaxes(feats, 1, 2)[:, None], lengths)
    return model.init(rngs, feats, lengths)


def arch_forward(model, params, cfg, feats, lengths, rng=None):
    """Arch-aware forward returning (logits_or_posteriors, embeds_list).

    Handles the reference's --ae_type style dispatch
    (dump_genclassifier_outputs.py:100-106) plus multimod stream splitting
    (dump_multimod_outputs.py) and CURL posterior mixing
    (compute_CURL_classifier_likelihood.py): for CURL the output is the
    categorical-posterior-weighted mixture of stream-classifier softmaxes
    (returned as log-probabilities).
    """
    import jax
    import jax.numpy as jnp

    arch = cfg.get("arch")
    rngs = {"sample": rng} if rng is not None else {}
    if arch == "feedforward":
        embeds, logits = model.apply(params, feats)
        return logits, embeds
    if arch == "multimod":
        K = cfg.get("comp_num", 2)
        D = feats.shape[-1] // K
        streams = [feats[..., k * D : (k + 1) * D] for k in range(K)]
        return model.apply(params, streams, lengths), []
    if arch == "curl":
        class_out, _, latent = model.apply(
            params, feats, lengths,
            rngs=rngs or {"sample": jax.random.key(0)},
        )
        cat = latent[0]  # (B, T, K)
        post = jnp.einsum(
            "kbtc,btk->btc", jax.nn.softmax(class_out, -1), cat
        )
        return jnp.log(jnp.maximum(post, 1e-12)), []
    if arch in ("multitask_ae", "multitask_aear", "vae_classifier"):
        out = model.apply(
            params, feats, lengths, rngs=rngs or {"sample": jax.random.key(0)}
        )
        return out[0], []
    out = model.apply(params, feats, lengths, rngs=rngs)
    if isinstance(out, tuple):
        return out[0], []
    return out, []


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
    template = arch_init(
        model, cfg, rngs, jnp.asarray(first["feats"]),
        jnp.asarray(first["lengths"]),
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
        logits, taps = arch_forward(
            model, params, cfg, feats, lengths, rng=jax.random.key(2)
        )
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
