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
    p.add_argument("--multi_egs_dirs",
                   help="(multimod models) comma-separated extra egs dirs, "
                        "one per additional stream (reference "
                        "dump_multimod_outputs.py takes 3 scp files)")
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


def load_frozen_encoder(base_model_dir, target_arch, rngs, feats, lengths,
                        sample_seed=3):
    """Latent-extraction closure over a frozen VAE/CURL checkpoint.

    The reference freezes the generative model by excluding it from the
    optimizer (train_VAE_encoded_nnet_classfier.py:147,
    train_CURL_encoded_classifier.py); here the closure stop_gradients the
    latents, so the same encode_fn serves training and dumping
    (compute_vae_encoded_likelihood.py / compute_CURL_classifier_likelihood.py).
    vae_encoded uses the encoder means (latent[0]); curl_encoded uses the
    posterior-weighted mixture latent (compute_latent_features, nnet_models.py:739).
    """
    import jax

    from speech_recognition_tools_tpu.models.curl import compute_latent_features
    from speech_recognition_tools_tpu.train import load_checkpoint

    base_model, base_path, base_cfg = load_model_from_checkpoint(base_model_dir)
    template = arch_init(base_model, base_cfg, rngs, feats, lengths)
    payload, _ = load_checkpoint(base_path, template={"params": template})
    base_params = payload["params"]

    def encode_fn(feats, lengths):
        out = base_model.apply(
            base_params, feats, lengths,
            rngs={"sample": jax.random.key(sample_seed)},
        )
        latent = out[-1]
        if target_arch == "vae_encoded":
            z = latent[0]
        else:
            z = compute_latent_features(latent)
        return jax.lax.stop_gradient(z)

    return encode_fn


def arch_init(model, cfg, rngs, feats, lengths, encode_fn=None):
    """Arch-aware shape-init for checkpoint templates."""
    import jax.numpy as jnp

    arch = cfg.get("arch")
    if arch == "feedforward":
        return model.init(rngs, feats)
    if arch in ("vae_encoded", "curl_encoded"):
        return model.init(rngs, encode_fn(feats, lengths), lengths)
    if arch == "multimod":
        if isinstance(feats, (list, tuple)):
            return model.init(rngs, list(feats), lengths)
        K = cfg.get("comp_num", 2)
        D = feats.shape[-1] // K
        streams = [feats[..., k * D : (k + 1) * D] for k in range(K)]
        return model.init(rngs, streams, lengths)
    if arch in ("cnn", "vae_cnn", "rs_vae"):
        x = jnp.swapaxes(feats, 1, 2)[:, None]
        return model.init(rngs, x)
    if arch == "vae_cnn_pool":
        # the pooled VAE's Linear heads fix the patch geometry; one
        # (B, 1, D, W) window is enough for a shape template. Imported
        # checkpoints record num_frames; natively trained ones record
        # the train_am --patch_width flag.
        W = int(cfg.get("num_frames") or cfg.get("patch_width") or 21)
        x = jnp.swapaxes(feats, 1, 2)[:, None, :, :W]
        return model.init(rngs, x)
    if arch == "cldnn":
        return model.init(rngs, jnp.swapaxes(feats, 1, 2)[:, None], lengths)
    return model.init(rngs, feats, lengths)


def arch_forward(model, params, cfg, feats, lengths, rng=None, encode_fn=None):
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
    if arch in ("vae_encoded", "curl_encoded"):
        # the reference's --ae_type vaeenc path
        # (compute_vae_encoded_likelihood.py): frozen encoder latents ->
        # classifier logits
        return model.apply(params, encode_fn(feats, lengths), lengths), []
    if arch == "multimod":
        if isinstance(feats, (list, tuple)):
            return model.apply(params, list(feats), lengths), []
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
    if arch == "vae_cnn_pool":
        # per-frame bottleneck means: window the utterance into the
        # trained context patches (center-aligned), encode each, and
        # edge-replicate back to T rows so downstream per-frame
        # consumers see one embedding per input frame
        W = int(cfg.get("num_frames") or cfg.get("patch_width") or 21)
        B, T, D = feats.shape
        if T < W:
            raise ValueError(
                f"utterance batch has {T} frames but the pooled VAE was "
                f"trained on {W}-frame patches"
            )
        half = W // 2
        starts = jnp.arange(T - W + 1)
        idx = starts[:, None] + jnp.arange(W)[None, :]
        patches = jnp.swapaxes(feats[:, idx], 2, 3)  # (B, P, D, W)
        P = patches.shape[1]
        patches = patches.reshape(B * P, 1, D, W)
        _, (means, _) = model.apply(
            params, patches, rngs=rngs or {"sample": jax.random.key(0)}
        )
        means = means.reshape(B, P, -1)
        means = jnp.pad(
            means, ((0, 0), (half, T - P - half), (0, 0)), mode="edge"
        )
        return means, []
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
    from speech_recognition_tools_tpu.io import (
        iter_egs_batches,
        iter_egs_batches_multi,
        write_ark_scp,
    )

    from speech_recognition_tools_tpu.train import load_checkpoint

    model, ckpt_path, cfg = load_model_from_checkpoint(args.model_dir)

    if args.multi_egs_dirs:
        dirs = [args.egs_dir] + args.multi_egs_dirs.split(",")
        batch_iter = lambda: iter_egs_batches_multi(dirs, args.batch_size)
    else:
        batch_iter = lambda: iter_egs_batches(args.egs_dir, args.batch_size)

    def _as_feats(batch):
        if isinstance(batch["feats"], list):
            return [jnp.asarray(s) for s in batch["feats"]]
        return jnp.asarray(batch["feats"])

    # shape-init to build the template, then restore the stored arrays
    first = next(batch_iter())
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    f0, l0 = _as_feats(first), jnp.asarray(first["lengths"])
    encode_fn = None
    if cfg.get("arch") in ("vae_encoded", "curl_encoded"):
        encode_fn = load_frozen_encoder(
            cfg["base_model"], cfg["arch"], rngs, f0, l0
        )
    template = arch_init(model, cfg, rngs, f0, l0, encode_fn=encode_fn)
    payload, _ = load_checkpoint(ckpt_path, template={"params": template})
    params = payload["params"]

    log_prior = None
    if args.prior:
        with open(args.prior, "rb") as f:
            log_prior = jnp.asarray(pickle.load(f))

    out = {}
    for batch in batch_iter():
        feats = _as_feats(batch)
        lengths = jnp.asarray(batch["lengths"])
        logits, taps = arch_forward(
            model, params, cfg, feats, lengths, rng=jax.random.key(2),
            encode_fn=encode_fn,
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
