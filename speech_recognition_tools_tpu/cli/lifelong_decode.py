"""Lifelong/continual decoding CLI.

Replaces the compute_*likelihood*.py family (SURVEY.md §2.3): load K
classifier checkpoints p(c|x) and K VAE density checkpoints p(x), fuse
posteriors over tasks (powerset / incremental / per-frame / autoT) weighted
by data-driven or fixed task priors, divide by class priors, write the
fused log-likelihood ark for decoding.
"""

import argparse
import pickle


def get_parser():
    p = argparse.ArgumentParser("Compute lifelong-decoding likelihoods")
    p.add_argument("models_pcx", help="comma-separated classifier ckpt dirs")
    p.add_argument("models_px", help="comma-separated VAE ckpt dirs")
    p.add_argument("egs_dir", help="features to decode")
    p.add_argument("priors", help="comma-separated pickled log-prior files")
    p.add_argument("task_prior",
                   help="'dp' | 'mm' | 'lowent' | comma-separated floats")
    p.add_argument("save_file", help="output ark base")
    p.add_argument("--prior_weight", type=float, default=0.8)
    p.add_argument("--fusion", default="powerset",
                   choices=["powerset", "incremental", "perframe", "autoT",
                            "postpm"])
    p.add_argument("--pm_on", default="feats",
                   choices=["feats", "posteriors"],
                   help="input to the p(x) PM models: the features, or the "
                        "classifier outputs (the reference's postpm "
                        "variants build the VAE on num_classes inputs, "
                        "compute_advanced_likelihood_postpm.py:93,145)")
    p.add_argument("--beta", type=float, default=None,
                   help="dp task-prior sharpening; defaults to the "
                        "reference's per-mode constant (300 powerset / "
                        "500 postpm and incremental)")
    p.add_argument("--batch_size", type=int, default=8)
    return p


def _restore(model_dir, egs_dir, batch_size):
    import jax
    import jax.numpy as jnp

    from speech_recognition_tools_tpu.cli.dump_outputs import (
        arch_init,
        load_model_from_checkpoint,
    )
    from speech_recognition_tools_tpu.io import iter_egs_batches
    from speech_recognition_tools_tpu.train import load_checkpoint

    model, path, cfg = load_model_from_checkpoint(model_dir)
    first = next(iter_egs_batches(egs_dir, batch_size, drop_labels=True))
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    f0 = jnp.asarray(first["feats"])
    if cfg.get("feature_dim") and cfg["feature_dim"] != f0.shape[-1]:
        # e.g. postpm p(x) models are trained on classifier outputs, not
        # on the egs features — shape the init template from the
        # checkpoint's own input dim
        f0 = jnp.zeros(f0.shape[:-1] + (cfg["feature_dim"],), f0.dtype)
    template = arch_init(
        model, cfg, rngs, f0, jnp.asarray(first["lengths"]),
    )
    payload, _ = load_checkpoint(path, template={"params": template})
    return model, payload["params"], cfg


def main(argv=None):
    args = get_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech_recognition_tools_tpu.infer import (
        autoT_fusion,
        framewise_vae_score,
        lifelong_fusion_incremental,
        lifelong_fusion_perframe,
        lifelong_fusion_powerset,
        task_priors,
    )
    from speech_recognition_tools_tpu.io import iter_egs_batches, write_ark_scp

    pcx_dirs = args.models_pcx.split(",")
    px_dirs = args.models_px.split(",")
    assert len(pcx_dirs) == len(px_dirs), "need one p(x) model per p(c|x)"
    classifiers = [_restore(d, args.egs_dir, args.batch_size) for d in pcx_dirs]
    vaes = [_restore(d, args.egs_dir, args.batch_size) for d in px_dirs]
    log_priors = [
        np.asarray(pickle.load(open(f, "rb"))) for f in args.priors.split(",")
    ]
    fixed_tp = None
    if args.task_prior not in ("dp", "mm", "lowent"):
        fixed_tp = [float(x) for x in args.task_prior.split(",")]
    if args.beta is None:
        # the reference hardcodes exp(300*px) for powerset and
        # exp(500*px) for postpm/incremental
        # (compute_advanced_likelihood.py:161 vs _postpm.py:161)
        args.beta = 500.0 if args.fusion in ("postpm", "incremental") else 300.0

    out = {}
    for batch in iter_egs_batches(args.egs_dir, args.batch_size, drop_labels=True):
        feats = jnp.asarray(batch["feats"])
        lengths = jnp.asarray(batch["lengths"])
        pcx_all, pxf_all = [], []
        for (cm, cp, ccfg), (vm, vp, _) in zip(classifiers, vaes):
            from speech_recognition_tools_tpu.cli.dump_outputs import arch_forward

            logits, _ = arch_forward(cm, cp, ccfg, feats, lengths)
            pcx_all.append(np.asarray(jax.nn.softmax(logits, -1)))
            pm_in = feats if args.pm_on == "feats" else logits
            recon, latent = vm.apply(
                vp, pm_in, lengths, rngs={"sample": jax.random.key(0)}
            )
            pxf_all.append(
                framewise_vae_score(
                    np.asarray(pm_in), np.asarray(recon),
                    np.asarray(latent[0]), np.asarray(latent[1]),
                )
            )
        for i, key in enumerate(batch["keys"]):
            n = int(batch["lengths"][i])
            pcx = [p[i, :n] for p in pcx_all]
            pxf = [np.exp(f[i, :n]) for f in pxf_all]
            px_means = [float(np.mean(f)) for f in pxf]
            mode = args.task_prior if fixed_tp is None else "fixed"
            tp = task_priors(mode, px_means, posteriors=pcx, fixed=fixed_tp,
                             beta=args.beta)
            if args.fusion in ("powerset", "postpm"):
                out[key] = lifelong_fusion_powerset(
                    pcx, log_priors, tp, args.prior_weight,
                    weighted_power=args.fusion == "postpm",
                )
            elif args.fusion == "incremental":
                out[key] = lifelong_fusion_incremental(
                    pcx, log_priors, tp, args.prior_weight
                )
            elif args.fusion == "perframe":
                out[key] = lifelong_fusion_perframe(
                    pcx, pxf, log_priors, args.prior_weight, args.beta
                )
            else:
                out[key], _ = autoT_fusion(
                    pcx, log_priors, px_means, args.prior_weight
                )
    write_ark_scp(out, args.save_file)
    print(f"wrote {len(out)} fused utterances -> {args.save_file}.ark")


if __name__ == "__main__":
    main()
