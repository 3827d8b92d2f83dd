"""Test-time adaptation CLI (replaces the nnet_adapt_*.py family).

Loads an AM checkpoint + a frozen PM autoencoder checkpoint, adapts the AM
on unlabeled test egs so the PM reconstruction loss drops, tracks dev FER
on labeled dev egs, saves the adapted model.
"""

import argparse


def get_parser():
    p = argparse.ArgumentParser("Unsupervised test-time adaptation")
    p.add_argument("model_dir", help="AM checkpoint dir")
    p.add_argument("pm_dir", help="PM autoencoder checkpoint dir")
    p.add_argument("egs_dir", help="unlabeled test egs")
    p.add_argument("store_path", help="output dir for the adapted model")
    p.add_argument("--dev_egs_dir", help="labeled dev egs for FER tracking")
    p.add_argument("--cmvn_mean", help="pickled PM-input mean vector")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--optimizer", default="adam")
    p.add_argument("--time_shift", type=int, default=0)
    p.add_argument("--time_shifts", default="",
                   help="comma list for multishift/contrastive variants")
    p.add_argument("--loss", default="mse", choices=["mse", "l1"])
    p.add_argument("--l2_source", type=float, default=0.0)
    p.add_argument("--contrastive", action="store_true")
    p.add_argument("--supervised_weight", type=float, default=0.0)
    p.add_argument("--mm_weight", type=float, default=0.0,
                   help="M-measure weight (AEPC variant: loss = recon - mm_weight * M-measure)")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    import pickle

    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech_recognition_tools_tpu.cli.lifelong_decode import _restore
    from speech_recognition_tools_tpu.infer import AdaptConfig, adapt_model
    from speech_recognition_tools_tpu.io import iter_egs_batches
    from speech_recognition_tools_tpu.train import (
        masked_frame_error,
        save_checkpoint,
    )

    am, am_params, am_cfg = _restore(args.model_dir, args.egs_dir, args.batch_size)
    pm, pm_params, pm_cfg = _restore_pm(args, am, am_params)

    if args.cmvn_mean:
        with open(args.cmvn_mean, "rb") as f:
            pm_mean = np.asarray(pickle.load(f))
    else:
        pm_mean = np.zeros(am_cfg.get("num_classes"), np.float32)

    def am_apply(params, feats, lengths):
        if am_cfg.get("arch") == "feedforward":
            return am.apply(params, feats)
        return am.apply(params, feats, lengths)

    def batches():
        for b in iter_egs_batches(args.egs_dir, args.batch_size, drop_labels=True):
            yield dict(
                feats=jnp.asarray(b["feats"]), lengths=jnp.asarray(b["lengths"])
            )

    eval_fn = None
    if args.dev_egs_dir:
        def eval_fn(params):
            fers = []
            for b in iter_egs_batches(args.dev_egs_dir, args.batch_size):
                out = am_apply(params, jnp.asarray(b["feats"]),
                               jnp.asarray(b["lengths"]))
                logits = out[1] if isinstance(out, tuple) else out
                fers.append(float(masked_frame_error(
                    logits, jnp.asarray(b["labels"]), jnp.asarray(b["lengths"])
                )))
            return {"fer": sum(fers) / max(len(fers), 1)}

    shifts = tuple(int(x) for x in args.time_shifts.split(",") if x)
    cfg = AdaptConfig(
        optimizer=args.optimizer, learning_rate=args.learning_rate,
        time_shift=args.time_shift, time_shifts=shifts, loss=args.loss,
        l2_source=args.l2_source, contrastive=args.contrastive,
        supervised_weight=args.supervised_weight,
        mm_weight=args.mm_weight,
    )
    adapted = adapt_model(
        am_apply, am_params, pm.apply, pm_params, pm_mean, batches, cfg,
        epochs=args.epochs, eval_fn=eval_fn,
    )
    save_checkpoint(args.store_path, "adapted", adapted, dict(am_cfg))
    print(f"saved adapted model -> {args.store_path}/adapted")


def _restore_pm(args, am, am_params):
    """PM checkpoint restore: template shaped by the AM's output dim."""
    import jax
    import jax.numpy as jnp

    from speech_recognition_tools_tpu.cli.dump_outputs import (
        load_model_from_checkpoint,
    )
    from speech_recognition_tools_tpu.train import load_checkpoint

    pm, path, cfg = load_model_from_checkpoint(args.pm_dir)
    num_classes = cfg.get("feature_dim")
    dummy = jnp.zeros((1, 8, num_classes), jnp.float32)
    template = pm.init(
        {"params": jax.random.key(0)}, dummy, jnp.asarray([8])
    )
    payload, _ = load_checkpoint(path, template={"params": template})
    return pm, payload["params"], cfg


if __name__ == "__main__":
    main()
