"""Tandem feature extraction: AM posteriors as features (+ optional PCA).

Native equivalent of the reference's get_Tandem_feats.sh
(recipes/timit/local_pyspeech/get_Tandem_feats.sh): run the acoustic
model forward over a dataset, take softmax posteriors ('softmax') or
pre-softmax activations ('presoftmax' — the raw-nnet --truncate step,
:44-49), write them as a feature ark, and optionally estimate a PCA
transform (est-pca, :72-75) and write the PCA-projected features too.
"""

import argparse
import pickle


def get_parser():
    p = argparse.ArgumentParser("Tandem posterior features")
    p.add_argument("model_dir", help="train_am checkpoint dir")
    p.add_argument("egs_dir")
    p.add_argument("out_base", help="output ark/scp base name")
    p.add_argument("--tandem_type", choices=["softmax", "presoftmax"],
                   default="presoftmax")
    p.add_argument("--get_pca", action="store_true",
                   help="estimate PCA on the posteriors (est-pca) and "
                        "also write <out_base>_pca.{ark,scp} + _pca.pkl")
    p.add_argument("--pca_dim", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=32)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech_recognition_tools_tpu.cli.dump_outputs import (
        arch_forward,
        arch_init,
        load_model_from_checkpoint,
    )
    from speech_recognition_tools_tpu.io import iter_egs_batches, write_ark_scp
    from speech_recognition_tools_tpu.train import load_checkpoint
    from speech_recognition_tools_tpu.utils import apply_pca, estimate_pca

    model, ckpt_path, cfg = load_model_from_checkpoint(args.model_dir)
    batch_iter = lambda: iter_egs_batches(
        args.egs_dir, args.batch_size, drop_labels=True
    )
    first = next(batch_iter())
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    template = arch_init(
        model, cfg, rngs, jnp.asarray(first["feats"]),
        jnp.asarray(first["lengths"]),
    )
    payload, _ = load_checkpoint(ckpt_path, template={"params": template})
    params = payload["params"]

    feats_out = {}
    for b in batch_iter():
        logits, _ = arch_forward(
            model, params, cfg, jnp.asarray(b["feats"]),
            jnp.asarray(b["lengths"]), rng=jax.random.key(2),
        )
        if args.tandem_type == "softmax":
            out = jax.nn.softmax(logits, axis=-1)
        else:
            out = logits
        out = np.asarray(out)
        for i, k in enumerate(b["keys"]):
            feats_out[k] = out[i, : int(b["lengths"][i])]
    write_ark_scp(feats_out, args.out_base)
    print(f"wrote {len(feats_out)} tandem posterior mats -> "
          f"{args.out_base}.ark")

    if args.get_pca:
        allf = np.concatenate(list(feats_out.values()), axis=0)
        transform, mean = estimate_pca(allf, dim=args.pca_dim)
        with open(args.out_base + "_pca.pkl", "wb") as f:
            pickle.dump({"transform": np.asarray(transform),
                         "mean": np.asarray(mean)}, f)
        proj = {
            k: np.asarray(apply_pca(v, transform, mean)).astype(np.float32)
            for k, v in feats_out.items()
        }
        write_ark_scp(proj, args.out_base + "_pca")
        print(f"wrote PCA ({np.asarray(transform).shape}) features -> "
              f"{args.out_base}_pca.ark")


if __name__ == "__main__":
    main()
