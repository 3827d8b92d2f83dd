"""Acoustic-model training CLI.

One driver + --arch dispatch replaces the reference's 23 train_*.py clones
and the per-recipe train_*.sh wrappers (SURVEY.md §2.3, §2.7): egs dir in,
self-describing checkpoints out, with the LR-halve-and-revert schedule and
newest-checkpoint resume (the babysitter loop's contract).
"""

import argparse
import os


ARCHS = {
    "rnn": "RNNClassifier",
    "linear": "LinearConvStack",
    "feedforward": "FeedforwardClassifier",
    "multitask_ae": "AEClassifierMultitask",
    "vae": "VAE",
    "vae_classifier": "VAEClassifier",
    "arvae": "ARVAE",
    "curl": "CurlMultistreamClassifier",
    "curl_unsup": "CurlSupervised",
    "pm_ae": "AutoencoderRNN",
    "apc": "APC",
    "cnn": "CNNFrameClassifier",
    "cldnn": "CLDNN",
    "multimod": "MultistreamRNN",
    "multitask_aear": "AEClassifierMultitaskAEAR",
    "vae_cnn": "VAECNNNopool",
    "vae_cnn_pool": "VAECNN",
    "rs_vae": "VaeRsModulation",
    "modnet": "ModulationNet",
    "modnet_sigmoid": "ModulationSigmoidNet",
    "vae_encoded": "VAEEncodedClassifier",
    "curl_encoded": "CurlEncodedClassifier",
}


def get_parser():
    p = argparse.ArgumentParser("Train an acoustic / generative model")
    p.add_argument("egs_dir", help="egs directory (io.build_egs output)")
    p.add_argument("store_path", help="checkpoint directory")
    p.add_argument("--dev_egs_dir", help="dev egs dir (defaults to egs_dir)")
    p.add_argument("--arch", default="rnn", choices=sorted(ARCHS))
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--num_layers_dec", type=int, default=1)
    p.add_argument("--hidden_dim", type=int, default=512)
    p.add_argument("--bn_dim", type=int, default=64)
    p.add_argument("--comp_num", type=int, default=2)
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--optimizer", default="adam")
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--lrr", type=float, default=0.5, help="LR reduction rate")
    p.add_argument("--lr_tol", type=float, default=0.0)
    p.add_argument("--clip_thresh", type=float, default=1.0)
    p.add_argument("--loss", default="ce", choices=["ce", "mse", "vae_gauss", "vae_laplace"])
    p.add_argument("--only_ae", action="store_true")
    p.add_argument("--use_transformer", action="store_true")
    p.add_argument("--time_shift", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch axis over the mesh's 'data' axis")
    p.add_argument("--expert_parallel", type=int, default=1,
                   help="(arch=curl) size of the mesh 'model' axis the "
                        "CURL component/stream (expert) axis shards over; "
                        "uses the vmapped CurlMultistreamClassifierEP "
                        "layout (parallel/ep.py)")
    p.add_argument("--expand_from",
                   help="(arch=curl) checkpoint dir of a trained CURL model "
                        "to grow by one component before training — the "
                        "reference's --expand_component lifelong flow")
    p.add_argument("--base_model",
                   help="(vae_encoded/curl_encoded) checkpoint dir of the "
                        "frozen generative model whose latents feed the "
                        "classifier (reference "
                        "train_VAE_encoded_nnet_classfier.py vae_model arg)")
    p.add_argument("--multi_egs_dirs",
                   help="(arch=multimod) comma-separated extra egs dirs, one "
                        "per additional feature stream — the reference's 3 "
                        "parallel egs dirs (train_multimod_nnet.py, "
                        "datasets.py:42). Without it the feature dim is "
                        "split into comp_num contiguous streams.")
    p.add_argument("--frame_egs", action="store_true",
                   help="(arch=feedforward) egs_dir holds frame-level "
                        "shuffled egs (io.build_frame_egs — the reference's "
                        "data_prep_feedforward.py pipeline)")
    p.add_argument("--patch_width", type=int, default=21,
                   help="(modnet archs) frames per input patch")
    p.add_argument("--freq_num", type=int, default=10,
                   help="(modnet archs) candidate modulation frequencies")
    p.add_argument("--head_num", type=int, default=4,
                   help="(modnet) gumbel frequency-pick heads")
    return p


def build_model(args, feat_dim, num_classes):
    from speech_recognition_tools_tpu import models as M

    if args.arch == "rnn":
        return M.RNNClassifier(args.num_layers, args.hidden_dim, num_classes,
                               args.dropout)
    if args.arch == "linear":
        return M.LinearConvStack(args.num_layers, args.hidden_dim, num_classes)
    if args.arch == "feedforward":
        return M.FeedforwardClassifier(args.num_layers, args.hidden_dim, num_classes)
    if args.arch == "multitask_ae":
        return M.AEClassifierMultitask(
            out_size=num_classes, num_layers_enc=args.num_layers,
            num_layers_class=args.num_layers_dec, num_layers_ae=args.num_layers_dec,
            hidden_size=args.hidden_dim, bn_size=args.bn_dim, dropout=args.dropout,
        )
    if args.arch == "vae":
        return M.VAE(
            num_layers_enc=args.num_layers, num_layers_dec=args.num_layers_dec,
            hidden_size=args.hidden_dim, bn_size=args.bn_dim, dropout=args.dropout,
            only_ae=args.only_ae, use_transformer=args.use_transformer,
        )
    if args.arch == "vae_classifier":
        return M.VAEClassifier(
            out_size=num_classes, num_layers_enc=args.num_layers,
            num_layers_class=args.num_layers_dec, num_layers_ae=args.num_layers_dec,
            hidden_size=args.hidden_dim, bn_size=args.bn_dim, dropout=args.dropout,
        )
    if args.arch == "curl":
        # expert-parallel runs use the vmapped component layout (leading
        # expert axis shardable over the mesh 'model' axis); numerically
        # identical to the loop layout (models/curl.py, tests).
        ep_size = getattr(args, "expert_parallel", 1) or 1
        cls = (
            M.CurlMultistreamClassifierEP
            if ep_size > 1
            else M.CurlMultistreamClassifier
        )
        return cls(
            out_size=num_classes, num_layers_enc=args.num_layers,
            num_layers_dec=args.num_layers_dec, num_layers_class=args.num_layers_dec,
            hidden_size=args.hidden_dim, hidden_size_classifier=args.hidden_dim,
            bn_size=args.bn_dim, comp_num=args.comp_num,
        )
    if args.arch == "curl_unsup":
        return M.CurlSupervised(
            num_layers_enc=args.num_layers, num_layers_dec=args.num_layers_dec,
            hidden_size=args.hidden_dim, bn_size=args.bn_dim,
            comp_num=args.comp_num,
        )
    if args.arch == "pm_ae":
        return M.AutoencoderRNN(
            num_layers_enc=args.num_layers, num_layers_dec=args.num_layers_dec,
            hidden_size=args.hidden_dim, bn_size=args.bn_dim, dropout=args.dropout,
        )
    if args.arch == "arvae":
        return M.ARVAE(
            num_layers_enc=args.num_layers, num_layers_dec=args.num_layers_dec,
            hidden_size=args.hidden_dim, bn_size=args.bn_dim,
            num_outs=max(1, args.time_shift) if args.time_shift else 2,
            dropout=args.dropout,
        )
    if args.arch == "apc":
        from speech_recognition_tools_tpu.models.apc import APC

        return APC(num_layers=args.num_layers, hidden_size=args.hidden_dim)
    # CNN-family geometry: the CLI derives channels/kernel from
    # hidden_dim; checkpoints imported from the reference
    # (io/torch_import.py) carry explicit cnn_out_channels /
    # cnn_in_channels / cnn_kernel keys instead (the reference allows
    # arbitrary per-layer channel lists the CLI flags can't express)
    def _geom(attr, default):
        v = getattr(args, attr, None)
        return tuple(v) if v else default

    if args.arch == "cnn":
        return M.CNNFrameClassifier(
            out_channels=_geom(
                "cnn_out_channels",
                (args.hidden_dim // 8,) * args.num_layers_dec,
            ),
            kernel=_geom("cnn_kernel", (3, 3)), output_size=num_classes,
        )
    if args.arch == "cldnn":
        return M.CLDNN(
            out_channels=_geom("cnn_out_channels", (args.hidden_dim // 8,)),
            kernel=_geom("cnn_kernel", (3, 3)),
            hidden_size=args.hidden_dim, l_num_layers=args.num_layers,
            d_num_layers=args.num_layers_dec, output_size=num_classes,
        )
    if args.arch == "multimod":
        return M.MultistreamRNN(
            num_streams=args.comp_num, num_layers_subband=args.num_layers,
            hidden_size_subband=args.hidden_dim // args.comp_num,
            num_layers=args.num_layers_dec, out_size=num_classes,
        )
    if args.arch == "multitask_aear":
        return M.AEClassifierMultitaskAEAR(
            out_size=num_classes, num_layers_enc=args.num_layers,
            num_layers_class=args.num_layers_dec,
            num_layers_ae=args.num_layers_dec, hidden_size=args.hidden_dim,
            bn_size=args.bn_dim, time_shift=max(1, args.time_shift),
        )
    if args.arch == "vae_cnn":
        ch = max(2, args.hidden_dim // 16)
        return M.VAECNNNopool(
            in_channels=_geom("cnn_in_channels", (1, ch)),
            out_channels=_geom("cnn_out_channels", (ch, 2 * ch)),
            kernel=_geom("cnn_kernel", (3, 3)),
            bn_size=args.bn_dim,
        )
    if args.arch == "vae_cnn_pool":
        ch = max(2, args.hidden_dim // 16)
        return M.VAECNN(
            in_channels=_geom("cnn_in_channels", (1, ch)),
            out_channels=_geom("cnn_out_channels", (ch, 2 * ch)),
            kernel=_geom("cnn_kernel", (3, 3)),
            bn_size=args.bn_dim,
        )
    if args.arch == "rs_vae":
        ch = max(2, args.hidden_dim // 16)
        return M.VaeRsModulation(
            in_channels=_geom("cnn_in_channels", (1, ch)),
            out_channels=_geom("cnn_out_channels", (ch, 2 * ch)),
            kernel=_geom("cnn_kernel", (3, 3)),
            bn_size=args.bn_dim,
        )
    if args.arch == "modnet":
        return M.ModulationNet(
            input_h=feat_dim, in_channels=(1,),
            out_channels=_geom("cnn_out_channels", (4,)),
            kernel=_geom("cnn_kernel", (3,))[0],
            freq_num=args.freq_num, wind_size=args.patch_width / 100.0,
            head_num=args.head_num, num_layers_dec=args.num_layers_dec,
            hidden_size=args.hidden_dim, out_size=num_classes,
        )
    if args.arch == "vae_encoded":
        return M.VAEEncodedClassifier(
            num_layers=args.num_layers, hidden_size=args.hidden_dim,
            out_size=num_classes,
        )
    if args.arch == "curl_encoded":
        return M.CurlEncodedClassifier(
            num_layers=args.num_layers, hidden_size=args.hidden_dim,
            out_size=num_classes,
        )
    if args.arch == "modnet_sigmoid":
        return M.ModulationSigmoidNet(
            in_channels=(1,), out_channels=_geom("cnn_out_channels", (4,)),
            kernel=_geom("cnn_kernel", (3,))[0],
            input_filter_kernel=getattr(args, "input_filter_kernel", None) or 5,
            freq_num=args.freq_num,
            wind_size=args.patch_width / 100.0,
            num_layers_dec=args.num_layers_dec, hidden_size=args.hidden_dim,
            out_size=num_classes,
        )
    raise ValueError(args.arch)


def _extract_patches(feats, labels, lengths, width):
    """Center-frame patches for modnet training (the reference trains
    modnets on (B, 1, D, W) frame-context patches): every valid frame with
    full context becomes one patch labelled by its center frame."""
    import jax.numpy as jnp

    B, T, D = feats.shape
    half = width // 2
    starts = jnp.arange(T - width + 1)
    # (B, P, W, D) -> (B*P, 1, D, W)
    idx = starts[:, None] + jnp.arange(width)[None, :]
    patches = feats[:, idx]  # (B, P, W, D)
    patches = jnp.swapaxes(patches, 2, 3)[:, :, None]  # (B, P, 1, D, W)
    centers = starts + half
    lab = labels[:, centers] if labels is not None else None
    valid = centers[None, :] < jnp.maximum(lengths[:, None] - half, 0)
    P = patches.shape[1]
    patches = patches.reshape(B * P, 1, D, width)
    lab = lab.reshape(B * P) if lab is not None else None
    return patches, lab, valid.reshape(B * P)


def make_loss(args, model, encode_fn=None):
    import jax
    import jax.numpy as jnp

    from speech_recognition_tools_tpu.models.vae import vae_loss
    from speech_recognition_tools_tpu.train import (
        masked_cross_entropy,
        masked_frame_error,
        masked_mse,
    )

    def loss_fn(params, batch, rng, train):
        if args.arch == "feedforward" and args.frame_egs:
            # frame-level shuffled egs: plain CE over (B, D') frames
            import optax

            _, logits = model.apply(params, batch["feats"])
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["labels"]
            )
            fer = 100.0 * jnp.mean(
                (jnp.argmax(logits, -1) != batch["labels"]).astype(ce.dtype)
            )
            return jnp.mean(ce), {"fer": fer}
        feats, lengths = batch["feats"], batch["lengths"]
        if args.arch in ("vae_encoded", "curl_encoded"):
            # classifier on the frozen generative model's latents (reference
            # train_VAE_encoded_nnet_classfier.py / train_CURL_encoded_classifier.py:
            # the vae/curl params never receive gradients)
            lat = encode_fn(feats, lengths)
            logits = model.apply(params, lat, lengths)
            return masked_cross_entropy(logits, batch["labels"], lengths), {
                "fer": masked_frame_error(logits, batch["labels"], lengths)
            }
        rngs = {"sample": rng, "dropout": jax.random.fold_in(rng, 1),
                "gumbel": jax.random.fold_in(rng, 2)}
        t_axis = feats[0].shape[1] if isinstance(feats, (list, tuple)) else feats.shape[1]
        mask = jnp.arange(t_axis)[None, :] < lengths[:, None]
        if args.arch in ("rnn", "linear"):
            logits = model.apply(params, feats, lengths)
            return masked_cross_entropy(logits, batch["labels"], lengths), {
                "fer": masked_frame_error(logits, batch["labels"], lengths)
            }
        if args.arch == "feedforward":
            _, logits = model.apply(params, feats)
            return masked_cross_entropy(logits, batch["labels"], lengths), {
                "fer": masked_frame_error(logits, batch["labels"], lengths)
            }
        if args.arch == "multitask_ae":
            logits, recon = model.apply(params, feats, lengths)
            ce = masked_cross_entropy(logits, batch["labels"], lengths)
            mse = masked_mse(recon, feats, lengths)
            return ce + mse, {"ce": ce, "mse": mse}
        if args.arch == "vae":
            recon, latent = model.apply(params, feats, lengths, rngs=rngs)
            dist = "laplace" if args.loss == "vae_laplace" else "gauss"
            ll, kl = vae_loss(feats, recon, latent, dist, mask)
            return -(ll + kl), {"ll": ll, "kl": kl}
        if args.arch == "vae_classifier":
            logits, recon, latent = model.apply(params, feats, lengths, rngs=rngs)
            ll, kl = vae_loss(feats, recon, latent, "gauss", mask)
            ce = masked_cross_entropy(logits, batch["labels"], lengths)
            return ce - (ll + kl), {"ce": ce}
        if args.arch == "curl":
            class_out, recon, latent = model.apply(params, feats, lengths, rngs=rngs)
            cat = latent[0]  # (B, T, K) posterior over components
            # supervised CURL loss: posterior-weighted per-stream CE +
            # reconstruction (train_CURLclassifier_v2.py:33-71 analogue)
            ces = jnp.stack([
                masked_cross_entropy(class_out[k], batch["labels"], lengths)
                for k in range(class_out.shape[0])
            ])
            w = jnp.mean(jnp.where(mask[..., None], cat, 0), axis=(0, 1))
            ce = jnp.sum(ces * w / jnp.maximum(w.sum(), 1e-8))
            mse = jnp.mean(jnp.stack([
                masked_mse(recon[k], feats, lengths)
                for k in range(recon.shape[0])
            ]))
            return ce + mse, {"ce": ce, "mse": mse}
        if args.arch == "curl_unsup":
            from speech_recognition_tools_tpu.models.curl import (
                curl_loss_unsupervised,
                random_mixture_means,
            )

            mean_p = random_mixture_means(
                jax.random.key(args.seed + 99), args.comp_num, args.bn_dim
            )
            recon, latent = model.apply(params, feats, lengths, rngs=rngs)
            elbo = curl_loss_unsupervised(feats, recon, latent, mean_p, mask)
            return -elbo, {}
        if args.arch == "pm_ae":
            ts = args.time_shift
            if ts:
                recon, _ = model.apply(params, feats[:, :-ts], lengths - ts)
                return masked_mse(recon, feats[:, ts:], lengths - ts), {}
            recon, _ = model.apply(params, feats, lengths)
            return masked_mse(recon, feats, lengths), {}
        if args.arch == "arvae":
            outs, latent = model.apply(params, feats, lengths, rngs=rngs)
            # decoder k predicts the input shifted by k frames
            total_ll, total_kl = 0.0, 0.0
            for k in range(outs.shape[0]):
                tgt = feats if k == 0 else jnp.concatenate(
                    [feats[:, k:], jnp.zeros_like(feats[:, :k])], axis=1
                )
                ll, kl = vae_loss(tgt, outs[k], latent, "gauss", mask)
                total_ll, total_kl = total_ll + ll, total_kl + kl
            n = outs.shape[0]
            return -(total_ll + total_kl) / n, {}
        if args.arch == "apc":
            from speech_recognition_tools_tpu.models.apc import apc_loss

            pred, _ = model.apply(params, feats, lengths)
            ts = args.time_shift or 3
            return apc_loss(pred, feats, lengths, ts), {}
        if args.arch in ("cnn", "cldnn"):
            x = jnp.swapaxes(feats, 1, 2)[:, None]  # (B, 1, D, T)
            if args.arch == "cnn":
                logits = model.apply(params, x)
            else:
                logits = model.apply(params, x, lengths)
            return masked_cross_entropy(logits, batch["labels"], lengths), {
                "fer": masked_frame_error(logits, batch["labels"], lengths)
            }
        if args.arch == "multimod":
            if isinstance(feats, (list, tuple)):
                # true parallel streams from --multi_egs_dirs
                streams = list(feats)
            else:
                # fallback: feature dim split into comp_num contiguous streams
                D = feats.shape[-1] // args.comp_num
                streams = [
                    feats[..., k * D : (k + 1) * D]
                    for k in range(args.comp_num)
                ]
            logits = model.apply(params, streams, lengths)
            return masked_cross_entropy(logits, batch["labels"], lengths), {
                "fer": masked_frame_error(logits, batch["labels"], lengths)
            }
        if args.arch == "multitask_aear":
            ts = max(1, args.time_shift)
            logits, recon, recon_ar = model.apply(params, feats, lengths)
            ce = masked_cross_entropy(logits, batch["labels"], lengths)
            mse = masked_mse(recon, feats, lengths)
            mse_ar = masked_mse(recon_ar, feats[:, ts:], lengths - ts)
            return ce + mse + mse_ar, {"ce": ce}
        if args.arch in ("modnet", "modnet_sigmoid"):
            import optax

            patches, lab, valid = _extract_patches(
                feats, batch["labels"], lengths, args.patch_width
            )
            if args.arch == "modnet":
                logits, _ = model.apply(params, patches, rngs=rngs)
            else:
                logits, _ = model.apply(params, patches)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, lab)
            w = valid.astype(ce.dtype)
            loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)
            wrong = (jnp.argmax(logits, -1) != lab) & valid
            fer = 100.0 * jnp.sum(wrong) / jnp.maximum(jnp.sum(valid), 1)
            return loss, {"fer": fer}
        if args.arch == "vae_cnn_pool":
            # pooled conv VAE trains on fixed frame-context patches (the
            # reference reshapes spliced frames to (B*T, 1, D, W) windows,
            # train_CNN_VAE.py:205-208); its loss is a plain per-element
            # mean (vae_loss :34) — here restricted to valid patches
            patches, _, valid = _extract_patches(
                feats, None, lengths, args.patch_width
            )
            recon, (means, logvars) = model.apply(
                params, patches, rngs=rngs
            )
            w4 = valid.astype(recon.dtype)[:, None, None, None]
            ll = jnp.sum(
                (-0.5 * (patches - recon) ** 2
                 - 0.5 * jnp.log(2 * jnp.pi)) * w4
            ) / jnp.maximum(jnp.sum(w4) * patches[0].size, 1.0)
            w2 = valid.astype(means.dtype)[:, None]
            kl = 0.5 * jnp.sum(
                (1 - means**2 - jnp.exp(logvars) ** 2 + 2 * logvars) * w2
            ) / jnp.maximum(jnp.sum(w2) * means.shape[1], 1.0)
            return -(ll + kl), {}
        if args.arch in ("vae_cnn", "rs_vae"):
            x = jnp.swapaxes(feats, 1, 2)[:, None]  # (B, 1, D, T)
            recon, latent = model.apply(params, x, rngs=rngs)
            m4 = mask[:, None, None, :]
            ll = jnp.sum(
                (-0.5 * (x - recon) ** 2 - 0.5 * jnp.log(2 * jnp.pi))
                * m4
            ) / jnp.maximum(jnp.sum(m4) * x.shape[2], 1.0)
            means, logvars = latent
            kl = 0.5 * jnp.mean(
                1 - means**2 - jnp.exp(logvars) ** 2 + 2 * logvars
            )
            return -(ll + kl), {}
        raise ValueError(args.arch)

    return loss_fn


def main(argv=None):
    args = get_parser().parse_args(argv)
    from speech_recognition_tools_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax

    from speech_recognition_tools_tpu.io import iter_egs_batches, load_egs
    from speech_recognition_tools_tpu.train import (
        TrainConfig,
        Trainer,
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

    from speech_recognition_tools_tpu.io import (
        iter_egs_batches_multi,
        iter_frame_batches,
        load_egs_multi,
    )

    multi_dirs = None
    if args.multi_egs_dirs:
        multi_dirs = [args.egs_dir] + args.multi_egs_dirs.split(",")
        cfgs, utts = load_egs_multi(multi_dirs)
        cfg_egs = cfgs[0]
        args.comp_num = len(multi_dirs)
    else:
        cfg_egs, utts = load_egs(args.egs_dir)
    if args.dev_egs_dir and not multi_dirs:
        dev_utts = load_egs(args.dev_egs_dir)[1]
    else:
        if args.dev_egs_dir and multi_dirs:
            print("WARNING: --dev_egs_dir is ignored with "
                  "--multi_egs_dirs (dev would need parallel stream "
                  "dirs); using a held-out tail of the training "
                  "utterances for dev loss instead")
        # multi-stream dev would need parallel dev dirs; hold out a tail
        dev_utts = utts[-max(1, len(utts) // 10):]
    num_classes = args.num_classes or cfg_egs.num_targets
    model = build_model(args, cfg_egs.feat_dim, num_classes)

    def _strip_keys(it):
        for b in it:
            yield {k: v for k, v in b.items() if k != "keys"}

    if args.frame_egs:
        def train_iter():
            return iter_frame_batches(
                args.egs_dir, args.batch_size, shuffle_seed=args.seed
            )

        def dev_iter():
            return iter_frame_batches(
                args.dev_egs_dir or args.egs_dir, args.batch_size
            )
    elif multi_dirs:
        def train_iter():
            return _strip_keys(
                iter_egs_batches_multi(
                    utts, args.batch_size, shuffle_seed=args.seed
                )
            )

        def dev_iter():
            return _strip_keys(iter_egs_batches_multi(dev_utts, args.batch_size))
    else:
        def train_iter():
            return _strip_keys(
                iter_egs_batches(utts, args.batch_size, shuffle_seed=args.seed)
            )

        def dev_iter():
            return _strip_keys(iter_egs_batches(dev_utts, args.batch_size))

    first = next(train_iter())
    import jax.numpy as jnp

    init_rngs = {
        "params": jax.random.key(args.seed),
        "sample": jax.random.key(args.seed + 1),
        "gumbel": jax.random.key(args.seed + 2),
    }
    if multi_dirs:
        f0 = [jnp.asarray(s) for s in first["feats"]]
        l0 = jnp.asarray(first["lengths"])
    else:
        f0 = jnp.asarray(first["feats"])
        l0 = (
            jnp.asarray(first["lengths"])
            if "lengths" in first
            else jnp.full((f0.shape[0],), f0.shape[0], jnp.int32)
        )

    encode_fn = None
    if args.arch in ("vae_encoded", "curl_encoded"):
        # frozen generative front: restore the base VAE/CURL checkpoint and
        # close over its params with stop_gradient (the reference freezes the
        # torch module by simply not passing its params to the optimizer)
        assert args.base_model, f"--arch {args.arch} requires --base_model"
        from speech_recognition_tools_tpu.cli.dump_outputs import (
            load_frozen_encoder,
        )

        encode_fn = load_frozen_encoder(
            args.base_model, args.arch, init_rngs, f0, l0,
            sample_seed=args.seed + 3,
        )

    if args.arch == "feedforward":
        params = model.init(init_rngs, f0)
    elif args.arch in ("vae_encoded", "curl_encoded"):
        params = model.init(init_rngs, encode_fn(f0, l0), l0)
    elif args.arch == "cnn":
        params = model.init(init_rngs, jnp.swapaxes(f0, 1, 2)[:, None])
    elif args.arch == "cldnn":
        params = model.init(init_rngs, jnp.swapaxes(f0, 1, 2)[:, None], l0)
    elif args.arch == "multimod":
        if multi_dirs:
            streams = f0
        else:
            D = f0.shape[-1] // args.comp_num
            streams = [
                f0[..., k * D : (k + 1) * D] for k in range(args.comp_num)
            ]
        params = model.init(init_rngs, streams, l0)
    elif args.arch in ("vae_cnn", "rs_vae"):
        params = model.init(init_rngs, jnp.swapaxes(f0, 1, 2)[:, None])
    elif args.arch == "vae_cnn_pool":
        p0, _, _ = _extract_patches(f0, None, l0, args.patch_width)
        params = model.init(init_rngs, p0[:2])
    elif args.arch in ("modnet", "modnet_sigmoid"):
        p0, _, _ = _extract_patches(
            f0, jnp.asarray(first.get("labels")), l0, args.patch_width
        )
        if args.arch == "modnet":
            params = model.init(init_rngs, p0[:2])
        else:
            params = model.init(init_rngs, p0[:2])
    else:
        params = model.init(init_rngs, f0, l0)

    if args.expand_from:
        # lifelong growth: restore the previous-task CURL model and add one
        # component (reference train_CURLclassifier* --expand_component,
        # nnet_models.py expand_component :687-720 — functional here)
        assert args.arch == "curl", "--expand_from requires --arch curl"
        from speech_recognition_tools_tpu.cli.dump_outputs import (
            load_model_from_checkpoint,
        )
        from speech_recognition_tools_tpu.models.curl import expand_component
        from speech_recognition_tools_tpu.train import load_checkpoint

        import argparse as _ap

        old_model, old_path, old_cfg = load_model_from_checkpoint(args.expand_from)
        old_args = _ap.Namespace(**{k: old_cfg.get(k) for k in old_cfg})
        old_model = build_model(old_args, old_cfg["feature_dim"],
                                old_cfg.get("num_classes"))
        old_template = old_model.init(init_rngs, f0, l0)
        old_payload, _ = load_checkpoint(old_path, template={"params": old_template})
        model, params = expand_component(
            old_model, old_payload["params"], jax.random.key(args.seed + 7),
            (f0, l0),
        )
        args.comp_num = model.comp_num
        print(f"expanded CURL model to {model.comp_num} components")

    # mesh placement: DP shards batches over 'data', EP shards the CURL
    # expert axis over 'model' (the two compose on one mesh)
    mesh = None
    shard_ep_params = None
    if args.data_parallel or args.expert_parallel > 1:
        from speech_recognition_tools_tpu.parallel import make_mesh

        mesh = make_mesh(model=args.expert_parallel)
    if args.expert_parallel > 1:
        assert args.arch == "curl", "--expert_parallel requires --arch curl"
        assert not args.expand_from, (
            "--expert_parallel with --expand_from is unsupported; grow the "
            "loop-layout model first, then convert with curl_params_to_ep"
        )
        from speech_recognition_tools_tpu.parallel.ep import (
            expert_param_sharding,
        )
        from speech_recognition_tools_tpu.parallel.tp import shard_params

        def shard_ep_params(p):
            return shard_params(
                p, mesh,
                expert_param_sharding(mesh, "model", num_experts=args.comp_num),
            )

        params = shard_ep_params(params)
    if args.data_parallel and mesh is not None:
        from speech_recognition_tools_tpu.parallel import shard_batch

        dpar = mesh.shape["data"]

        def _dp_wrap(make_it):
            def wrapped():
                for b in make_it():
                    lead = jax.tree.leaves(b)[0].shape[0]
                    # ragged tail batches stay on the default placement
                    yield shard_batch(b, mesh) if lead % dpar == 0 else b

            return wrapped

        train_iter = _dp_wrap(train_iter)
        dev_iter = _dp_wrap(dev_iter)

    trainer = Trainer(
        make_loss(args, model, encode_fn),
        TrainConfig(
            optimizer=args.optimizer, learning_rate=args.learning_rate,
            epochs=args.epochs, lrr=args.lrr, lr_tol=args.lr_tol,
            clip_threshold=args.clip_thresh, seed=args.seed,
        ),
    )
    state = trainer.init_state(params)

    # babysitter-style resume: newest checkpoint wins
    newest = latest_checkpoint(args.store_path)
    if newest:
        payload, meta = load_checkpoint(
            newest, template={"params": state.params, "opt_state": state.opt_state}
        )
        state.params = payload["params"]
        state.opt_state = payload["opt_state"]
        if shard_ep_params is not None:
            # checkpoints restore as host arrays; re-place the expert
            # axis on params AND the adam moments (which mirror them)
            state.params = shard_ep_params(state.params)
            state.opt_state = shard_ep_params(state.opt_state)
        state.best_params = state.params
        state.epoch = int(meta.get("extra", {}).get("epoch", 0))
        state.lr = float(meta.get("extra", {}).get("lr", args.learning_rate))
        print(f"resumed from {newest} at epoch {state.epoch}")

    hyper = {k: v for k, v in vars(args).items()}
    hyper.update(
        {
            "feature_dim": cfg_egs.feat_dim,
            "model_class": (
                "CurlMultistreamClassifierEP"
                if args.arch == "curl" and args.expert_parallel > 1
                else ARCHS[args.arch]
            ),
            "num_classes": num_classes,  # resolved, not the CLI default
        }
    )

    def checkpoint_fn(st):
        save_checkpoint(
            args.store_path, f"epoch_{st.epoch}", st.params, hyper,
            opt_state=st.opt_state,
            extra={"epoch": st.epoch, "lr": st.lr, "history": st.history},
        )

    trainer.fit(state, train_iter, dev_iter, checkpoint_fn=checkpoint_fn)
    save_checkpoint(
        args.store_path, "final", state.best_params, hyper,
        extra={"history": state.history},
    )
    print(f"saved final model to {os.path.join(args.store_path, 'final')}")


if __name__ == "__main__":
    main()
