"""End-to-end transformer ASR training CLI.

The native equivalent of the reference's ESPnet asr_train.py stage
(run_fdlp_e1.sh:405-447): egs features + Kaldi text file in, joint
CTC/attention transformer out, with Noam schedule, gradient clipping,
per-epoch checkpoints and final checkpoint averaging
(average_checkpoints, :495-505).
"""

import argparse
import os
from functools import partial


def get_parser():
    p = argparse.ArgumentParser("Train e2e transformer ASR")
    p.add_argument("egs_dir")
    p.add_argument("text", help="Kaldi text file: 'utt transcription'")
    p.add_argument("store_path")
    p.add_argument("--dev_egs_dir")
    p.add_argument("--adim", type=int, default=256)
    p.add_argument("--aheads", type=int, default=4)
    p.add_argument("--elayers", type=int, default=12)
    p.add_argument("--eunits", type=int, default=2048)
    p.add_argument("--dlayers", type=int, default=6)
    p.add_argument("--dunits", type=int, default=2048)
    p.add_argument("--mtlalpha", type=float, default=0.3)
    p.add_argument("--lsm_weight", type=float, default=0.1)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--encoder_type", default="transformer",
                   choices=["transformer", "conformer"],
                   help="encoder block family (conformer = macaron FFNs "
                        "+ MHSA + depthwise-conv module)")
    p.add_argument("--attn_chunk", type=int, default=0,
                   help="streaming-compatible chunked encoder attention: "
                        "chunk size in post-subsampling frames (0 = full "
                        "attention). Models trained with this decode "
                        "online via recog_e2e --streaming")
    p.add_argument("--attn_left_chunks", type=int, default=-1,
                   help="left-context chunks each chunk may attend "
                        "(-1 = unbounded; streaming decode needs >= 0)")
    p.add_argument("--conv_kernel", type=int, default=15,
                   help="(conformer) depthwise conv width")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="mixed-precision training: bfloat16 runs the "
                   "matmuls/attention/convs on the MXU in bf16 while "
                   "parameters and optimizer state stay f32 master "
                   "weights (checkpoints are layout-identical); the "
                   "logit heads and the loss always compute in f32")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--warmup_steps", type=int, default=25000)
    p.add_argument("--transformer_lr", type=float, default=10.0)
    p.add_argument("--grad_clip", type=float, default=5.0)
    p.add_argument("--average_last", type=int, default=10)
    p.add_argument("--specaug", action="store_true",
                   help="apply SpecAugment (conf/specaug.yaml defaults)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--min_io_ratio", type=float, default=1.0,
                   help="CTC-feasibility pruning (filtering_samples.py): "
                        "drop samples with subsampled-enc-len - "
                        "tokens*ratio < delta")
    p.add_argument("--min_io_delta", type=int, default=0)
    p.add_argument("--bucket_frames", type=int, default=32,
                   help="round padded batch frames up to this multiple; "
                        "raise (e.g. 128) on real corpora to cut the "
                        "number of distinct shapes XLA compiles")
    p.add_argument("--frame_rate", type=float, default=100.0,
                   help="feature frame rate in Hz (FdlpConfig.frate) — "
                        "only used to convert frames to audio seconds "
                        "in the per-epoch throughput log")
    p.add_argument("--vocab", help="existing vocab.json (e.g. built at "
                                   "data-prep time and shared with the "
                                   "RNNLM); default: build from text")
    p.add_argument("--init_from",
                   help="warm-start fine-tuning from an existing model "
                        "dir or checkpoint (e.g. an srt-import-torch "
                        "--espnet_units import): params + architecture "
                        "geometry (adim/aheads/elayers/eunits/dlayers/"
                        "dunits/encoder_type/conv_kernel) and vocab.json "
                        "come from the source — the geometry flags above "
                        "are ignored — while training knobs (--attn_chunk/"
                        "--attn_left_chunks/--dropout/--mtlalpha/"
                        "--lsm_weight) come from this command line; the "
                        "optimizer starts fresh. This is the exact-"
                        "streaming recipe: import an offline ESPnet "
                        "model, then fine-tune under the chunk mask it "
                        "will be served with. Ignored once store_path "
                        "holds epoch checkpoints (resume wins)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each batch over the mesh 'data' axis "
                        "(XLA inserts the gradient all-reduce over ICI; "
                        "the queue.pl-fan-out replacement at train level)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="Megatron-style TP degree: q/k/v heads, attention "
                        "out, FFN column/row and ctc/vocab heads shard "
                        "over a 'model' axis of this size "
                        "(parallel/tp.py::transformer_tp_spec)")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="GPipe stages for the ENCODER blocks "
                        "(parallel/pp.py): stacked block params shard "
                        "P('pipe'), microbatches hop the ring, exact "
                        "backward through the scan. elayers must divide "
                        "by it; dropout is supported (per-microbatch rng "
                        "keys ride the pipeline state); exclusive with "
                        "--tensor_parallel")
    p.add_argument("--pp_microbatches", type=int, default=2,
                   help="(pipeline) microbatches per step; batch_size "
                        "must divide by it")
    return p


def ctc_feasible(num_frames, num_tokens, min_io_ratio=1.0, min_io_delta=0):
    """CTC-feasibility filter (reference local/filtering_samples.py,
    run_fdlp_e1.sh:336-343): prune samples whose subsampled encoder
    length can't cover the label sequence (loss_ctc=inf otherwise).
    Encoder time reduction is the VALID conv2d 4x subsampling
    (Conv2dSubsampling: out_len = ((l - 1) // 2 - 1) // 2)."""
    enc_len = ((num_frames - 1) // 2 - 1) // 2
    return enc_len - num_tokens * min_io_ratio >= min_io_delta


def token_batches(egs_dir, texts, vocab, batch_size, min_io_ratio=1.0,
                  min_io_delta=0, bucket_frames=32):
    import numpy as np

    from speech_recognition_tools_tpu.io import iter_egs_batches
    from speech_recognition_tools_tpu.io.text import encode_text

    for b in iter_egs_batches(egs_dir, batch_size, drop_labels=True,
                              bucket_multiple=bucket_frames):
        keys, idx = [], []
        for i, k in enumerate(b["keys"]):
            if k not in texts:
                continue
            if not ctc_feasible(
                int(b["lengths"][i]), len(encode_text(texts[k], vocab)) + 1,
                min_io_ratio, min_io_delta,
            ):
                continue
            keys.append(k)
            idx.append(i)
        if not keys:
            continue
        toks = [encode_text(texts[k], vocab) for k in keys]
        # round the token axis up to a multiple of 16: otherwise nearly
        # every batch carries a unique (frames, tokens) shape pair and
        # XLA recompiles the train step per batch (padding is masked by
        # token_lengths, so this is shape hygiene, not a numeric change)
        U = max(max(len(t) for t in toks) + 1, 4)
        U = -(-U // 16) * 16
        tokens = np.zeros((len(keys), U), np.int32)
        tlen = np.zeros(len(keys), np.int32)
        for i, t in enumerate(toks):
            tokens[i, : len(t)] = t
            tlen[i] = len(t)
        yield dict(
            feats=b["feats"][idx],
            lengths=b["lengths"][idx],
            tokens=tokens,
            token_lengths=tlen,
        )


def shard_e2e_state(params, opt_state, mesh, cfg):
    """Place the transformer params + mirrored optimizer moments on
    `mesh` with Megatron-style TP shardings (everything replicated when
    the mesh's 'model' axis is 1). Returns (params, opt_state,
    param_shardings) — the shardings pytree anchors the gradients inside
    the jitted step. Shared by the CLI and the driver's multichip dryrun
    (stage 2) so the dryrun validates exactly what users run."""
    from speech_recognition_tools_tpu.parallel.tp import (
        param_shardings,
        shard_like_params,
        shard_params,
        transformer_tp_spec,
    )

    spec = transformer_tp_spec(mesh, cfg.adim, (cfg.eunits, cfg.dunits))
    params = shard_params(params, mesh, spec)
    opt_state = shard_like_params(opt_state, mesh, spec)
    return params, opt_state, param_shardings(params, mesh, spec)


def make_train_step(model, cfg, tx, use_specaug=False, param_sh=None):
    """The jitted CTC/attention train step. With `param_sh` (a
    NamedSharding pytree from shard_e2e_state) the TP gradients are
    constrained back onto their annotated shardings so the optimizer
    update stays sharded; without it the step is the plain single-device
    program."""
    import jax
    import optax

    from speech_recognition_tools_tpu.dsp.specaug import (
        SpecAugConfig,
        spec_augment,
    )
    from speech_recognition_tools_tpu.models.transformer_asr import asr_loss

    # params/opt_state are donated: XLA updates them in place, so the
    # step holds one live copy of the training state instead of two
    # (callers rebind both from the return value every step)
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        if use_specaug:
            rng, sa = jax.random.split(rng)
            batch_in = dict(
                batch,
                feats=spec_augment(
                    sa, batch["feats"], batch["lengths"], SpecAugConfig()
                ),
            )
        else:
            batch_in = batch
        (loss, aux), grads = jax.value_and_grad(
            lambda p: asr_loss(model, p, batch_in, rng, cfg), has_aux=True
        )(params)
        if param_sh is not None:
            grads = jax.lax.with_sharding_constraint(grads, param_sh)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    return step


def resolve_init_checkpoint(path):
    """`--init_from` accepts a checkpoint dir (holds state.msgpack) or a
    model dir (picks final_avg / final / newest epoch checkpoint).
    Returns (checkpoint_path, model_dir)."""
    from speech_recognition_tools_tpu.train import latest_checkpoint

    if os.path.exists(os.path.join(path, "state.msgpack")):
        return path, os.path.dirname(path.rstrip("/"))
    for tag in ("final_avg", "final"):
        p = os.path.join(path, tag)
        if os.path.exists(os.path.join(p, "state.msgpack")):
            return p, path
    newest = latest_checkpoint(path)
    if newest:
        return newest, path
    raise FileNotFoundError(f"--init_from {path}: no checkpoint found")


def main(argv=None):
    args = get_parser().parse_args(argv)
    from speech_recognition_tools_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from speech_recognition_tools_tpu.io.text import (
        build_char_vocab,
        load_vocab,
        read_text_file,
        save_vocab,
    )
    from speech_recognition_tools_tpu.models.transformer_asr import (
        TransformerASR,
        TransformerASRConfig,
        asr_loss,
        average_checkpoints,
        noam_schedule,
    )
    from speech_recognition_tools_tpu.train import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

    texts = read_text_file(args.text)
    init_ckpt = None
    icfg = {}
    if args.init_from:
        init_ckpt, init_dir = resolve_init_checkpoint(args.init_from)
        with open(os.path.join(init_ckpt, "config.json")) as f:
            import json

            icfg = json.load(f)
        # token ids must match the source embedding — inherit its vocab
        # unless the caller explicitly points at one
        if not args.vocab:
            src_vocab = os.path.join(init_dir, "vocab.json")
            if os.path.exists(src_vocab):
                args.vocab = src_vocab
            else:
                # never silently build a vocab from the new text: a
                # same-SIZE but reordered char set would pass the
                # vocab_size assert below yet pair the imported
                # embedding rows with permuted token ids
                raise SystemExit(
                    f"--init_from: {init_dir} has no vocab.json; pass "
                    "--vocab with the id assignment the source "
                    "embedding was trained on"
                )
    if args.vocab:
        vocab = load_vocab(args.vocab)
    else:
        vocab = build_char_vocab(texts.values())
    os.makedirs(args.store_path, exist_ok=True)
    save_vocab(vocab, os.path.join(args.store_path, "vocab.json"))

    if init_ckpt:
        assert len(vocab) == icfg["vocab_size"], (
            f"--init_from vocab_size {icfg['vocab_size']} != "
            f"vocab size {len(vocab)}"
        )
    cfg = TransformerASRConfig(
        vocab_size=len(vocab),
        adim=icfg.get("adim", args.adim),
        aheads=icfg.get("aheads", args.aheads),
        elayers=icfg.get("elayers", args.elayers),
        eunits=icfg.get("eunits", args.eunits),
        dlayers=icfg.get("dlayers", args.dlayers),
        dunits=icfg.get("dunits", args.dunits),
        dropout=args.dropout, mtlalpha=args.mtlalpha,
        lsm_weight=args.lsm_weight,
        encoder_type=icfg.get("encoder_type", args.encoder_type),
        conv_kernel=icfg.get("conv_kernel", args.conv_kernel),
        attn_chunk=args.attn_chunk,
        attn_left_chunks=args.attn_left_chunks,
        compute_dtype=args.compute_dtype,
    )
    model = TransformerASR(cfg)

    first = next(token_batches(args.egs_dir, texts, vocab, args.batch_size,
                               args.min_io_ratio, args.min_io_delta,
                               args.bucket_frames))
    params = model.init(
        {"params": jax.random.key(args.seed),
         "dropout": jax.random.key(args.seed + 1)},
        jnp.asarray(first["feats"]), jnp.asarray(first["lengths"]),
        jnp.asarray(first["tokens"]),
    )
    tx = optax.chain(
        optax.clip_by_global_norm(args.grad_clip),
        optax.adam(noam_schedule(cfg.adim, args.warmup_steps, args.transformer_lr),
                   b2=0.98),
    )
    opt_state = tx.init(params)

    # mesh placement: DP shards batches over 'data', TP shards the
    # transformer kernels over 'model' (the two compose on one mesh);
    # PP shards stacked encoder blocks over 'pipe'. The state itself is
    # placed after the resume block so restored checkpoints land on the
    # same shardings
    mesh = None
    param_sh = None
    pp = args.pipeline_parallel > 1
    if pp:
        assert args.tensor_parallel == 1, (
            "--pipeline_parallel and --tensor_parallel are exclusive"
        )
        import numpy as _np
        from jax.sharding import Mesh

        devices = jax.devices()
        pipe = args.pipeline_parallel
        assert len(devices) % pipe == 0, (len(devices), pipe)
        dp = len(devices) // pipe if args.data_parallel else 1
        mesh = Mesh(
            _np.asarray(devices[: dp * pipe]).reshape(dp, pipe),
            ("data", "pipe"),
        )
    elif args.data_parallel or args.tensor_parallel > 1:
        from speech_recognition_tools_tpu.parallel import make_mesh

        mesh = make_mesh(model=max(1, args.tensor_parallel))
        if args.tensor_parallel > 1:
            assert cfg.aheads % args.tensor_parallel == 0, (
                "aheads must divide by --tensor_parallel "
                f"({cfg.aheads} % {args.tensor_parallel})"
            )

    # babysitter-style resume: newest epoch checkpoint wins (params,
    # optimizer state incl. the Noam step count, epoch counter, and the
    # recent-params window for final averaging)
    start_epoch = 0
    recent = []
    if os.path.exists(os.path.join(args.store_path, "final_avg")):
        print("final_avg already exists — training complete, nothing to do")
        return
    newest = latest_checkpoint(args.store_path)
    if newest and os.path.basename(newest).startswith("epoch_"):
        try:
            payload, meta = load_checkpoint(
                newest, template={"params": params, "opt_state": opt_state}
            )
            opt_state = payload["opt_state"]
        except KeyError:  # pre-opt_state checkpoint format
            payload, meta = load_checkpoint(newest, template={"params": params})
        params = payload["params"]
        start_epoch = int(meta.get("extra", {}).get("epoch", 0))
        for e in range(max(1, start_epoch - args.average_last + 1),
                       start_epoch + 1):
            p = os.path.join(args.store_path, f"epoch_{e}")
            if os.path.exists(os.path.join(p, "state.msgpack")):
                pay, _ = load_checkpoint(p, template={"params": params})
                recent.append(pay["params"])
        print(f"resumed from {newest} at epoch {start_epoch}")
    elif init_ckpt:
        payload, _ = load_checkpoint(init_ckpt, template={"params": params})
        params = payload["params"]
        print(f"initialized from {init_ckpt} (architecture geometry from "
              "the checkpoint; optimizer state fresh)")

    if pp:
        # split the loop-layout checkpoint into (rest, stacked-blocks);
        # checkpoints stay loop-layout (merged back at save, optimizer
        # moments included) so resume / recog work unchanged and the
        # Noam step count survives a PP resume.
        from speech_recognition_tools_tpu.models.transformer_asr import (
            asr_loss_pipelined,
            merge_pipeline_params,
            pp_opt_state_from_loop,
            split_pipeline_params,
        )
        from speech_recognition_tools_tpu.parallel.pp import (
            pipeline_param_sharding,
        )
        from speech_recognition_tools_tpu.parallel.tp import shard_params

        def place_stacked(t):
            return shard_params(
                t, mesh, pipeline_param_sharding(mesh, "pipe")
            )

        rest, stacked = split_pipeline_params(
            params, args.pipeline_parallel
        )
        params = {"rest": rest, "stacked": place_stacked(stacked)}
        # re-split the (loop-layout) optimizer state — freshly inited or
        # restored from the checkpoint — and place its stacked moments
        # like the stacked params
        _is_split = (lambda n: isinstance(n, dict)
                     and set(n.keys()) == {"rest", "stacked"})
        opt_state = jax.tree.map(
            lambda n: {"rest": n["rest"],
                       "stacked": place_stacked(n["stacked"])}
            if _is_split(n) else n,
            pp_opt_state_from_loop(opt_state, args.pipeline_parallel),
            is_leaf=_is_split,
        )
        n_micro = args.pp_microbatches
        use_dropout = args.dropout > 0
        # DP x PP: microbatch examples shard over 'data' inside the
        # pipeline instead of replicating onto every ring
        pp_data_axis = "data" if mesh.shape["data"] > 1 else None

        from speech_recognition_tools_tpu.dsp.specaug import (
            SpecAugConfig,
            spec_augment,
        )

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, batch, rng):
            if args.specaug:
                rng, sa = jax.random.split(rng)
                batch = dict(
                    batch,
                    feats=spec_augment(
                        sa, batch["feats"], batch["lengths"], SpecAugConfig()
                    ),
                )

            def loss_fn(sp):
                return asr_loss_pipelined(
                    model, sp["rest"], sp["stacked"], batch, cfg, mesh,
                    n_micro=n_micro, rng=rng if use_dropout else None,
                    data_axis=pp_data_axis,
                )

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            import optax as _optax

            return (_optax.apply_updates(params, updates), new_opt,
                    loss, aux)

        def to_loop_layout(p):
            return merge_pipeline_params(p["rest"], p["stacked"])
    else:
        if mesh is not None:
            params, opt_state, param_sh = shard_e2e_state(
                params, opt_state, mesh, cfg
            )

        step = make_train_step(
            model, cfg, tx, use_specaug=args.specaug, param_sh=param_sh
        )

        def to_loop_layout(p):
            return p

    if mesh is not None:
        from speech_recognition_tools_tpu.parallel import shard_batch

        dpar = mesh.shape["data"]

        def place_batch(b):
            lead = b["feats"].shape[0]
            # ragged tail batches stay on the default placement
            return shard_batch(b, mesh) if lead % dpar == 0 else b
    else:
        def place_batch(b):
            return b

    if pp:
        # the pipeline reshapes the batch into n_micro microbatches (and
        # shards microbatch examples over 'data' under DP x PP), so the
        # leading dim must divide by n_micro * dp; token_batches yields
        # ragged tails (batching remainder + text/CTC-feasibility
        # filtering) — trim them to the largest multiple, skip if empty
        pp_divisor = n_micro * (mesh.shape["data"] if pp_data_axis else 1)
        _trim_noted = [False]

        def pp_trim(b):
            lead = b["feats"].shape[0]
            keep = (lead // pp_divisor) * pp_divisor
            if keep == lead:
                return b
            if not _trim_noted[0]:
                print(f"NOTE: trimming ragged batches to multiples of "
                      f"{pp_divisor} (pp_microbatches x data shards); "
                      f"e.g. {lead} -> {keep}")
                _trim_noted[0] = True
            if keep == 0:
                return None
            return {k: v[:keep] for k, v in b.items()}
    else:
        def pp_trim(b):
            return b

    hyper = dict(vars(args))
    # record the EFFECTIVE architecture (under --init_from the geometry
    # comes from the source checkpoint, not the CLI flags)
    hyper.update(model_class="TransformerASR", vocab_size=len(vocab),
                 feature_dim=int(first["feats"].shape[-1]),
                 adim=cfg.adim, aheads=cfg.aheads, elayers=cfg.elayers,
                 eunits=cfg.eunits, dlayers=cfg.dlayers, dunits=cfg.dunits,
                 encoder_type=cfg.encoder_type, conv_kernel=cfg.conv_kernel)
    from speech_recognition_tools_tpu.utils.profiling import ThroughputMeter

    rng = jax.random.key(args.seed + 2 + start_epoch)
    import time as _time
    for epoch in range(start_epoch, args.epochs):
        losses = []
        meter = ThroughputMeter()
        compile_s = 0.0
        for batch in token_batches(args.egs_dir, texts, vocab, args.batch_size,
                               args.min_io_ratio, args.min_io_delta,
                               args.bucket_frames):
            batch = pp_trim({k: jnp.asarray(v) for k, v in batch.items()})
            if batch is None:
                continue
            batch = place_batch(batch)
            rng, sub = jax.random.split(rng)
            t0 = _time.time()
            params, opt_state, loss, aux = step(params, opt_state, batch, sub)
            losses.append(float(loss))
            dt = _time.time() - t0
            # corpus-scale observability: a slow step is (almost always)
            # a fresh (B, T, U) shape compile — surface it immediately
            # instead of staying silent until the epoch summary
            if dt > 10.0:
                shp = (batch["feats"].shape[0], batch["feats"].shape[1],
                       batch["tokens"].shape[1])
                compile_s += dt
                print(f"  step {len(losses)}: {dt:.1f}s "
                      f"(new shape {shp} compiled)", flush=True)
            elif len(losses) % 50 == 0:
                print(f"  step {len(losses)}: loss {float(loss):.4f} "
                      f"({dt * 1000:.0f} ms/step)", flush=True)
            # frames -> audio seconds at --frame_rate (SURVEY §5
            # throughput counters; float(loss) above already synchronised)
            meter.update(
                items=int(batch["feats"].shape[0]),
                audio_seconds=float(jnp.sum(batch["lengths"]))
                / args.frame_rate,
            )
        print(f"epoch {epoch + 1}: loss {sum(losses)/max(len(losses),1):.4f} "
              f"({meter.summary()}"
              + (f"; {compile_s:.0f}s in shape compiles" if compile_s else "")
              + ")")
        # checkpoints are ALWAYS loop-layout (recog/resume-compatible);
        # PP merges its stacked blocks AND optimizer moments back
        save_p = to_loop_layout(params)
        if pp:
            from speech_recognition_tools_tpu.models.transformer_asr import (
                pp_opt_state_to_loop,
            )

            save_opt = pp_opt_state_to_loop(opt_state)
        else:
            save_opt = opt_state
        save_checkpoint(args.store_path, f"epoch_{epoch + 1}", save_p, hyper,
                        opt_state=save_opt,
                        extra={"epoch": epoch + 1})
        # host copy: the live param buffers are donated to the next
        # step, so the averaging window must own its own memory
        recent.append(jax.device_get(save_p))
        if len(recent) > args.average_last:
            recent.pop(0)
    avg = average_checkpoints(recent)
    save_checkpoint(args.store_path, "final_avg", avg, hyper,
                    extra={"averaged": len(recent)})
    print(f"saved averaged model ({len(recent)} ckpts) -> "
          f"{os.path.join(args.store_path, 'final_avg')}")


if __name__ == "__main__":
    main()
