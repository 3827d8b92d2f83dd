"""End-to-end recognition CLI (asr_recog.py equivalent).

Beam search with CTC bonus and optional RNNLM fusion; `--api cl` decodes
with multiple models weighted by PM (VAE) scores like the reference's
patched asr_recog (run_cl_2stream.sh:250-254). Writes hypotheses as a
Kaldi-style text file and reports WER when a reference text is given.
"""

import argparse
import os


def get_parser():
    p = argparse.ArgumentParser("e2e ASR recognition")
    p.add_argument("model_dir", help="train_e2e output (or comma list for cl)")
    p.add_argument("egs_dir")
    p.add_argument("out_text")
    p.add_argument("--api", default="v1", choices=["v1", "cl"])
    p.add_argument("--pm_scores", help="comma floats: per-model PM scores (cl)")
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--ctc_weight", type=float, default=0.3)
    p.add_argument("--penalty", type=float, default=0.0)
    p.add_argument("--max_len", type=int, default=200)
    p.add_argument("--ref_text", help="reference text for WER")
    p.add_argument("--ckpt", default="final_avg")
    p.add_argument("--jit_decode", action="store_true",
                   help="use the fully-jitted lax.scan beam search (one "
                        "compiled program per shape bucket; for serving)")
    p.add_argument("--batch_size", type=int, default=1,
                   help="(--jit_decode) utterances per batched search "
                        "program")
    p.add_argument("--bucket_frames", type=int, default=32,
                   help="round padded batch frames up to this multiple; "
                        "raise (e.g. 256) on real corpora so the jitted "
                        "search compiles a handful of shapes, not one "
                        "per batch")
    p.add_argument("--lm_dir", help="train_lm checkpoint dir for RNNLM "
                                    "shallow fusion (decode.yaml lm-weight)")
    p.add_argument("--lm_weight", type=float, default=1.0)
    p.add_argument("--word_lm_dir",
                   help="WORD RNNLM dir (e.g. an srt-import-torch ESPnet "
                        "LM import) fused via lexical-prefix-tree "
                        "look-ahead (decode/wordlm.py) — the reference's "
                        "use_wordlm=true decode "
                        "(e2e/wsj/run_fdlp_e1.sh:516-517). Host beam "
                        "paths only; exclusive with --lm_dir")
    p.add_argument("--word_lm_dict",
                   help="(--word_lm_dir) ESPnet-style word list "
                        "('word id' lines, wordlist_65000.txt); default: "
                        "vocab.json inside --word_lm_dir")
    p.add_argument("--oov_penalty", type=float, default=1e-4,
                   help="(--word_lm_dir) per-char penalty factor for "
                        "out-of-lexicon words")
    p.add_argument("--attn_chunk", type=int, default=None,
                   help="override the checkpoint's encoder attention "
                        "chunking at decode time — run a full-context "
                        "model with chunked masks (the io/torch_import "
                        "--attn_chunk approximation, measurable on any "
                        "checkpoint); default: from the checkpoint")
    p.add_argument("--attn_left_chunks", type=int, default=None,
                   help="override left-context chunks with --attn_chunk")
    p.add_argument("--streaming", action="store_true",
                   help="online decode: feed features chunk-by-chunk "
                        "through the incremental encoder "
                        "(infer/streaming_asr.py). Needs a model trained "
                        "with --attn_chunk > 0 and --attn_left_chunks >= 0")
    p.add_argument("--streaming_feed", type=int, default=40,
                   help="raw feature frames per simulated arrival push")
    p.add_argument("--streaming_final", default="beam",
                   choices=["beam", "greedy"],
                   help="final pass: joint CTC/attention beam search over "
                        "the streamed encoder output (exactly the offline "
                        "chunked result), or the incremental greedy-CTC "
                        "hypothesis as-is")
    p.add_argument("--streaming_rescore_every", type=int, default=0,
                   help="N > 0: every N arrival pushes, print an "
                        "attention-rescored partial (beam over the memory "
                        "streamed so far) alongside the greedy partial")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="inference compute dtype: bfloat16 halves "
                   "encoder/decoder HBM traffic and uses the MXU's "
                   "native precision; a deployment choice independent "
                   "of the training dtype (weights stay f32 masters; "
                   "logit heads and log-softmax always f32)")
    p.add_argument("--ring_attention", type=int, default=0, metavar="S",
                   help="encode via ring attention over an S-device "
                        "'time' mesh (parallel/ring.py) — the "
                        "long-utterance path: per-device attention "
                        "memory O(T*T/S). Host beam decode only "
                        "(not --jit_decode / --api cl)")
    return p


def _load_lm(lm_dir, ckpt="final"):
    import jax
    import jax.numpy as jnp

    from speech_recognition_tools_tpu.models.rnnlm import RNNLM
    from speech_recognition_tools_tpu.train import load_checkpoint

    path = os.path.join(lm_dir, ckpt)
    _, cfg_d = load_checkpoint(path)
    model = RNNLM(
        vocab_size=cfg_d["vocab_size"], embed_dim=cfg_d["embed_dim"],
        hidden=cfg_d["hidden"], layers=cfg_d["layers"],
        cell=cfg_d.get("cell", "gru"),
    )
    template = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 4), jnp.int32),
        jnp.asarray([4]),
    )
    payload, _ = load_checkpoint(path, template={"params": template})
    return model, payload["params"]


def _load(model_dir, ckpt, compute_dtype="float32",
          attn_chunk=None, attn_left_chunks=None):
    import jax
    import jax.numpy as jnp

    from speech_recognition_tools_tpu.io.text import load_vocab
    from speech_recognition_tools_tpu.models.transformer_asr import (
        TransformerASR,
        TransformerASRConfig,
    )
    from speech_recognition_tools_tpu.train import load_checkpoint

    path = os.path.join(model_dir, ckpt)
    _, cfg_d = load_checkpoint(path)
    vocab = load_vocab(os.path.join(model_dir, "vocab.json"))
    cfg = TransformerASRConfig(
        vocab_size=cfg_d["vocab_size"], adim=cfg_d["adim"],
        aheads=cfg_d["aheads"], elayers=cfg_d["elayers"],
        eunits=cfg_d["eunits"], dlayers=cfg_d["dlayers"],
        dunits=cfg_d["dunits"], dropout=0.0,
        mtlalpha=cfg_d["mtlalpha"], lsm_weight=cfg_d["lsm_weight"],
        encoder_type=cfg_d.get("encoder_type", "transformer"),
        conv_kernel=cfg_d.get("conv_kernel", 15),
        attn_chunk=(cfg_d.get("attn_chunk", 0)
                    if attn_chunk is None else attn_chunk),
        attn_left_chunks=(cfg_d.get("attn_left_chunks", -1)
                          if attn_left_chunks is None
                          else attn_left_chunks),
        compute_dtype=compute_dtype,
    )
    model = TransformerASR(cfg)
    feats = jnp.zeros((1, 16, 8), jnp.float32)
    template = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, jnp.asarray([16]), jnp.zeros((1, 4), jnp.int32),
    )
    payload, _ = load_checkpoint(path, template={"params": template})
    return model, payload["params"], cfg, vocab


def main(argv=None):
    args = get_parser().parse_args(argv)
    from speech_recognition_tools_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from speech_recognition_tools_tpu.io import iter_egs_batches
    from speech_recognition_tools_tpu.io.text import decode_tokens, read_text_file
    from speech_recognition_tools_tpu.models.transformer_asr import (
        beam_search,
        cl_decode,
    )

    dirs = args.model_dir.split(",")
    loaded = [_load(d, args.ckpt, args.compute_dtype,
                    args.attn_chunk, args.attn_left_chunks)
              for d in dirs]
    model, params, cfg, vocab = loaded[0]

    lm_apply_host, lm_apply_jit = None, None
    if args.lm_dir:
        from speech_recognition_tools_tpu.models.rnnlm import (
            make_fusion_scorer,
            make_jit_fusion_scorer,
        )

        lm_model, lm_params = _load_lm(args.lm_dir)
        lm_apply_host = make_fusion_scorer(lm_model, lm_params)
        lm_apply_jit = make_jit_fusion_scorer(lm_model, lm_params)
    if args.word_lm_dir:
        assert not args.lm_dir, (
            "--word_lm_dir and --lm_dir are exclusive (the look-ahead "
            "word LM already yields per-char fusion scores)"
        )
        assert args.api != "cl" and not args.jit_decode, (
            "--word_lm_dir fusion is a host decode path (no cl/jit)"
        )
        from speech_recognition_tools_tpu.decode.wordlm import (
            LookaheadWordLM,
            word_vocab_from_dict,
        )

        wlm_model, wlm_params = _load_lm(args.word_lm_dir)
        if args.word_lm_dict:
            wvocab = word_vocab_from_dict(
                args.word_lm_dict, n_vocab=wlm_model.vocab_size
            )
        else:
            from speech_recognition_tools_tpu.io.text import load_vocab

            wvocab = load_vocab(os.path.join(args.word_lm_dir, "vocab.json"))
            if max(wvocab.values()) >= wlm_model.vocab_size:
                raise ValueError(
                    "word vocab ids exceed the word LM's "
                    f"{wlm_model.vocab_size} embedding rows"
                )
        lm_apply_host = LookaheadWordLM(
            wlm_model, wlm_params, wvocab, vocab,
            oov_penalty=args.oov_penalty,
        )

    recognizer = None
    if args.streaming:
        assert args.api != "cl" and not args.jit_decode and (
            args.ring_attention <= 1
        ), "--streaming is a host decode path (no cl/jit/ring)"
        from speech_recognition_tools_tpu.infer.streaming_asr import (
            StreamingRecognizer,
        )

        recognizer = StreamingRecognizer(model, params, vocab=vocab)

    encode_fn = None
    if args.ring_attention > 1:
        assert args.api != "cl" and not args.jit_decode, (
            "--ring_attention works with the host beam decode path only"
        )
        import jax
        import numpy as _np
        from jax.sharding import Mesh

        from speech_recognition_tools_tpu.models.transformer_asr import (
            encode_ring,
        )

        devices = jax.devices()
        assert len(devices) >= args.ring_attention, (
            f"{args.ring_attention} ring devices requested, "
            f"{len(devices)} available"
        )
        ring_mesh = Mesh(
            _np.asarray(devices[: args.ring_attention]), ("time",)
        )

        def encode_fn(feats, lengths):
            return encode_ring(model, params, feats, lengths, ring_mesh)

    hyps = {}
    batch = args.batch_size if args.jit_decode else 1
    if args.api == "cl" and len(dirs) > 1 and batch > 1:
        # the cl fusion path decodes one utterance at a time; a larger
        # batch would silently drop all but the first key of each batch.
        print("WARNING: --api cl decodes utterance-by-utterance; "
              "forcing batch_size 1")
        batch = 1
    for b in iter_egs_batches(args.egs_dir, batch, drop_labels=True,
                              bucket_multiple=args.bucket_frames):
        feats = jnp.asarray(b["feats"])
        lengths = jnp.asarray(b["lengths"])
        key = b["keys"][0]
        if recognizer is not None:
            # online decode: emulate frame arrival; the streamed encoder
            # output is exactly the offline chunked encode (tested), so
            # the optional final beam pass is the offline joint decode
            recognizer.reset()
            n = int(lengths[0])
            x = np.asarray(feats)[0, :n]
            for pi, s in enumerate(range(0, n, args.streaming_feed)):
                recognizer.push(x[s : s + args.streaming_feed])
                if (args.streaming_rescore_every
                        and (pi + 1) % args.streaming_rescore_every == 0):
                    part = recognizer.rescored_partial(
                        model, params, cfg, beam_size=args.beam_size,
                        max_len=args.max_len, ctc_weight=args.ctc_weight,
                        penalty=args.penalty,
                    )
                    from speech_recognition_tools_tpu.io.text import (
                        decode_tokens as _dt,
                    )

                    print(f"  [rescored partial @push {pi + 1}] "
                          f"{_dt(part, vocab)}")
            greedy = recognizer.finish()
            if args.streaming_final == "greedy":
                seq = greedy
            else:
                mem = jnp.asarray(recognizer.memory[None])
                elen = jnp.asarray([recognizer.enc_len])
                ctc = jnp.asarray(recognizer.ctc_logits[None])
                seq = beam_search(
                    model, params, feats, lengths, cfg,
                    beam_size=args.beam_size, max_len=args.max_len,
                    ctc_weight=args.ctc_weight, penalty=args.penalty,
                    lm_apply=lm_apply_host, lm_weight=args.lm_weight,
                    encode_fn=lambda f, l: (mem, elen, ctc),
                )
        elif args.api == "cl" and len(loaded) > 1:
            pm = [float(x) for x in (args.pm_scores or "").split(",")] or [
                1.0
            ] * len(loaded)
            seq = cl_decode(
                [(m, p) for m, p, _, _ in loaded], pm, feats, lengths, cfg,
                beam_size=args.beam_size, max_len=args.max_len,
            )
        elif args.jit_decode:
            from speech_recognition_tools_tpu.decode.beam_jit import (
                beam_search_jit_batched,
                tokens_to_list,
            )

            toks, scores = beam_search_jit_batched(
                model, params, feats, lengths,
                beam_size=args.beam_size, max_len=args.max_len,
                ctc_weight=args.ctc_weight, penalty=args.penalty,
                lm_apply=lm_apply_jit, lm_weight=args.lm_weight,
            )
            for i, key_i in enumerate(b["keys"]):
                seq_i = tokens_to_list(toks[i], scores[i], cfg.eos_id)
                hyps[key_i] = decode_tokens(seq_i, vocab)
                print(f"{key_i}: {hyps[key_i]}")
            continue
        else:
            seq = beam_search(
                model, params, feats, lengths, cfg,
                beam_size=args.beam_size, max_len=args.max_len,
                ctc_weight=args.ctc_weight, penalty=args.penalty,
                lm_apply=lm_apply_host, lm_weight=args.lm_weight,
                encode_fn=encode_fn,
            )
        hyps[key] = decode_tokens(seq, vocab)
        print(f"{key}: {hyps[key]}")

    with open(args.out_text, "w") as f:
        for k, v in hyps.items():
            f.write(f"{k} {v}\n")

    if args.ref_text:
        from speech_recognition_tools_tpu.eval import score_hypotheses

        refs = {
            k: v.split() for k, v in read_text_file(args.ref_text).items()
            if k in hyps
        }
        wer, _ = score_hypotheses(refs, {k: v.split() for k, v in hyps.items()})
        print(f"WER: {wer:.2f}%")


if __name__ == "__main__":
    main()
