"""RNNLM training CLI (character or word units).

Reference behaviour: the e2e recipes train an external RNNLM with ESPnet's
lm_train.py (e2e/reverb/run_fdlp_e1.sh:405-417, conf/lm.yaml: 1 layer /
1000 units, SGD; wsj defaults to a WORD LM capped at lm_vocabsize 65000,
run_fdlp_e1.sh:36-39) and fuses it at decode time with lm-weight 1.0
(conf/decode.yaml). This trains the native models.rnnlm.RNNLM on a Kaldi
text file. --unit char shares the ASR char vocabulary so the fusion token
spaces match (recog_e2e --lm_dir); --unit word builds a frequency-capped
word vocabulary and the result fuses through the look-ahead prefix-tree
scorer (recog_e2e --word_lm_dir, decode/wordlm.py). Checkpoints are the
toolkit's self-describing format so recog restores them without side
files.
"""

import argparse
import os


def get_parser():
    p = argparse.ArgumentParser("Train a character RNNLM for shallow fusion")
    p.add_argument("text", help="Kaldi text file: 'utt transcription'")
    p.add_argument("store_path")
    p.add_argument("--vocab", help="vocab.json from train_e2e (default: "
                                   "build from the text, which matches "
                                   "train_e2e on the same text)")
    p.add_argument("--unit", default="char", choices=["char", "word"],
                   help="token unit. 'word' trains the reference's "
                        "use_wordlm=true LM (run_fdlp_e1.sh:36-39): "
                        "vocab = top --word_vocab_size words + "
                        "<eos>/<unk>, fused at decode time via "
                        "srt-recog-e2e --word_lm_dir (look-ahead "
                        "prefix-tree scoring, decode/wordlm.py)")
    p.add_argument("--word_vocab_size", type=int, default=65000,
                   help="(--unit word) vocabulary cap (reference "
                        "lm_vocabsize)")
    p.add_argument("--embed_dim", type=int, default=256)
    p.add_argument("--hidden", type=int, default=1000)
    p.add_argument("--layers", type=int, default=1)
    p.add_argument("--cell", default="gru", choices=["gru", "lstm"],
                   help="recurrent cell (lstm matches ESPnet's default "
                        "LM; imported ESPnet LMs record this themselves)")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--bptt_len", type=int, default=128,
                   help="max tokens per sequence (longer texts are split)")
    p.add_argument("--seed", type=int, default=0)
    return p


def lm_batches(texts, vocab, batch_size, bptt_len, seed=None, unit="char"):
    """Yield (tokens (B, U), lengths (B,)) batches of bos+tokens+eos.
    char: <sos/eos> (last id) bounds the sequence, matching train_e2e's
    token space. word: <eos> (id 0) is both BOS and EOS — the convention
    decode/wordlm.py's history scoring uses."""
    import numpy as np

    from speech_recognition_tools_tpu.io.text import encode_text, encode_words

    if unit == "word":
        sos = vocab["<eos>"]
        encode = encode_words
    else:
        sos = len(vocab) - 1
        encode = encode_text
    seqs = []
    for t in texts.values():
        ids = encode(t, vocab)
        for off in range(0, len(ids), bptt_len - 2):
            chunk = ids[off : off + bptt_len - 2]
            seqs.append([sos] + chunk + [sos])  # sos/eos share the id
    order = np.arange(len(seqs))
    if seed is not None:
        np.random.RandomState(seed).shuffle(order)
    seqs = [seqs[i] for i in order]
    for off in range(0, len(seqs), batch_size):
        group = seqs[off : off + batch_size]
        U = max(len(s) for s in group)
        toks = np.full((len(group), U), -1, np.int32)
        lens = np.zeros(len(group), np.int32)
        for i, s in enumerate(group):
            toks[i, : len(s)] = s
            lens[i] = len(s)
        yield toks, lens


def main(argv=None):
    args = get_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    import optax

    from speech_recognition_tools_tpu.io.text import (
        build_char_vocab,
        load_vocab,
        read_text_file,
        save_vocab,
    )
    from speech_recognition_tools_tpu.models.rnnlm import RNNLM, lm_loss
    from speech_recognition_tools_tpu.train import save_checkpoint

    texts = read_text_file(args.text)
    if args.vocab:
        vocab = load_vocab(args.vocab)
        if args.unit == "word" and not (
            "<unk>" in vocab and "<eos>" in vocab
        ):
            raise ValueError("--unit word needs a vocab with <unk>/<eos>")
    elif args.unit == "word":
        from speech_recognition_tools_tpu.io.text import build_word_vocab

        vocab = build_word_vocab(texts.values(), args.word_vocab_size)
    else:
        vocab = build_char_vocab(texts.values())
    os.makedirs(args.store_path, exist_ok=True)
    save_vocab(vocab, os.path.join(args.store_path, "vocab.json"))

    model = RNNLM(
        vocab_size=len(vocab), embed_dim=args.embed_dim,
        hidden=args.hidden, layers=args.layers, cell=args.cell,
    )
    t0, l0 = next(lm_batches(texts, vocab, args.batch_size, args.bptt_len,
                             unit=args.unit))
    params = model.init(
        {"params": jax.random.key(args.seed)}, jnp.asarray(t0),
        jnp.asarray(l0),
    )
    tx = optax.adam(args.learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, tokens, lengths):
        loss, grads = jax.value_and_grad(
            lambda p: lm_loss(model, p, tokens, lengths)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    import numpy as np

    # babysitter-style resume: newest per-epoch checkpoint wins
    from speech_recognition_tools_tpu.train import (
        latest_checkpoint,
        load_checkpoint,
    )

    hyper = dict(vars(args))
    hyper.update(model_class="RNNLM", vocab_size=len(vocab))
    start_ep = 0
    newest = latest_checkpoint(args.store_path)
    if newest and os.path.basename(newest).startswith("epoch_"):
        try:
            payload, meta = load_checkpoint(
                newest, template={"params": params, "opt_state": opt_state}
            )
            opt_state = payload["opt_state"]
        except KeyError:
            payload, meta = load_checkpoint(newest, template={"params": params})
        params = payload["params"]
        start_ep = int(meta.get("extra", {}).get("epoch", 0))
        print(f"resumed from {newest} at epoch {start_ep}")

    from speech_recognition_tools_tpu.train import save_checkpoint as _sc

    for ep in range(start_ep, args.epochs):
        losses = []
        for toks, lens in lm_batches(
            texts, vocab, args.batch_size, args.bptt_len,
            seed=args.seed + ep, unit=args.unit,
        ):
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(toks), jnp.asarray(lens)
            )
            losses.append(float(loss))
        ppl = float(np.exp(np.mean(losses)))
        print(f"epoch {ep + 1}: nll {np.mean(losses):.4f} ppl {ppl:.2f}")
        _sc(args.store_path, f"epoch_{ep + 1}", params, hyper,
            opt_state=opt_state, extra={"epoch": ep + 1})

    save_checkpoint(args.store_path, "final", params, hyper)
    print(f"saved LM to {os.path.join(args.store_path, 'final')}")


if __name__ == "__main__":
    main()
