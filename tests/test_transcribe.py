"""srt-transcribe: one-command long-form wav -> text with timestamps.

Pins (a) CLI output == a direct OnlineASRPipeline run (including
feed-granularity invariance: the CLI feeds small host chunks, the
oracle one big push), (b) endpointed segments carry absolute,
monotonically increasing timestamps derived from segment_start_frames.
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from scipy.io.wavfile import write as wav_write

from speech_recognition_tools_tpu.dsp.fdlp import FdlpConfig
from speech_recognition_tools_tpu.models.transformer_asr import (
    TransformerASR,
    TransformerASRConfig,
)

RS = np.random.RandomState(3)
FCFG = FdlpConfig(srate=8000, nfilters=8, fduration=0.25, coeff_num=20,
                  order=20)


def _make_model_dir(tmp_path):
    from speech_recognition_tools_tpu.io.text import (
        build_char_vocab,
        save_vocab,
    )
    from speech_recognition_tools_tpu.train import save_checkpoint

    vocab = build_char_vocab(["ab cab"])
    cfg = dict(
        vocab_size=len(vocab), adim=16, aheads=2, elayers=2, eunits=32,
        dlayers=1, dunits=32, mtlalpha=0.3, lsm_weight=0.0,
        encoder_type="transformer", conv_kernel=15,
        attn_chunk=3, attn_left_chunks=2,
    )
    mcfg = TransformerASRConfig(
        vocab_size=cfg["vocab_size"], adim=16, aheads=2, elayers=2,
        eunits=32, dlayers=1, dunits=32, dropout=0.0,
        attn_chunk=3, attn_left_chunks=2,
    )
    model = TransformerASR(mcfg)
    params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 16, 8)), jnp.asarray([16]),
        jnp.zeros((1, 4), jnp.int32),
    )
    d = str(tmp_path / "model")
    os.makedirs(d, exist_ok=True)
    save_vocab(vocab, os.path.join(d, "vocab.json"))
    save_checkpoint(d, "final_avg", params, cfg)
    mean = RS.randn(8).astype(np.float32) * 0.1
    std = (1.0 + 0.2 * RS.rand(8)).astype(np.float32)
    np.savez(os.path.join(d, "cmvn.npz"), mean=mean, std=std)
    manifest = {
        "frontend": {
            "type": "fdlp", "srate": 8000, "nfilters": 8,
            "fduration": 0.25, "coeff_num": 20, "order": 20,
        },
        "cmvn": "cmvn.npz",
        "cmvn_mode": "global",
    }
    with open(os.path.join(d, "serving.json"), "w") as f:
        json.dump(manifest, f)
    return d, model, params, vocab, (mean, std)


def _audio(seed, n=9000):
    rs = np.random.RandomState(seed)
    e = rs.randn(n).astype(np.float32)
    sig = np.zeros(n, np.float32)
    for t in range(2, n):
        sig[t] = 1.2 * sig[t - 1] - 0.5 * sig[t - 2] + e[t]
    return sig * (0.4 + 0.3 * np.sin(2 * np.pi * np.arange(n) * 3.0 / 8000))


def test_transcribe_cli_matches_pipeline(tmp_path):
    from speech_recognition_tools_tpu.cli.transcribe import main
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        OnlineASRPipeline,
    )

    d, model, params, vocab, (mean, std) = _make_model_dir(tmp_path)
    sigs = {"uttA": _audio(5, n=7000), "uttB": _audio(2, n=9000)}
    wavs = []
    for utt, sig in sigs.items():
        path = str(tmp_path / f"{utt}.wav")
        wav_write(path, 8000, sig)
        wavs.append(path)

    out = str(tmp_path / "text")
    jout = str(tmp_path / "segs.json")
    # tiny --feed_seconds: many host pushes; must equal one big push
    main([d, *wavs, "--out", out, "--json", jout,
          "--feed_seconds", "0.25"])

    want = {}
    for utt, sig in sigs.items():
        pipe = OnlineASRPipeline(model, params, fdlp_cfg=FCFG, vocab=vocab,
                                 cmvn_mean=mean, cmvn_std=std)
        pipe.push(sig)
        toks = pipe.finish()
        want[utt] = (toks, pipe.recognizer.text(toks))

    got = dict(line.split(" ", 1) if " " in line else (line, "")
               for line in open(out).read().splitlines())
    segs = json.load(open(jout))
    for utt in sigs:
        # the CLI joins segment texts and strips outer whitespace; the
        # raw decode can end in a trailing <space> token
        assert got[utt] == want[utt][1].strip()
        assert segs[utt]["text"] == want[utt][1].strip()
        if want[utt][0]:
            (seg,) = segs[utt]["segments"]
            assert seg["tokens"] == want[utt][0]
            assert 0.0 <= seg["start"] <= seg["end"]
            assert len(seg["times"]) == len(seg["tokens"])
            assert seg["conf"] is None or 0.0 <= seg["conf"] <= 1.0


def test_transcribe_endpointing_absolute_times(tmp_path):
    from speech_recognition_tools_tpu.cli.transcribe import (
        transcribe_utterance,
    )
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        OnlineASRPipeline,
    )

    d, model, params, vocab, (mean, std) = _make_model_dir(tmp_path)
    sig = np.concatenate([
        _audio(5), np.zeros(6000, np.float32), _audio(2, n=7000),
    ])

    # probe the largest threshold that yields >= 2 segments on this
    # fixture (random-init CTC; deterministic given the fixed seeds)
    for cand in (8, 6, 5, 4, 3, 2):
        pipe = OnlineASRPipeline(model, params, fdlp_cfg=FCFG, vocab=vocab,
                                 cmvn_mean=mean, cmvn_std=std,
                                 endpoint_blanks=cand)
        text, segments = transcribe_utterance(pipe, sig, feed_seconds=0.25)
        if len(segments) >= 2:
            break
    assert len(segments) >= 2, "fixture no longer endpoints; adjust seeds"

    # segment bookkeeping: one absolute start frame per segment,
    # strictly increasing
    starts = pipe.segment_start_frames
    assert len(starts) == len(pipe.segments) == len(segments)
    assert starts[0] == 0
    assert all(a < b for a, b in zip(starts, starts[1:]))

    # absolute times: in-range, ordered within and ACROSS segments
    audio_len_s = len(sig) / 8000.0
    prev_end = 0.0
    for seg in segments:
        assert 0.0 <= seg["start"] <= seg["end"] <= audio_len_s + 0.5
        assert seg["start"] >= prev_end - 1e-9
        assert seg["times"] == sorted(seg["times"])
        if seg["times"]:
            assert abs(seg["times"][0] - seg["start"]) < 1e-6
        prev_end = seg["start"]
    # the joined text is the segment texts in order
    assert text == " ".join(s["text"] for s in segments).strip()
