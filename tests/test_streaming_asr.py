"""Streaming (online) recognition: the incremental encoder must equal the
offline chunked-attention encode exactly, for both encoder types; the CLI
--streaming path decodes a trained model end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_recognition_tools_tpu.infer.streaming_asr import (
    StreamingRecognizer,
)
from speech_recognition_tools_tpu.models.transformer_asr import (
    TransformerASR,
    TransformerASRConfig,
    chunk_attention_mask,
    greedy_ctc,
)

RS = np.random.RandomState(7)


def _tiny_cfg(encoder_type, **kw):
    return TransformerASRConfig(
        vocab_size=11, adim=16, aheads=2, elayers=2, eunits=32,
        dlayers=1, dunits=32, dropout=0.0, encoder_type=encoder_type,
        conv_kernel=7, **kw,
    )


def _init(model, T=150, D=8, seed=0):
    x = RS.randn(1, T, D).astype(np.float32)
    params = model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
        jnp.asarray(x), jnp.asarray([T]), jnp.zeros((1, 4), jnp.int32),
    )
    return x, params


def _offline(model, params, x, T):
    mem, enc_len, ctc = model.apply(
        params, jnp.asarray(x), jnp.asarray([T]),
        method=TransformerASR.encode,
    )
    n = int(enc_len[0])
    return np.asarray(mem)[0, :n], np.asarray(ctc)[0, :n], n


def test_chunk_mask_shape_and_rule():
    m = np.asarray(chunk_attention_mask(8, 3, 1))
    # frame 4 (chunk 1) attends chunks 0..1 = frames 0..5, not 6..7
    assert m[4, :6].all() and not m[4, 6:].any()
    # frame 7 (chunk 2) with left=1 attends chunks 1..2 = frames 3..7
    assert not m[7, :3].any() and m[7, 3:].all()


@pytest.mark.parametrize("encoder_type", ["transformer", "conformer"])
def test_streaming_matches_offline(encoder_type):
    cfg = _tiny_cfg(encoder_type, attn_chunk=4, attn_left_chunks=2)
    model = TransformerASR(cfg)
    T = 150
    x, params = _init(model, T=T)
    mem, ctc, n = _offline(model, params, x, T)

    sr = StreamingRecognizer(model, params)
    i = 0
    for sz in (7, 30, 13, 50, 29, 100):  # ragged arrival
        if i >= T:
            break
        sr.push(x[0, i : i + sz])
        i += sz
    hyp = sr.finish()

    assert sr.enc_len == n
    np.testing.assert_allclose(sr.memory, mem, rtol=1e-4, atol=3e-5)
    np.testing.assert_allclose(sr.ctc_logits, ctc, rtol=1e-4, atol=3e-5)
    assert hyp == greedy_ctc(jnp.asarray(ctc[None]), jnp.asarray([n]))[0]


def test_streaming_no_left_context():
    cfg = _tiny_cfg("transformer", attn_chunk=5, attn_left_chunks=0)
    model = TransformerASR(cfg)
    T = 101
    x, params = _init(model, T=T, seed=3)
    mem, ctc, n = _offline(model, params, x, T)
    sr = StreamingRecognizer(model, params)
    sr.push(x[0])
    sr.finish()
    assert sr.enc_len == n
    np.testing.assert_allclose(sr.memory, mem, rtol=1e-4, atol=3e-5)


def test_chunked_attention_actually_masks():
    full = TransformerASR(_tiny_cfg("transformer"))
    chunked = TransformerASR(
        _tiny_cfg("transformer", attn_chunk=4, attn_left_chunks=1)
    )
    T = 120
    x, params = _init(full, T=T, seed=5)
    mem_f, _, _ = _offline(full, params, x, T)
    mem_c, _, _ = _offline(chunked, params, x, T)  # same params apply
    assert np.max(np.abs(mem_f - mem_c)) > 1e-3


def test_streaming_requires_streaming_config():
    model = TransformerASR(_tiny_cfg("transformer"))
    _, params = _init(model, T=40)
    with pytest.raises(ValueError, match="attn_chunk"):
        StreamingRecognizer(model, params)
    model2 = TransformerASR(_tiny_cfg("transformer", attn_chunk=4))
    _, params2 = _init(model2, T=40)
    with pytest.raises(ValueError, match="left"):
        StreamingRecognizer(model2, params2)


def test_streaming_bounded_buffers_and_no_position_cap():
    """Serving properties: the raw-feature buffer is trimmed to the
    unconsumed tail, store_memory=False keeps nothing growing, and
    positions are host-computed (parity holds at arbitrary offsets —
    checked by running a long stream and comparing the final chunks)."""
    cfg = _tiny_cfg("transformer", attn_chunk=4, attn_left_chunks=1)
    model = TransformerASR(cfg)
    T = 1200
    x, params = _init(model, T=T, seed=11)
    mem, ctc, n = _offline(model, params, x, T)

    sr = StreamingRecognizer(model, params, store_memory=False)
    for s in range(0, T, 53):
        sr.push(x[0, s : s + 53])
        # buffer never holds more than the unconsumed tail + one push
        assert sr._st.buf.shape[0] <= 4 * sr.chunk + 3 + 53
    hyp = sr.finish()
    assert sr.enc_len == n and sr.memory.shape[0] == 0  # nothing stored
    assert hyp == greedy_ctc(jnp.asarray(ctc[None]), jnp.asarray([n]))[0]

    # with store_memory, tail frames still match offline at deep offsets
    sr2 = StreamingRecognizer(model, params)
    sr2.push(x[0])
    sr2.finish()
    assert sr2.enc_len == n
    np.testing.assert_allclose(sr2.memory[-8:], mem[-8:], rtol=1e-4,
                               atol=3e-5)


@pytest.mark.parametrize("encoder_type", ["transformer", "conformer"])
def test_stream_batcher_matches_single_streams(encoder_type):
    """Concurrent streams batched into one padded step per round must
    reproduce each stream's single-recognizer output exactly — including
    streams of different lengths finishing at different times."""
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        StreamBatcher,
    )

    cfg = _tiny_cfg(encoder_type, attn_chunk=4, attn_left_chunks=2)
    model = TransformerASR(cfg)
    lens = [150, 90, 201]
    xs = [RS.randn(t, 8).astype(np.float32) for t in lens]
    _, params = _init(model, T=60, D=8, seed=21)

    singles = []
    for x in xs:
        sr = StreamingRecognizer(model, params)
        sr.push(x)
        hyp = sr.finish()
        singles.append((hyp, sr.memory, sr.enc_len))

    sb = StreamBatcher(model, params, max_streams=4, store_memory=True)
    sids = [sb.open() for _ in xs]
    # interleaved ragged arrival
    offs = [0] * len(xs)
    sizes = [37, 23, 52]
    while any(o < t for o, t in zip(offs, lens)):
        for i, sid in enumerate(sids):
            if offs[i] < lens[i]:
                sb.push(sid, xs[i][offs[i] : offs[i] + sizes[i]])
                offs[i] += sizes[i]
    for i, sid in enumerate(sids):
        hyp = sb.finish(sid)
        want_hyp, want_mem, want_len = singles[i]
        st = sb.state(sid)
        assert hyp == want_hyp, i
        assert st.pos == want_len
        np.testing.assert_allclose(
            st.memory, want_mem, rtol=1e-4, atol=3e-5
        )


def test_batcher_rejects_feat_dim_mismatch_and_abort_frees_slot():
    """All streams share one batched round buffer: a stream pushing a
    different feature dim must fail ITS push loudly (not blow up a later
    round mid-flight for everyone). abort() drops a live stream without
    a tail flush and frees its slot for reuse."""
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        StreamBatcher,
    )

    cfg = _tiny_cfg("transformer", attn_chunk=4, attn_left_chunks=2)
    model = TransformerASR(cfg)
    _, params = _init(model, T=60, D=8, seed=21)
    sb = StreamBatcher(model, params, max_streams=2)
    a, b = sb.open(), sb.open()
    sb.push(a, RS.randn(10, 8).astype(np.float32))
    with pytest.raises(ValueError, match="dim"):
        sb.push(b, RS.randn(10, 4).astype(np.float32))
    # abort a mid-stream: no flush, results gone, slot free
    sb.push(a, RS.randn(30, 8).astype(np.float32))
    slot_a = sb._streams[a].slot
    sb.abort(a)
    assert a not in sb._streams and sb._slot_sid[slot_a] is None
    c = sb.open()  # reuses the freed slot
    sb.push(c, RS.randn(60, 8).astype(np.float32))
    assert sb.finish(c) is not None


def test_online_pipeline_audio_to_tokens():
    """Full online path: raw audio -> StreamingFdlp -> recognizer. The
    encoder half must consume the streamed features exactly as the
    offline encode of those same features (featgen parity itself is
    pinned by tests/test_streaming.py)."""
    from speech_recognition_tools_tpu.dsp.fdlp import FdlpConfig
    from speech_recognition_tools_tpu.dsp.streaming import StreamingFdlp
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        OnlineASRPipeline,
    )

    fcfg = FdlpConfig(srate=8000, nfilters=8, fduration=0.25,
                      coeff_num=20, order=20)
    # syllabic AR-noise carrier (dsp/streaming-style test signal)
    n = 9000
    e = RS.randn(n).astype(np.float32)
    sig = np.zeros(n, np.float32)
    for t in range(2, n):
        sig[t] = 1.2 * sig[t - 1] - 0.5 * sig[t - 2] + e[t]
    sig *= (0.4 + 0.3 * np.sin(2 * np.pi * np.arange(n) * 3.0 / 8000))

    cfg = _tiny_cfg("transformer", attn_chunk=3, attn_left_chunks=2)
    model = TransformerASR(cfg)
    _, params = _init(model, T=60, D=8, seed=9)

    mean = np.full((8,), 0.5, np.float32)
    pipe = OnlineASRPipeline(model, params, fdlp_cfg=fcfg,
                             cmvn_mean=mean)
    for s in range(0, n, 1500):
        pipe.push(sig[s : s + 1500])
    hyp = pipe.finish()

    # reference: the same streamed features through the offline encode
    sf = StreamingFdlp(fcfg, block_frames=8)
    feats = [sf.process(sig[s : s + 1500]) for s in range(0, n, 1500)]
    feats.append(sf.finish())
    feats = np.concatenate(feats, axis=0) - mean[None]
    mem, ctc, nf = _offline(model, params, feats[None], feats.shape[0])
    assert pipe.recognizer.enc_len == nf
    np.testing.assert_allclose(pipe.recognizer.memory, mem,
                               rtol=1e-4, atol=3e-5)
    assert hyp == greedy_ctc(
        jnp.asarray(ctc[None]), jnp.asarray([nf])
    )[0]


def test_batcher_defer_coalesces_rounds():
    """Dynamic batching: with defer_s, a ready chunk waits for the other
    live streams instead of running a solo round — and the coalesced
    result is still exactly the single-stream one."""
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        StreamBatcher,
        StreamingRecognizer,
    )

    cfg = _tiny_cfg("transformer", attn_chunk=4, attn_left_chunks=2)
    model = TransformerASR(cfg)
    _, params = _init(model, T=60, D=8, seed=13)
    xs = [RS.randn(90, 8).astype(np.float32) for _ in range(2)]

    singles = []
    for x in xs:
        sr = StreamingRecognizer(model, params)
        sr.push(x)
        singles.append(sr.finish())

    # defer long enough that only the all-streams-ready trigger can fire
    sb = StreamBatcher(model, params, max_streams=4, defer_s=60.0)
    a, b = sb.open(), sb.open()
    sb.push(a, xs[0])  # a is ready, but b (live) is not -> held back
    assert sb.state(a).pos == 0
    sb.push(b, xs[1])  # both ready -> one full batched round fires
    assert sb.state(a).pos > 0 and sb.state(b).pos > 0
    assert sb.finish(a) == singles[0]
    assert sb.finish(b) == singles[1]


def test_endpointing_segments_exactly():
    """Server-side endpointing: when the trailing blank run reaches the
    threshold, StreamBatcher.restart finalizes the utterance in place
    and continues fresh — and each segment equals a fresh recognizer run
    over exactly the frames that segment consumed (no approximation at
    the boundary)."""
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        StreamBatcher,
        _blank_run_update,
    )

    # pure-function sanity
    assert _blank_run_update(0, 2, np.eye(3)[[0, 0]]) == 4      # all blank
    assert _blank_run_update(0, 5, np.eye(3)[[1, 0, 0]]) == 2   # tail only
    assert _blank_run_update(0, 5, np.eye(3)[[0, 2]]) == 0      # reset

    # seed 7 gives a mid-stream blank run >= 3 with tokens on both sides
    # (probed offline; the streamed CTC equals the offline CTC exactly)
    cfg = _tiny_cfg("transformer", attn_chunk=4, attn_left_chunks=2)
    model = TransformerASR(cfg)
    T = 200
    x = np.random.RandomState(107).randn(1, T, 8).astype(np.float32)
    params = model.init(
        {"params": jax.random.key(7), "dropout": jax.random.key(8)},
        jnp.asarray(x), jnp.asarray([T]), jnp.zeros((1, 4), jnp.int32),
    )
    feats = x[0]
    THRESH = 3

    sb = StreamBatcher(model, params, max_streams=2)
    sid = sb.open()
    segments, cuts, fed = [], [], 0
    for off in range(0, T, 16):
        sb.push(sid, feats[off : off + 16])
        fed = min(off + 16, T)
        st = sb.state(sid)
        if st.hyp and st.blank_run >= THRESH:
            toks, times, confs = sb.restart(sid)
            assert len(times) == len(toks) == len(confs)
            assert all(0 < c <= 1 for c in confs)
            segments.append(toks)
            cuts.append(fed)
    final = sb.finish(sid)
    assert segments and cuts[0] < T, "endpoint must fire mid-stream"
    assert final, "speech after the endpoint must produce tokens"

    # each segment == a fresh single-stream recognizer over exactly the
    # frames that segment consumed
    bounds = [0] + cuts + [T]
    for i, want in enumerate(segments + [final]):
        sr = StreamingRecognizer(model, params)
        sr.push(feats[bounds[i] : bounds[i + 1]])
        assert sr.finish() == want, i

    # the single-stream pipeline-style restart agrees: blank_run on the
    # recognizer tracks the batcher's
    sr = StreamingRecognizer(model, params)
    sr.push(feats[: cuts[0]])
    st_probe = StreamBatcher(model, params, max_streams=1)
    sid2 = st_probe.open()
    st_probe.push(sid2, feats[: cuts[0]])
    assert sr.blank_run == st_probe.state(sid2).blank_run >= THRESH


def test_token_times_match_offline_definition():
    """Per-token emit timestamps: the streamed `times` equal the exact
    offline definition — the first CTC frame of each collapsed token run
    — for both the single-stream recognizer and the batcher."""
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        StreamBatcher,
    )

    cfg = _tiny_cfg("transformer", attn_chunk=4, attn_left_chunks=2)
    model = TransformerASR(cfg)
    T = 200
    x = np.random.RandomState(107).randn(1, T, 8).astype(np.float32)
    params = model.init(
        {"params": jax.random.key(7), "dropout": jax.random.key(8)},
        jnp.asarray(x), jnp.asarray([T]), jnp.zeros((1, 4), jnp.int32),
    )
    _, ctc, n = _offline(model, params, x, T)
    ids = np.argmax(ctc, -1)
    want_times, last = [], cfg.blank_id
    for i, t in enumerate(ids):
        if t != cfg.blank_id and t != last:
            want_times.append(i)
        last = int(t)

    sr = StreamingRecognizer(model, params)
    sr.push(x[0])
    hyp = sr.finish()
    assert len(hyp) == len(want_times) > 0
    assert sr.times == want_times

    sb = StreamBatcher(model, params, max_streams=2)
    sid = sb.open()
    for off in range(0, T, 16):
        sb.push(sid, x[0, off : off + 16])
    sb.finish(sid)
    assert sb.state(sid).times == want_times


def test_token_confidences_match_offline_definition():
    """Per-token confidences: the streamed `confs` equal the exact
    offline definition — the CTC softmax posterior of the token at its
    emitting frame — and live in (0, 1]."""
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        StreamBatcher,
    )

    cfg = _tiny_cfg("transformer", attn_chunk=4, attn_left_chunks=2)
    model = TransformerASR(cfg)
    T = 200
    x = np.random.RandomState(107).randn(1, T, 8).astype(np.float32)
    params = model.init(
        {"params": jax.random.key(7), "dropout": jax.random.key(8)},
        jnp.asarray(x), jnp.asarray([T]), jnp.zeros((1, 4), jnp.int32),
    )
    _, ctc, n = _offline(model, params, x, T)
    ids = np.argmax(ctc, -1)
    logp = ctc - np.log(np.exp(
        ctc - ctc.max(-1, keepdims=True)
    ).sum(-1, keepdims=True)) - ctc.max(-1, keepdims=True)
    want, last = [], cfg.blank_id
    for i, t in enumerate(ids):
        if t != cfg.blank_id and t != last:
            want.append(float(np.exp(logp[i, t])))
        last = int(t)

    sr = StreamingRecognizer(model, params)
    sr.push(x[0])
    hyp = sr.finish()
    assert len(hyp) == len(want) > 0
    assert all(0 < c <= 1 for c in sr.confs)
    np.testing.assert_allclose(sr.confs, want, rtol=2e-3)

    sb = StreamBatcher(model, params, max_streams=2)
    sid = sb.open()
    for off in range(0, T, 16):
        sb.push(sid, x[0, off : off + 16])
    sb.finish(sid)
    np.testing.assert_allclose(sb.state(sid).confs, want, rtol=2e-3)


@pytest.mark.slow
def test_rescored_partial_equals_final_beam():
    """After finish(), the attention-rescored 'partial' IS the offline
    joint beam over the full chunked encode; mid-stream it runs over a
    strict prefix of the memory."""
    from speech_recognition_tools_tpu.models.transformer_asr import (
        beam_search,
    )

    cfg = _tiny_cfg("transformer", attn_chunk=4, attn_left_chunks=2)
    model = TransformerASR(cfg)
    T = 120
    x, params = _init(model, T=T, seed=13)

    sr = StreamingRecognizer(model, params)
    sr.push(x[0, :60])
    mid = sr.rescored_partial(model, params, cfg, beam_size=2, max_len=6)
    assert isinstance(mid, list)
    sr.push(x[0, 60:])
    sr.finish()
    part = sr.rescored_partial(model, params, cfg, beam_size=2, max_len=6)

    want = beam_search(
        model, params, jnp.asarray(x), jnp.asarray([T]), cfg,
        beam_size=2, max_len=6,
    )
    assert part == want

    sr2 = StreamingRecognizer(model, params, store_memory=False)
    with pytest.raises(ValueError, match="store_memory"):
        sr2.rescored_partial(model, params, cfg)


@pytest.mark.slow
def test_streaming_cli_end_to_end(tmp_path):
    """train_e2e --attn_chunk -> recog_e2e --streaming: the online decode
    equals the offline decode of the same chunked model (the streamed
    encoder output IS the offline encode)."""
    import os

    from speech_recognition_tools_tpu.cli import recog_e2e, train_e2e
    from speech_recognition_tools_tpu.io import build_egs

    feats = {f"u{i}": RS.randn(41, 8).astype(np.float32) for i in range(3)}
    egs = str(tmp_path / "egs")
    build_egs(iter(feats.items()), egs)
    text = tmp_path / "text"
    text.write_text("".join(f"u{i} ab cab\n" for i in range(3)))

    out = str(tmp_path / "e2e_stream")
    train_e2e.main(
        [egs, str(text), out, "--adim", "16", "--aheads", "2",
         "--elayers", "1", "--eunits", "32", "--dlayers", "1",
         "--dunits", "32", "--epochs", "2", "--batch_size", "2",
         "--warmup_steps", "10", "--average_last", "2",
         "--attn_chunk", "3", "--attn_left_chunks", "2"]
    )
    assert os.path.exists(os.path.join(out, "final_avg", "state.msgpack"))

    hyp_s = str(tmp_path / "hyp_stream.txt")
    recog_e2e.main(
        [out, egs, hyp_s, "--beam_size", "2", "--max_len", "8",
         "--streaming", "--streaming_feed", "17"]
    )
    hyp_o = str(tmp_path / "hyp_off.txt")
    recog_e2e.main(
        [out, egs, hyp_o, "--beam_size", "2", "--max_len", "8"]
    )
    assert open(hyp_s).read() == open(hyp_o).read()

    # greedy final variant also runs
    hyp_g = str(tmp_path / "hyp_greedy.txt")
    recog_e2e.main(
        [out, egs, hyp_g, "--streaming", "--streaming_final", "greedy"]
    )
    assert len(open(hyp_g).read().splitlines()) == 3
