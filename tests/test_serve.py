"""Serving daemon: real TCP sockets, concurrent streams sharing one
StreamBatcher, partial + final results matching the direct pipeline."""

import json
import os
import socket
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_recognition_tools_tpu.dsp.fdlp import FdlpConfig
from speech_recognition_tools_tpu.models.transformer_asr import (
    TransformerASR,
    TransformerASRConfig,
)

RS = np.random.RandomState(3)
FCFG = FdlpConfig(srate=8000, nfilters=8, fduration=0.25, coeff_num=20,
                  order=20)


def _make_model_dir(tmp_path):
    """A _load-compatible checkpoint dir without training (random init)."""
    from speech_recognition_tools_tpu.io.text import build_char_vocab, save_vocab
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
    d = str(tmp_path / "served_model")
    os.makedirs(d, exist_ok=True)
    save_vocab(vocab, os.path.join(d, "vocab.json"))
    save_checkpoint(d, "final_avg", params, cfg)
    return d, model, params, vocab


def _audio(seed, n=9000):
    rs = np.random.RandomState(seed)
    e = rs.randn(n).astype(np.float32)
    sig = np.zeros(n, np.float32)
    for t in range(2, n):
        sig[t] = 1.2 * sig[t - 1] - 0.5 * sig[t - 2] + e[t]
    return sig * (0.4 + 0.3 * np.sin(2 * np.pi * np.arange(n) * 3.0 / 8000))


def _client(port, sig, chunk=2000):
    s = socket.create_connection(("127.0.0.1", port), timeout=120)
    f = s.makefile("rwb")
    partials = []
    for off in range(0, len(sig), chunk):
        f.write((json.dumps(
            {"pcm": [float(v) for v in sig[off : off + chunk]]}
        ) + "\n").encode())
        f.flush()
        partials.append(json.loads(f.readline())["partial"])
    f.write((json.dumps({"eof": True}) + "\n").encode())
    f.flush()
    final = json.loads(f.readline())
    s.close()
    return partials, final


def test_serve_two_concurrent_streams(tmp_path):
    from speech_recognition_tools_tpu.cli.serve import make_server
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        OnlineASRPipeline,
    )

    d, model, params, vocab = _make_model_dir(tmp_path)
    server, port = make_server(d, max_streams=4, fdlp_cfg=FCFG)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        sigs = [_audio(1), _audio(2, n=7000)]
        results = [None, None]

        def run(i):
            results[i] = _client(port, sigs[i])

        threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        for i, sig in enumerate(sigs):
            partials, final = results[i]
            assert final["frames"] > 0
            # the served result must equal the direct online pipeline
            pipe = OnlineASRPipeline(model, params, fdlp_cfg=FCFG,
                                     vocab=vocab)
            pipe.push(sig)
            want = pipe.finish()
            assert final["tokens"] == want, i
            # the hypothesis is append-only, so every partial must be a
            # prefix of the final text and at least one mid-stream
            # partial must be non-empty (partials really stream)
            assert all(final["final"].startswith(p) for p in partials), i
            assert any(partials), i
        # live-state hygiene: the shared batcher must hold no live or
        # finished streams once connections are done (release() ran)
        svc = server.service
        assert not svc.batcher._streams and not svc.batcher._finished

        # malformed messages get an error frame, not a dropped socket
        s = socket.create_connection(("127.0.0.1", port), timeout=60)
        f = s.makefile("rwb")
        f.write(b'{"pcm": "oops"}\n')
        f.flush()
        resp = json.loads(f.readline())
        assert "error" in resp
        s.close()

        # so do syntactically valid but non-object frames (bare strings /
        # arrays) — the wire contract is an error response, not a silent
        # socket drop from an uncaught handler exception
        for frame in (b'"hello"\n', b'[1, 2]\n'):
            s = socket.create_connection(("127.0.0.1", port), timeout=60)
            f = s.makefile("rwb")
            f.write(frame)
            f.flush()
            resp = json.loads(f.readline())
            assert "error" in resp, frame
            s.close()
    finally:
        server.shutdown()
        server.server_close()


def test_serve_client_cli_streams_wav(tmp_path):
    """srt-serve-client: streams a wav to a live server and returns the
    same final (tokens + times + confs) as the direct pipeline; the
    confs are valid probabilities parallel to the tokens."""
    from scipy.io.wavfile import write as wav_write

    from speech_recognition_tools_tpu.cli.serve import make_server
    from speech_recognition_tools_tpu.cli.serve_client import stream_wav
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        OnlineASRPipeline,
    )

    d, model, params, vocab = _make_model_dir(tmp_path)
    server, port = make_server(d, max_streams=2, fdlp_cfg=FCFG)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        sig = _audio(9)
        wav = str(tmp_path / "in.wav")
        wav_write(wav, 8000, sig)
        lines = []
        final, events = stream_wav(wav, port=port, chunk_s=0.25,
                                   pace=False, log=lines.append)
        pipe = OnlineASRPipeline(model, params, fdlp_cfg=FCFG, vocab=vocab)
        pipe.push(sig)
        want = pipe.finish()
        assert final["tokens"] == want
        assert len(final["confs"]) == len(final["tokens"]) == len(
            final["times"]
        )
        assert all(0 < c <= 1 for c in final["confs"])
        assert any(e.get("partial") for e in events)
        assert lines and lines[-1].startswith("[final")
    finally:
        server.shutdown()
        server.server_close()


def test_serving_manifest_autodiscovery(tmp_path):
    """A model dir carrying serving.json (as run_corpus stage 4 writes)
    serves with the trained frontend + CMVN and no manual flags, equal to
    a by-hand pipeline given the same config; non-streamable manifests
    (melspec frontend, per-utterance CMVN) fail loudly."""
    from speech_recognition_tools_tpu.cli.serve import make_server
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        OnlineASRPipeline,
        fdlp_config_from_frontend,
        load_manifest_cmvn,
    )

    d, model, params, vocab = _make_model_dir(tmp_path)
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

    # from_model_dir resolves frontend + CMVN from the manifest alone
    pipe = OnlineASRPipeline.from_model_dir(d)
    assert pipe.fdlp_cfg == FCFG
    np.testing.assert_allclose(pipe.cmvn_mean, mean)
    np.testing.assert_allclose(pipe.cmvn_std, std)

    # the daemon picks the same config up with no flags at all, and the
    # served result equals a by-hand pipeline with explicit cfg + CMVN
    server, port = make_server(d, max_streams=2)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        sig = _audio(5, n=7000)
        _, final = _client(port, sig)
        want = OnlineASRPipeline(model, params, fdlp_cfg=FCFG, vocab=vocab,
                                 cmvn_mean=mean, cmvn_std=std)
        want.push(sig)
        assert final["tokens"] == want.finish()
    finally:
        server.shutdown()
        server.server_close()

    # explicit flags still win over the manifest
    cfg2 = fdlp_config_from_frontend(manifest["frontend"])
    assert cfg2 == FCFG

    # loud failures: non-fdlp frontends have no streaming featgen ...
    with pytest.raises(ValueError, match="cannot be served online"):
        fdlp_config_from_frontend({"type": "melspec", "srate": 8000})
    # ... and per-utterance CMVN has no incremental equivalent
    with pytest.raises(ValueError, match="per-utterance"):
        load_manifest_cmvn(d, {"cmvn": "cmvn.npz", "cmvn_mode": "per_utt"})


def test_serve_endpointing_matches_pipeline(tmp_path):
    """Continuous mode: with {"config": {"endpoint_blanks": R}} the
    server finalizes utterances mid-stream at blank runs and restarts
    recognition on the same connection — segment-for-segment equal to
    OnlineASRPipeline with the same endpointing setting."""
    from speech_recognition_tools_tpu.cli.serve import make_server
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        OnlineASRPipeline,
    )

    d, model, params, vocab = _make_model_dir(tmp_path)
    # random-init models don't map silence to blank, so the endpoint here
    # fires wherever this fixture's CTC happens to run blank — the test
    # pins serve == pipeline segmentation, not acoustics (the exact
    # segmentation semantics are pinned at the feature level in
    # tests/test_streaming_asr.py::test_endpointing_segments_exactly)
    sig = np.concatenate([
        _audio(5), np.zeros(6000, np.float32), _audio(2, n=7000),
    ])

    # probe the largest threshold that splits this audio into >= 2
    # utterances on this fixture (deterministic: fixed seeds throughout)
    R, want_segments = None, None
    for cand in (8, 6, 5, 4, 3, 2):
        pipe = OnlineASRPipeline(model, params, fdlp_cfg=FCFG, vocab=vocab,
                                 endpoint_blanks=cand)
        for off in range(0, len(sig), 2000):
            pipe.push(sig[off : off + 2000])
        pipe.finish()
        if len(pipe.segments) >= 2:
            R, want_segments = cand, list(pipe.segments)
            break
    assert R is not None, "fixture no longer endpoints; adjust seeds"

    server, port = make_server(d, max_streams=2, fdlp_cfg=FCFG)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=120)
        f = s.makefile("rwb")
        f.write((json.dumps(
            {"config": {"endpoint_blanks": R}}
        ) + "\n").encode())
        f.flush()
        assert json.loads(f.readline())["ok"]
        endpoints = []
        for off in range(0, len(sig), 2000):
            f.write((json.dumps(
                {"pcm": [float(v) for v in sig[off : off + 2000]]}
            ) + "\n").encode())
            f.flush()
            resp = json.loads(f.readline())
            if "endpoint" in resp:
                ep = resp["endpoint"]
                endpoints.append(ep["tokens"])
                # per-token emit timestamps ride along, one per token,
                # nondecreasing seconds from the utterance start
                assert len(ep["times"]) == len(ep["tokens"])
                assert ep["times"] == sorted(ep["times"])
                # the running partial resets with the new utterance
                assert resp["partial"] == ""
        f.write((json.dumps({"eof": True}) + "\n").encode())
        f.flush()
        final = json.loads(f.readline())
        s.close()
        assert len(final["times"]) == len(final["tokens"])
        got = endpoints + ([final["tokens"]] if final["tokens"] else [])
        assert got == want_segments
        assert len(endpoints) >= 1  # at least one mid-stream final
    finally:
        server.shutdown()
        server.server_close()


def test_resolve_frontend_precedence(tmp_path):
    """resolve_frontend is the single precedence point: manifest fields
    overridden per-flag; a non-streamable manifest is fatal UNLESS the
    flags replace the whole frontend (nfilters given); no manifest falls
    back to production geometry + checkpoint feature_dim."""
    from speech_recognition_tools_tpu.cli.serve import resolve_frontend

    d = str(tmp_path / "m")
    os.makedirs(os.path.join(d, "final_avg"))
    with open(os.path.join(d, "serving.json"), "w") as f:
        json.dump({"frontend": {"type": "melspec", "srate": 8000}}, f)
    with pytest.raises(ValueError, match="cannot be served online"):
        resolve_frontend(d)
    cfg = resolve_frontend(d, {"nfilters": 8, "srate": 8000,
                               "fduration": None})
    assert cfg.nfilters == 8 and cfg.srate == 8000 and cfg.order == 150

    os.remove(os.path.join(d, "serving.json"))
    with open(os.path.join(d, "final_avg", "config.json"), "w") as f:
        json.dump({"feature_dim": 40}, f)
    cfg = resolve_frontend(d, {"fduration": 1.0})
    assert cfg.nfilters == 40 and cfg.fduration == 1.0 and cfg.srate == 16000
