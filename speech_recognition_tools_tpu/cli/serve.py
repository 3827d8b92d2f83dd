"""Online ASR serving daemon.

A TCP server around the streaming stack (infer/streaming_asr.py): each
connection is one audio stream; concurrent connections share ONE
StreamBatcher, so every scheduling round runs a single padded batched
encoder step for all active streams (the MXU sees a batch, not N tiny
calls). Featgen (StreamingFdlp) runs per connection on the host.

The reference has no serving story at all (decode is offline shell
recipes, SURVEY.md §3); this is the TPU-native deployment edge.

Wire protocol (newline-delimited JSON over TCP, one connection = one
utterance stream):
  client -> {"pcm": [float, ...]}        raw samples (any chunking)
  client -> {"eof": true}                flush and finish
  server -> {"partial": "<text so far>"} after every client chunk
  server -> {"final": "<text>", "tokens": [...], "frames": N}

Run:  srt-serve model_dir --port 8973 [--fdlp ...]
Test: tests/test_serve.py drives real sockets against a tiny model.
"""

import argparse
import json
import socketserver
import threading


def get_parser():
    p = argparse.ArgumentParser("Online ASR TCP server")
    p.add_argument("model_dir", help="train_e2e output (chunked-attention "
                                     "model: --attn_chunk > 0)")
    p.add_argument("--ckpt", default="final_avg")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8973)
    p.add_argument("--max_streams", type=int, default=8,
                   help="StreamBatcher batch rows (concurrent streams "
                        "beyond this still work; their chunks queue)")
    p.add_argument("--srate", type=int, default=16000)
    p.add_argument("--nfilters", type=int, default=None,
                   help="FDLP mel bands (default: the model's feature dim)")
    p.add_argument("--fduration", type=float, default=1.5)
    p.add_argument("--order", type=int, default=150)
    p.add_argument("--coeff_num", type=int, default=100)
    return p


class _ASRService:
    """Shared state: one batcher + per-connection featgen. The batcher is
    single-threaded by design; a lock serialises scheduling rounds (the
    batching across streams happens *inside* a round, so concurrent
    connections still share one padded step per round)."""

    def __init__(self, model, params, vocab, fdlp_cfg, max_streams):
        from speech_recognition_tools_tpu.dsp.streaming import StreamingFdlp
        from speech_recognition_tools_tpu.infer.streaming_asr import (
            StreamBatcher,
        )

        self.batcher = StreamBatcher(
            model, params, max_streams=max_streams, store_memory=False
        )
        self.vocab = vocab
        self.fdlp_cfg = fdlp_cfg
        self._mk_featgen = lambda: StreamingFdlp(fdlp_cfg)
        self.lock = threading.Lock()

    def open(self):
        with self.lock:
            sid = self.batcher.open()
        return sid, self._mk_featgen()

    def push_audio(self, sid, featgen, samples):
        feats = featgen.process(samples)
        with self.lock:
            if feats.shape[0]:
                hyp = self.batcher.push(sid, feats)
            else:
                hyp = list(self.batcher.state(sid).hyp)
        return hyp

    def finish(self, sid, featgen):
        feats = featgen.finish()
        with self.lock:
            if feats.shape[0]:
                self.batcher.push(sid, feats)
            hyp = self.batcher.finish(sid)
            frames = self.batcher.state(sid).pos
        return hyp, frames

    def text(self, tokens):
        from speech_recognition_tools_tpu.io.text import decode_tokens

        return decode_tokens(tokens, self.vocab)


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        svc: _ASRService = self.server.service  # type: ignore[attr-defined]
        sid, featgen = svc.open()
        finished = False
        try:
            for raw in self.rfile:
                msg = json.loads(raw)
                if msg.get("eof"):
                    hyp, frames = svc.finish(sid, featgen)
                    out = {"final": svc.text(hyp), "tokens": hyp,
                           "frames": int(frames)}
                    self.wfile.write((json.dumps(out) + "\n").encode())
                    self.wfile.flush()
                    finished = True
                    break
                import numpy as np

                hyp = svc.push_audio(
                    sid, featgen, np.asarray(msg["pcm"], np.float32)
                )
                self.wfile.write(
                    (json.dumps({"partial": svc.text(hyp)}) + "\n").encode()
                )
                self.wfile.flush()
        finally:
            if not finished:
                # drop a half-finished stream so its batcher slot is freed
                try:
                    svc.finish(sid, featgen)
                except Exception:
                    pass


class ASRServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, addr, service):
        super().__init__(addr, _Handler)
        self.service = service


def make_server(model_dir, ckpt="final_avg", host="127.0.0.1", port=0,
                max_streams=8, fdlp_cfg=None):
    """Build (server, bound_port); serve_forever() on the caller's thread
    (tests run it on a daemon thread)."""
    from speech_recognition_tools_tpu.cli.recog_e2e import _load
    from speech_recognition_tools_tpu.dsp.fdlp import FdlpConfig

    model, params, cfg, vocab = _load(model_dir, ckpt)
    service = _ASRService(
        model, params, vocab, fdlp_cfg or FdlpConfig(), max_streams
    )
    server = ASRServer((host, port), service)
    return server, server.server_address[1]


def main(argv=None):
    args = get_parser().parse_args(argv)
    from speech_recognition_tools_tpu.dsp.fdlp import FdlpConfig

    nf = args.nfilters
    if nf is None:
        import json as _json
        import os

        with open(os.path.join(args.model_dir, args.ckpt,
                               "config.json")) as f:
            nf = _json.load(f).get("feature_dim")
        if nf is None:
            raise SystemExit(
                "checkpoint config carries no feature_dim; pass --nfilters "
                "matching the model's input dimension"
            )
        nf = int(nf)
    fdlp_cfg = FdlpConfig(
        srate=args.srate, nfilters=nf, fduration=args.fduration,
        order=args.order, coeff_num=args.coeff_num,
    )
    server, port = make_server(
        args.model_dir, args.ckpt, args.host, args.port,
        args.max_streams, fdlp_cfg,
    )
    print(f"serving on {args.host}:{port} "
          f"(max {args.max_streams} batched streams)")
    server.serve_forever()


if __name__ == "__main__":
    main()
