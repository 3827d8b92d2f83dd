"""True online (streaming) speech recognition.

The reference toolkit has no online mode at all — every recipe decodes
offline from dumped features (SURVEY.md §3.4). This module is the
TPU-serving extension point: a `StreamingRecognizer` accepts feature
frames as they arrive (e.g. from `dsp/streaming.py::StreamingFdlp`),
runs the encoder incrementally with cached left context, and emits
incremental CTC partial hypotheses plus a final result.

Exactness contract (pinned by tests/test_streaming_asr.py): a model
whose config has `attn_chunk > 0` (chunked encoder self-attention,
models/transformer_asr.py) produces *identical* encoder output whether
run offline over the whole utterance or incrementally here:

  * `Conv2dSubsampling` is VALID (unpadded), so subsampled frame j
    depends only on input frames 4j..4j+6 — prefix-stable.
  * With the chunk mask, encoder layer l at chunk c attends only to
    chunks [c - left, c] of layer l-1, whose values were finalised when
    those chunks were current — so per-layer caches of the last
    `attn_left_chunks * attn_chunk` block-input frames reproduce the
    offline computation exactly.
  * The conformer's depthwise conv is causal in streaming configs
    (left-padded), so a per-layer tail cache of the last (kernel-1)
    conv-input frames reproduces it exactly; the very first chunk sees
    the same zero left pad as the offline causal conv.

One fixed-shape jitted step serves every chunk (the final partial chunk
rides the same program with `n_valid < chunk`; its cache updates are
discarded). Batch is 1 per recognizer — production serving batches
across streams by vmapping the same step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from speech_recognition_tools_tpu.models.transformer_asr import (
    Conv2dSubsampling,
    TransformerASRConfig,
)


def _total_subsampled(n_frames: int) -> int:
    """Total encoder frames for a finished stream of n raw feature
    frames (the VALID Conv2dSubsampling length formula)."""
    return ((n_frames - 1) // 2 - 1) // 2 if n_frames >= 7 else 0


def _blank_run_update(blank_id: int, run: int, ctc) -> int:
    """Length of the trailing consecutive run of blank-argmax frames
    after appending this chunk's CTC rows — the endpointing signal
    (subsampled frames; x4 feature frames, x40 ms at a 100 Hz frontend)."""
    ids = np.argmax(np.asarray(ctc), axis=-1)
    nonblank = np.nonzero(ids != blank_id)[0]
    if len(nonblank) == 0:
        return run + len(ids)
    return len(ids) - int(nonblank[-1]) - 1


def _greedy_extend(blank_id: int, hyp: list, last_id: int,
                   ctc_rows: np.ndarray, times: list | None = None,
                   pos0: int = 0, confs: list | None = None) -> int:
    """Incremental greedy-CTC collapse: append new non-blank,
    non-repeated argmax ids to `hyp`; returns the new last id. When
    `times` is given, the emitting subsampled-frame index (`pos0` +
    row offset; x4 feature frames) of each appended token is recorded —
    token-level timestamps with an exact definition (the first frame of
    each collapsed run). When `confs` is given, each appended token also
    records its confidence: the CTC softmax posterior of the token at
    its emitting frame (exact definition; a 1.0 means the frame's whole
    probability mass was on this token)."""
    ids = np.argmax(ctc_rows, axis=-1)
    if confs is not None and len(ids):
        rows = np.asarray(ctc_rows, np.float64)
        # log-softmax the argmax logit per frame (stable; only the
        # emitting frames' values are consumed)
        mx = rows.max(axis=-1)
        lse = mx + np.log(np.exp(rows - mx[:, None]).sum(axis=-1))
        probs = np.exp(rows[np.arange(len(ids)), ids] - lse)
    for i, t in enumerate(ids):
        if t != blank_id and t != last_id:
            hyp.append(int(t))
            if times is not None:
                times.append(pos0 + i)
            if confs is not None:
                confs.append(float(probs[i]))
        last_id = int(t)
    return last_id


def _check_frames(frames) -> np.ndarray:
    frames = np.asarray(frames, np.float32)
    if frames.ndim != 2:
        raise ValueError(f"push expects (T, D) features; got {frames.shape}")
    return frames


def _posenc_rows(pos0: int, n: int, dim: int) -> np.ndarray:
    """Rows [pos0, pos0+n) of the sinusoidal table — computed on the host
    per chunk so streams have NO position cap (a fixed in-jit table would
    silently clamp and break offline parity on long streams). Delegates
    to the offline model's own constructor so the streamed-vs-offline
    exactness contract is structural, not two copies kept in lockstep."""
    from speech_recognition_tools_tpu.models.transformer_asr import (
        posenc_host,
    )

    return posenc_host(n, dim, pos0=pos0)


class _StreamMHABlock(nn.Module):
    """_MHABlock's encoder form computing only the new chunk's queries
    against cached left context + the chunk itself. Module names mirror
    _MHABlock's @nn.compact auto-names (LayerNorm_0,
    MultiHeadDotProductAttention_0, LayerNorm_1, Dense_0, Dense_1) so
    the SAME layer_i param subtrees apply (the _RingMHABlock pattern)."""

    cfg: TransformerASRConfig
    ff_dim: int

    @nn.compact
    def __call__(self, x_new, kv_raw, kv_mask):
        c = self.cfg
        ln0 = nn.LayerNorm(name="LayerNorm_0", dtype=c.cdtype)
        q = ln0(x_new)
        kvn = ln0(kv_raw)
        h = nn.MultiHeadDotProductAttention(
            num_heads=c.aheads, qkv_features=c.adim, dropout_rate=0.0,
            deterministic=True, name="MultiHeadDotProductAttention_0",
            dtype=c.cdtype,
        )(q, kvn, mask=kv_mask)
        x = x_new + h
        h = nn.LayerNorm(name="LayerNorm_1", dtype=c.cdtype)(x)
        h = nn.Dense(self.ff_dim, name="Dense_0", dtype=c.cdtype)(h)
        h = nn.relu(h)
        h = nn.Dense(c.adim, name="Dense_1", dtype=c.cdtype)(h)
        return x + h


class _StreamConformerBlock(nn.Module):
    """_ConformerBlock's streaming form. Attention context is the cached
    post-ffn1 sequence; the causal depthwise conv consumes a cached
    (kernel-1)-frame tail of the post-GLU conv input, so VALID conv over
    [tail | new] equals the offline causal (left-padded) conv. Returns
    (block_out, x_mid_new, conv_in_new) — the latter two feed the cache
    updates. Module names mirror _ConformerBlock's explicit names."""

    cfg: TransformerASRConfig
    ff_dim: int

    def _ffn(self, x, name):
        c = self.cfg
        h = nn.LayerNorm(name=f"{name}_norm", dtype=c.cdtype)(x)
        h = nn.Dense(self.ff_dim, name=f"{name}_in", dtype=c.cdtype)(h)
        h = nn.swish(h)
        return nn.Dense(c.adim, name=f"{name}_out", dtype=c.cdtype)(h)

    @nn.compact
    def __call__(self, x_new, attn_cache, conv_tail, kv_mask, valid_new):
        # valid_new: (B, chunk) — per-stream validity of the new frames
        c = self.cfg
        x = x_new + 0.5 * self._ffn(x_new, "ffn1")  # x_mid (new chunk)
        x_mid = x
        mn = nn.LayerNorm(name="mhsa_norm", dtype=c.cdtype)
        q = mn(x)
        kvn = mn(jnp.concatenate([attn_cache, x], axis=1))
        h = nn.MultiHeadDotProductAttention(
            num_heads=c.aheads, qkv_features=c.adim, dropout_rate=0.0,
            deterministic=True, name="mhsa", dtype=c.cdtype,
        )(q, kvn, mask=kv_mask)
        x = x + h
        h = nn.LayerNorm(name="conv_norm", dtype=c.cdtype)(x)
        h = h * valid_new[:, :, None].astype(h.dtype)
        h = nn.Dense(2 * c.adim, name="conv_pointwise_in",
                     dtype=c.cdtype)(h)
        h = nn.glu(h, axis=-1)
        conv_in = h
        h = nn.Conv(
            c.adim, (c.conv_kernel,), feature_group_count=c.adim,
            padding="VALID", name="conv_depthwise", dtype=c.cdtype,
        )(jnp.concatenate([conv_tail, h], axis=1))
        h = nn.LayerNorm(name="conv_mid_norm", dtype=c.cdtype)(h)
        h = nn.swish(h)
        h = nn.Dense(c.adim, name="conv_pointwise_out", dtype=c.cdtype)(h)
        x = x + h
        x = x + 0.5 * self._ffn(x, "ffn2")
        return nn.LayerNorm(name="final_norm", dtype=c.cdtype)(x), \
            x_mid, conv_in


def make_stream_step(model, params):
    """Build the jitted per-chunk encoder step (batched over streams).

    step(x_slice, pe_rows, n_valid, update, caches) ->
        (enc_new, ctc_new, new_caches)

      x_slice  (B, 4*chunk+3, D) raw feature slices (zero-padded tail OK);
               each batch row is an independent stream's next chunk
      pe_rows  (B, chunk, adim) absolute positional-encoding rows per
               stream (host-computed — no stream-length cap)
      n_valid  (B,) valid subsampled frames per row (== chunk except at a
               stream's very end)
      update   (B,) bool — rows whose cache advances this round. The
               commit happens INSIDE the step (jnp.where per row), so a
               partial/idle row's cache is preserved without any host-side
               per-stream cache slicing — the whole cache tree stays
               device-resident across rounds and one dispatch serves the
               round (through a tunneled chip, per-op RPC latency is
               ~4 ms; the old gather/scatter design spent >1 s per round
               on ~220 tiny ops).
      caches   dict per layer: {"kv": (B, L, adim), "kv_valid": (B,),
               "conv": (B, kernel-1, adim)} (conv only for conformer)

    Weights are passed as a traced argument (not closure constants), so
    int8 weight-only quantized trees (infer/quantize.py) stay int8 in
    HBM: `dequantize_tree` runs inside the step and XLA fuses the
    `q * scale` into each consumer instead of constant-folding it into
    a baked f32 copy.

    One fixed (B, chunk) shape serves every scheduling round — the
    StreamBatcher pads idle rows with n_valid=0, update=False.
    """
    import flax

    from speech_recognition_tools_tpu.infer.quantize import dequantize_tree

    c = model.cfg
    if c.attn_chunk <= 0:
        raise ValueError(
            "streaming needs a chunked-attention model (cfg.attn_chunk > 0;"
            " train with train_e2e --attn_chunk)"
        )
    if c.attn_left_chunks < 0:
        raise ValueError(
            "streaming needs bounded left context (cfg.attn_left_chunks"
            " >= 0); unbounded caches cannot be static-shaped"
        )
    chunk = c.attn_chunk
    L = c.attn_left_chunks * chunk
    p_full = flax.core.unfreeze(params)["params"]
    # only the subtrees the step reads ride along as arguments
    p_dev = jax.device_put(
        {"encoder": p_full["encoder"], "ctc_head": p_full["ctc_head"]}
    )
    conformer = c.encoder_type == "conformer"
    block = (
        _StreamConformerBlock(c, c.eunits)
        if conformer
        else _StreamMHABlock(c, c.eunits)
    )

    @jax.jit
    def _step(p, x_slice, pe_rows, n_valid, update, caches):
        p = dequantize_tree(p)  # structural no-op on unquantized trees
        enc_p = p["encoder"]
        B = x_slice.shape[0]
        h, _ = Conv2dSubsampling(c.adim, dtype=c.cdtype).apply(
            {"params": enc_p["embed"]}, x_slice,
            jnp.full((B,), x_slice.shape[1], jnp.int32),
        )  # (B, chunk, adim) — VALID makes these exactly the offline frames
        # cast the host posenc rows to the compute dtype so bf16
        # activations are not promoted back to f32 (matches offline
        # _embed_scale; exact no-op at the default f32)
        h = h * float(np.sqrt(c.adim)) + pe_rows.astype(h.dtype)
        valid_new = jnp.arange(chunk)[None, :] < n_valid[:, None]  # (B, c)
        up_row = update[:, None, None]
        new_caches = {}
        for i in range(c.elayers):
            cache = caches[f"layer_{i}"]
            kv_valid = cache["kv_valid"]
            # keys: [L cached | chunk new]; cached key j valid iff
            # j >= L - kv_valid; new keys masked by n_valid. Full
            # attention within the chunk (the offline chunk-mask rule).
            key_mask = jnp.concatenate(
                [jnp.arange(L)[None, :] >= (L - kv_valid)[:, None],
                 valid_new],
                axis=1,
            )
            kv_mask = key_mask[:, None, None, :]
            if conformer:
                out, x_mid, conv_in = block.apply(
                    {"params": enc_p[f"layer_{i}"]}, h, cache["kv"],
                    cache["conv"], kv_mask, valid_new,
                )
                new_conv = jnp.concatenate([cache["conv"], conv_in], axis=1)[
                    :, -(c.conv_kernel - 1):
                ]
                kv_src = x_mid
            else:
                kv_raw = jnp.concatenate([cache["kv"], h], axis=1)
                out = block.apply(
                    {"params": enc_p[f"layer_{i}"]}, h, kv_raw, kv_mask
                )
                new_conv = None
                kv_src = h
            nc = {
                "kv": jnp.where(
                    up_row,
                    jnp.concatenate([cache["kv"], kv_src], axis=1)[:, -L:],
                    cache["kv"],
                )
                if L
                else cache["kv"],
                "kv_valid": jnp.where(
                    update, jnp.minimum(kv_valid + chunk, L), kv_valid
                ),
            }
            if new_conv is not None:
                nc["conv"] = jnp.where(up_row, new_conv, cache["conv"])
            new_caches[f"layer_{i}"] = nc
            h = out
        h = nn.LayerNorm(dtype=c.cdtype).apply(
            {"params": enc_p["after_norm"]}, h
        )
        ctc = nn.Dense(c.vocab_size).apply({"params": p["ctc_head"]}, h)
        return h, ctc, new_caches

    def step(x_slice, pe_rows, n_valid, update, caches):
        return _step(p_dev, x_slice, pe_rows, n_valid, update, caches)

    def init_caches(batch: int = 1):
        # caches hold block activations: in bf16 mode they are bf16
        # (half the per-stream HBM), which also keeps the jitted step's
        # input signature stable across rounds (concat of bf16 cache
        # with bf16 activations stays bf16)
        cdt = c.cdtype or jnp.float32
        caches = {}
        for i in range(c.elayers):
            entry = {
                "kv": jnp.zeros((batch, L, c.adim), cdt),
                "kv_valid": jnp.zeros((batch,), jnp.int32),
            }
            if conformer:
                entry["conv"] = jnp.zeros(
                    (batch, c.conv_kernel - 1, c.adim), cdt
                )
            caches[f"layer_{i}"] = entry
        return caches

    return step, init_caches


class StreamingRecognizer:
    """Online recognizer over one stream: push feature frames, read
    incremental greedy-CTC partials, `finish()` for the final text.

    A thin single-stream facade over `StreamBatcher` (max_streams=1),
    so the chunk-consume/flush arithmetic exists exactly ONCE — the
    batcher's numerics-parity tests cover this class by construction.

    After `finish()`, `self.memory` / `self.enc_len` / `self.ctc_logits`
    hold the full (streamed) encoder output — identical to the offline
    `model.encode` — so a final attention/joint rescoring pass can run
    on them (see cli/recog_e2e.py --streaming). For long-lived
    greedy-only streams pass `store_memory=False`: nothing then grows
    with stream length (the raw-feature buffer is trimmed to the
    unconsumed tail)."""

    def __init__(self, model, params, vocab=None, store_memory=True):
        self.cfg = model.cfg
        self.vocab = vocab
        self.store_memory = store_memory
        self._sb = StreamBatcher(
            model, params, max_streams=1, vocab=vocab,
            store_memory=store_memory,
        )
        self._sid = None
        self.reset()

    def reset(self):
        if self._sid is not None:
            self._sb.abort(self._sid)
        self._sid = self._sb.open()
        self.memory = None
        self.ctc_logits = None
        self.enc_len = 0

    @property
    def _st(self):
        return self._sb.state(self._sid)

    @property
    def _hyp(self):
        return self._st.hyp

    @property
    def times(self):
        """Emitting subsampled-frame index per token (x4 feature frames
        / frontend frate seconds); parallel to the hypothesis."""
        return self._st.times

    @property
    def blank_run(self):
        """Trailing blank-argmax frames (the endpointing signal)."""
        return self._st.blank_run

    @property
    def confs(self):
        """CTC posterior of each token at its emitting frame; parallel
        to the hypothesis."""
        return self._st.confs

    @property
    def chunk(self):
        return self.cfg.attn_chunk

    def push(self, frames) -> list[int]:
        """Feed (T, D) new feature frames; processes every completed
        chunk. Returns the current partial token hypothesis."""
        assert not self._st.finished, "reset() before reusing a recognizer"
        return self._sb.push(self._sid, frames)

    def finish(self) -> list[int]:
        """Flush the final partial chunk; returns the final greedy token
        hypothesis and freezes `memory`/`enc_len`/`ctc_logits`."""
        hyp = self._sb.finish(self._sid)
        st = self._st
        self.memory = st.memory
        self.ctc_logits = st.ctc_logits
        self.enc_len = st.pos
        return hyp

    def text(self, tokens=None) -> str:
        from speech_recognition_tools_tpu.io.text import decode_tokens

        if self.vocab is None:
            raise ValueError("no vocab attached")
        return decode_tokens(
            tokens if tokens is not None else list(self._hyp), self.vocab
        )

    def rescored_partial(self, model, params, cfg, **beam_kwargs):
        """Joint CTC/attention beam over the encoder frames streamed SO
        FAR — a higher-quality mid-stream partial than the greedy one
        (the decoder attends the whole available memory). Needs
        store_memory=True. After finish() this IS the final joint decode
        (recog_e2e --streaming's beam path)."""
        import jax.numpy as jnp

        from speech_recognition_tools_tpu.models.transformer_asr import (
            beam_search,
        )

        if not self.store_memory:
            raise ValueError("rescored partials need store_memory=True")
        st = self._st
        mem = np.concatenate(st.mem, axis=0) if st.mem else None
        if mem is None or mem.shape[0] == 0:
            return []
        ctc = np.concatenate(st.ctc, axis=0)
        m = jnp.asarray(mem[None])
        e = jnp.asarray([mem.shape[0]])
        c = jnp.asarray(ctc[None])
        return beam_search(
            model, params, m, e, cfg,
            encode_fn=lambda f, l: (m, e, c), **beam_kwargs,
        )


@jax.jit
def _reset_rows(caches, mask):
    """Zero the cache rows selected by mask (B,) — a fresh stream taking
    over a slot must see the offline zero left-pad (conv tail) and an
    empty attention history (kv_valid=0; kv zeroed for hygiene)."""
    def z(a):
        m = mask.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(m, jnp.zeros_like(a), a)

    return jax.tree.map(z, caches)


@jax.jit
def _get_row(caches, row):
    """Slice one cache row (leading-dim index `row`, traced) as a
    batch-1 tree — the evicted-stream save path."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, row, 1, axis=0), caches
    )


@jax.jit
def _set_row(caches, row, row_tree):
    """Write a batch-1 tree back into cache row `row` (traced) — the
    evicted-stream restore path."""
    def s(a, r):
        # all indices must share one integer dtype (x64 mode makes bare
        # Python 0s int64 while `row` arrives int32)
        idx = (row,) + (jnp.zeros_like(row),) * (a.ndim - 1)
        return jax.lax.dynamic_update_slice(a, r.astype(a.dtype), idx)

    return jax.tree.map(s, caches, row_tree)


class _StreamState:
    """Host bookkeeping for one stream inside a StreamBatcher."""

    def __init__(self, cfg):
        self.slot = None  # cache row in the batcher's device tree, or None
        self.saved = None  # host copy of the cache row while evicted
        self.buf = None
        self.buf_start = 0
        self.n_buf = 0
        self.n_consumed = 0
        self.pos = 0
        self.hyp: list[int] = []
        self.last_id = cfg.blank_id
        self.mem: list[np.ndarray] = []
        self.ctc: list[np.ndarray] = []
        self.finished = False
        self.blank_run = 0  # trailing blank-argmax frames (endpointing)
        self.times: list[int] = []  # emit frame index per token in hyp
        # CTC posterior of each token at its emitting frame — parallel
        # to hyp (serving-side confidence; exact definition in
        # _greedy_extend)
        self.confs: list[float] = []


class StreamBatcher:
    """Serve many concurrent streams on one chip.

    Each scheduling round stacks the next ready chunk of every stream
    that has one into a single fixed-shape batched encoder step
    (padded with idle rows to `max_streams`, so XLA compiles exactly one
    program) — the MXU sees a batch instead of N tiny single-stream
    calls. Per-stream results are scattered back into independent
    greedy-CTC hypotheses. Numerics are identical to a single-stream
    StreamingRecognizer (tests/test_streaming_asr.py pins it).

    The per-stream caches live in ONE device-resident batched tree;
    each live stream owns a row (`_StreamState.slot`), and the round's
    per-row commit/preserve decision happens inside the jitted step
    (`update` mask), so a round costs ONE dispatch + tiny host
    transfers — no per-stream cache gather/scatter (through a tunneled
    chip, ~220 such ops cost >1 s/round; see make_stream_step).

    Streams beyond `max_streams` still work: a slot-less ready stream
    evicts a non-ready slotted one (its row is saved to the host and
    restored when it next gets a slot). Eviction is the slow path — size
    `max_streams` to the expected concurrency.

    Usage:
        sb = StreamBatcher(model, params, max_streams=8)
        a = sb.open(); b = sb.open()
        sb.push(a, feats_a); sb.push(b, feats_b)   # buffers + schedules
        hyp_a = sb.finish(a)                        # flush one stream
    """

    def __init__(self, model, params, max_streams: int = 8, vocab=None,
                 store_memory: bool = False, defer_s: float = 0.0):
        self.cfg = model.cfg
        self.step, self._init_caches = make_stream_step(model, params)
        self.max_streams = max_streams
        self.vocab = vocab
        self.store_memory = store_memory
        # dynamic batching: with defer_s > 0, push() holds a ready chunk
        # back (up to defer_s seconds) until every live stream has one,
        # so concurrent streams pushing independently coalesce into FULL
        # batched rounds instead of one solo round per push (a solo
        # round costs the same dispatch floor as a full one). 0 = every
        # push schedules immediately (exact single-stream cadence).
        self.defer_s = float(defer_s)
        self._oldest_ready_t = None
        self._streams: dict[int, _StreamState] = {}
        # finished streams move here, so a long-running server's drain()
        # cost and memory stay bounded by the number of LIVE streams;
        # `release(sid)` drops the results
        self._finished: dict[int, _StreamState] = {}
        self._next_id = 0
        self.caches = self._init_caches(max_streams)  # device-resident
        self._slot_sid: list = [None] * max_streams  # row -> sid
        self._feat_dim = None

    def open(self) -> int:
        sid = self._next_id
        self._next_id += 1
        self._streams[sid] = _StreamState(self.cfg)
        slot = self._free_slot()
        if slot is not None:
            self._take_slot(sid, slot)
        return sid

    def release(self, sid: int) -> None:
        """Forget a finished stream's results (hyp/memory)."""
        self._finished.pop(sid, None)

    def abort(self, sid: int) -> None:
        """Drop a stream immediately — no tail flush, results discarded,
        slot freed (a disconnected client / a recognizer reset)."""
        if self._finished.pop(sid, None) is not None:
            return
        st = self._streams.pop(sid, None)
        if st is not None and st.slot is not None:
            self._slot_sid[st.slot] = None

    @property
    def chunk(self):
        return self.cfg.attn_chunk

    # -- slot management -------------------------------------------------

    def _free_slot(self):
        try:
            return self._slot_sid.index(None)
        except ValueError:
            return None

    def _take_slot(self, sid: int, slot: int):
        st = self._streams[sid]
        self._slot_sid[slot] = sid
        st.slot = slot
        if st.saved is not None:  # evicted earlier: restore its row
            self.caches = _set_row(
                self.caches, jnp.int32(slot),
                jax.tree.map(jnp.asarray, st.saved),
            )
            st.saved = None
        else:  # fresh stream: zero the row (stale cache from a past owner)
            mask = np.zeros((self.max_streams,), bool)
            mask[slot] = True
            self.caches = _reset_rows(self.caches, jnp.asarray(mask))

    def _drop_slot(self, sid: int, save: bool):
        st = self._streams[sid]
        if st.slot is None:
            return
        if save:
            st.saved = jax.device_get(
                _get_row(self.caches, jnp.int32(st.slot))
            )
        self._slot_sid[st.slot] = None
        st.slot = None

    def _ensure_slot(self, sid: int):
        """Give `sid` a cache row, evicting a non-ready slotted stream if
        the tree is full (save/restore round-trips the row via the host —
        the oversubscription slow path)."""
        st = self._streams[sid]
        if st.slot is not None:
            return
        slot = self._free_slot()
        if slot is None:
            victims = [
                s for s in self._slot_sid
                if s is not None and s != sid
            ]
            not_ready = [
                s for s in victims if not self._ready(self._streams[s])
            ]
            victim = (not_ready or victims)[0]
            self._drop_slot(victim, save=True)
            slot = self._free_slot()
        self._take_slot(sid, slot)

    # -- scheduling ------------------------------------------------------

    def _ready(self, st: _StreamState) -> bool:
        return st.n_buf >= st.n_consumed + 4 * self.chunk + 3

    def _slice(self, st: _StreamState, length):
        lo = st.n_consumed - st.buf_start
        sl = st.buf[lo : lo + length]
        if sl.shape[0] < length:
            sl = np.pad(sl, ((0, length - sl.shape[0]), (0, 0)))
        return sl

    def _run_round(self, jobs):
        """jobs: list of (sid, n_valid), each sid holding a slot. Runs ONE
        batched step; idle rows ride along with n_valid=0, update=False."""
        B = self.max_streams
        assert jobs and len(jobs) <= B
        chunk, adim = self.chunk, self.cfg.adim
        D = self._feat_dim
        x = np.zeros((B, 4 * chunk + 3, D), np.float32)
        pe = np.zeros((B, chunk, adim), np.float32)
        nv = np.zeros((B,), np.int32)
        up = np.zeros((B,), bool)
        rows = []
        for sid, n_valid in jobs:
            st = self._streams[sid]
            r = st.slot
            x[r] = self._slice(st, 4 * chunk + 3)
            pe[r] = _posenc_rows(st.pos, chunk, adim)
            nv[r] = n_valid
            up[r] = n_valid == chunk  # partial tails don't advance caches
            rows.append((sid, r, n_valid))
        h, ctc, self.caches = self.step(
            jnp.asarray(x), jnp.asarray(pe), jnp.asarray(nv),
            jnp.asarray(up), self.caches,
        )
        ctc = np.asarray(ctc)
        h = np.asarray(h) if self.store_memory else None
        for sid, r, n_valid in rows:
            st = self._streams[sid]
            row_ctc = ctc[r, :n_valid]
            if self.store_memory:
                st.mem.append(h[r, :n_valid])
                st.ctc.append(row_ctc)
            st.pos += int(n_valid)
            st.n_consumed += 4 * chunk
            st.last_id = _greedy_extend(
                self.cfg.blank_id, st.hyp, st.last_id, row_ctc,
                st.times, st.pos - int(n_valid), confs=st.confs,
            )
            st.blank_run = _blank_run_update(
                self.cfg.blank_id, st.blank_run, row_ctc
            )
            # trim consumed frames (bounded buffers, as in the
            # single-stream recognizer)
            take = min(st.n_consumed - st.buf_start, st.buf.shape[0])
            if take > 0:
                st.buf = st.buf[take:]
                st.buf_start += take

    def push(self, sid: int, frames) -> list[int]:
        """Buffer frames for stream `sid` and run scheduling rounds while
        any stream has a completed chunk ready."""
        st = self._streams[sid]
        assert not st.finished, "stream already finished"
        frames = _check_frames(frames)
        if st.buf is not None and frames.shape[1] != st.buf.shape[1]:
            raise ValueError(
                f"stream {sid}: feature dim changed "
                f"{st.buf.shape[1]} -> {frames.shape[1]}"
            )
        # all streams share one batched round buffer — a mismatched dim
        # must fail THIS push, not blow up a later round mid-flight
        if self._feat_dim is not None and frames.shape[1] != self._feat_dim:
            raise ValueError(
                f"stream {sid}: feature dim {frames.shape[1]} != the "
                f"batcher's established dim {self._feat_dim}"
            )
        st.buf = (
            frames if st.buf is None else np.concatenate([st.buf, frames])
        )
        st.n_buf += frames.shape[0]
        if self._feat_dim is None:
            self._feat_dim = int(st.buf.shape[1])
        self._maybe_drain()
        return list(st.hyp)

    def _maybe_drain(self):
        """Dynamic-batching gate: drain now unless deferral is on and
        waiting (bounded by defer_s) could coalesce more streams into
        the round."""
        if self.defer_s <= 0:
            self.drain()
            return
        import time as _time

        live = [
            st for st in self._streams.values() if not st.finished
        ]
        n_ready = sum(1 for st in live if self._ready(st))
        if n_ready == 0:
            self._oldest_ready_t = None
            return
        if self._oldest_ready_t is None:
            self._oldest_ready_t = _time.time()
        if (
            n_ready >= min(len(live), self.max_streams)
            or _time.time() - self._oldest_ready_t >= self.defer_s
        ):
            self.drain()
            self._oldest_ready_t = None

    def drain(self):
        """Process every ready chunk across all live streams, batching up
        to max_streams chunks per round. Ready slot-less streams acquire
        slots (evicting non-ready holders) between rounds."""
        while True:
            ready = [
                sid for sid, st in self._streams.items()
                if not st.finished and self._ready(st)
            ]
            if not ready:
                return
            for sid in ready:
                st = self._streams[sid]
                if st.slot is not None:
                    continue
                slot = self._free_slot()
                if slot is not None:
                    self._take_slot(sid, slot)
                    continue
                # full: only evict non-ready holders (ready holders run
                # this round and may stop being ready, freeing rows)
                holders = [s for s in self._slot_sid if s is not None]
                not_ready = [
                    s for s in holders
                    if not self._ready(self._streams[s])
                ]
                if not_ready:
                    self._drop_slot(not_ready[0], save=True)
                    self._take_slot(sid, self._free_slot())
            jobs = [
                (sid, self.chunk) for sid in ready
                if self._streams[sid].slot is not None
            ]
            self._run_round(jobs)

    def _flush_tail(self, sid: int):
        """Drain queued rounds, then run stream `sid`'s buffered tail
        through partial rounds (n_valid <= chunk) until every subsampled
        frame is consumed. The single flush implementation shared by
        finish() and restart() — the tail arithmetic must not diverge
        between ended and endpointed streams."""
        st = self._streams[sid]
        self.drain()
        total_sub = _total_subsampled(st.n_buf)
        if total_sub - st.pos > 0:
            self._ensure_slot(sid)
        while total_sub - st.pos > 0:
            n = min(total_sub - st.pos, self.chunk)
            self._run_round([(sid, n)])

    def finish(self, sid: int) -> list[int]:
        """Flush stream `sid` (its partial tail rides a normal round with
        n_valid < chunk; its cache row is not advanced), free its row and
        move it to the finished set (drop with release())."""
        if sid in self._finished:
            return list(self._finished[sid].hyp)
        st = self._streams[sid]
        self._flush_tail(sid)
        st.finished = True
        adim = self.cfg.adim
        st.memory = (
            np.concatenate(st.mem, axis=0) if st.mem
            else np.zeros((0, adim), np.float32)
        )
        st.ctc_logits = (
            np.concatenate(st.ctc, axis=0) if st.ctc
            else np.zeros((0, self.cfg.vocab_size), np.float32)
        )
        st.buf = None
        self._drop_slot(sid, save=False)
        st.saved = None
        self._finished[sid] = self._streams.pop(sid)
        return list(st.hyp)

    def restart(self, sid: int) -> tuple[list[int], list[int], list[float]]:
        """Finalize stream `sid`'s current utterance in place and reset
        its row for continued audio (endpointing): flushes the buffered
        tail exactly like finish() — which can still emit tokens, so the
        (tokens, times, confs) are taken AFTER the flush — and reinitializes
        caches/buffers so subsequent push() calls start a fresh utterance
        on the same stream id. Called at a detected endpoint
        (st.blank_run >= threshold), so the handful of raw frames below
        one subsampling step that a flush cannot consume are trailing
        silence and are safely dropped."""
        st = self._streams[sid]
        self._flush_tail(sid)
        slot = st.slot
        if slot is not None:
            self._slot_sid[slot] = None
        self._streams[sid] = _StreamState(self.cfg)
        if slot is not None:
            self._take_slot(sid, slot)  # fresh state: zeroes the row
        return list(st.hyp), list(st.times), list(st.confs)

    def state(self, sid: int) -> _StreamState:
        return self._streams.get(sid) or self._finished[sid]


def read_serving_manifest(model_dir):
    """Load `<model_dir>/serving.json` (or None if absent).

    The manifest is written by `recipes/run_corpus.py` stage 4 for the
    e2e branch and records the exact frontend geometry the model was
    trained on plus its global-CMVN stats file — the handoff that makes
    a trained corpus model directly servable by `srt-serve` /
    `OnlineASRPipeline.from_model_dir` with no manual flags.
    Shape: {"frontend": {<featgen config section>}, "cmvn": "cmvn.npz" |
    null, "cmvn_mode": "global" | "per_utt" | "none"}.
    """
    import json as _json
    import os

    path = os.path.join(model_dir, "serving.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return _json.load(f)


def fdlp_config_from_frontend(fe):
    """Map a corpus config `frontend` section to an FdlpConfig.

    Only the fdlp frontend has a streaming implementation
    (dsp/streaming.py); serving a melspec/mfcc/modspec-trained model
    online is a config error, reported loudly.
    """
    import dataclasses

    from speech_recognition_tools_tpu.dsp.fdlp import FdlpConfig

    typ = fe.get("type", "fdlp")
    if typ != "fdlp":
        raise ValueError(
            f"streaming featgen exists only for the fdlp frontend; this "
            f"model was trained on '{typ}' features and cannot be served "
            f"online"
        )
    fields = {f.name for f in dataclasses.fields(FdlpConfig)}
    kw = {k: v for k, v in fe.items() if k in fields}
    if isinstance(kw.get("lifter_config"), list):
        kw["lifter_config"] = tuple(kw["lifter_config"])
    return FdlpConfig(**kw)


def load_manifest_cmvn(model_dir, manifest):
    """Resolve the manifest's CMVN stats to (mean, std) float32 arrays.

    Returns None for CMVN-free models; raises for per-utterance CMVN,
    which needs the whole utterance up front and therefore has no
    streaming equivalent (the offline recog path handles it).
    """
    import os

    mode = manifest.get(
        "cmvn_mode", "global" if manifest.get("cmvn") else "none"
    )
    if mode == "per_utt":
        raise ValueError(
            "model was trained with per-utterance CMVN, which cannot be "
            "computed incrementally; retrain with egs.cmvn='global' to "
            "serve online, or pass explicit global stats to override"
        )
    rel = manifest.get("cmvn")
    if not rel:
        return None
    blob = np.load(os.path.join(model_dir, rel))
    return (
        np.asarray(blob["mean"], np.float32),
        np.asarray(blob["std"], np.float32),
    )


def apply_cmvn(feats, mean=None, std=None):
    """Global CMVN on a (T, D) feature block (no-op on empty input or
    absent stats). The single normalization used by every serving
    consumer — OnlineASRPipeline and srt-serve's batched service must
    normalize identically or their transcripts diverge."""
    if feats.shape[0] == 0:
        return feats
    if mean is not None:
        feats = feats - mean[None, :]
    if std is not None:
        feats = feats / std[None, :]
    return feats


def endpoint_due(endpoint_blanks: int, blank_run: int, hyp) -> bool:
    """The endpoint predicate (trailing blank run long enough AND the
    current utterance is non-empty), shared by OnlineASRPipeline and
    srt-serve so the two serving paths segment identically."""
    return endpoint_blanks > 0 and bool(hyp) and blank_run >= endpoint_blanks


class OnlineASRPipeline:
    """The complete online serving path: raw audio samples in, text out.

    Composes `dsp/streaming.py::StreamingFdlp` (chunked FDLP featgen,
    batch-identical) with `StreamingRecognizer` (incremental chunked-
    attention encoder, offline-identical), plus optional global CMVN —
    i.e. the reference's wav -> computeFDLPSpectrogram -> apply-cmvn ->
    model chain (SURVEY.md §3.1/§3.2), running incrementally with
    bounded latency. End-to-end latency = one FDLP analysis window
    (cfg.fduration * overlap, inherent to the front-end) + one encoder
    attention chunk.
    """

    @classmethod
    def from_model_dir(cls, model_dir, ckpt="final_avg",
                       block_frames: int = 8, int8: bool = False,
                       **kwargs):
        """Build the full pipeline from a trained model directory alone.

        Reads the `serving.json` manifest that `recipes/run_corpus.py`
        stage 4 writes next to the checkpoints (frontend geometry +
        global CMVN stats), so deployment needs no side-channel config —
        the model dir is self-describing. Falls back to FdlpConfig()
        defaults and no CMVN when no manifest exists (hand-built dirs).
        int8=True quantizes the encoder weights (infer/quantize.py).
        """
        from speech_recognition_tools_tpu.cli.recog_e2e import _load

        model, params, _cfg, vocab = _load(model_dir, ckpt)
        if int8:
            from speech_recognition_tools_tpu.infer.quantize import (
                quantize_encoder,
            )

            params = quantize_encoder(params)
        manifest = read_serving_manifest(model_dir)
        fdlp_cfg, mean, std = None, None, None
        if manifest is not None:
            fdlp_cfg = fdlp_config_from_frontend(
                manifest.get("frontend", {})
            )
            cmvn = load_manifest_cmvn(model_dir, manifest)
            if cmvn is not None:
                mean, std = cmvn
        return cls(model, params, fdlp_cfg=fdlp_cfg, vocab=vocab,
                   cmvn_mean=mean, cmvn_std=std, block_frames=block_frames,
                   **kwargs)

    def __init__(self, model, params, fdlp_cfg=None, vocab=None,
                 cmvn_mean=None, cmvn_std=None, block_frames: int = 8,
                 endpoint_blanks: int = 0, store_memory: bool = True):
        from speech_recognition_tools_tpu.dsp.fdlp import FdlpConfig
        from speech_recognition_tools_tpu.dsp.streaming import StreamingFdlp

        self.fdlp_cfg = fdlp_cfg or FdlpConfig()
        self._mk_featgen = lambda: StreamingFdlp(
            self.fdlp_cfg, block_frames=block_frames
        )
        # store_memory=False bounds recognizer memory on hour-long audio
        # (greedy tokens only — no encoder memory for a final beam pass)
        self.recognizer = StreamingRecognizer(
            model, params, vocab=vocab, store_memory=store_memory
        )
        self.cmvn_mean = (
            np.asarray(cmvn_mean, np.float32) if cmvn_mean is not None
            else None
        )
        self.cmvn_std = (
            np.asarray(cmvn_std, np.float32) if cmvn_std is not None else None
        )
        # endpointing: finalize the current utterance once the trailing
        # blank run reaches this many subsampled frames (x4 feature
        # frames; 0 = off). Segments collect in self.segments; the
        # featgen keeps running across the boundary, only the recognizer
        # restarts, so continuous audio yields one final per utterance.
        self.endpoint_blanks = int(endpoint_blanks)
        self.reset()

    def reset(self):
        self.featgen = self._mk_featgen()
        self.recognizer.reset()
        self.segments: list[list[int]] = []
        # per-segment token emit times (subsampled frames, segment-
        # relative) and per-token confidences, parallel to self.segments
        self.segment_times: list[list[int]] = []
        self.segment_confs: list[list[float]] = []
        self.frames_fed = 0  # feature frames fed to the CURRENT segment
        # absolute feature-frame index at which each finished segment's
        # recognizer started (parallel to self.segments); token times are
        # recognizer-relative, so absolute seconds =
        # segment_start_frames[k]/frate + times[k][i]*4/frate
        self.segment_start_frames: list[int] = []
        self.total_frames_fed = 0
        self._cur_seg_start = 0

    def _maybe_endpoint(self):
        """Close the current utterance at a detected endpoint: flush the
        recognizer (trailing frames are blank by construction), record
        the segment, and restart the recognizer on the running featgen."""
        if endpoint_due(self.endpoint_blanks, self.recognizer.blank_run,
                        self.recognizer._hyp):
            self.segments.append(self.recognizer.finish())
            self.segment_times.append(list(self.recognizer.times))
            self.segment_confs.append(list(self.recognizer.confs))
            self.segment_start_frames.append(self._cur_seg_start)
            self.recognizer.reset()
            self.frames_fed = 0
            self._cur_seg_start = self.total_frames_fed
            return True
        return False

    def _norm(self, feats):
        return apply_cmvn(feats, self.cmvn_mean, self.cmvn_std)

    def push(self, samples) -> list[int]:
        """Feed raw audio samples; returns the current partial tokens
        (of the current utterance when endpointing is on — finished
        segments accumulate in self.segments)."""
        feats = self.featgen.process(samples)
        if feats.shape[0]:
            self.frames_fed += feats.shape[0]
            self.total_frames_fed += feats.shape[0]
            hyp = self.recognizer.push(self._norm(feats))
        else:
            hyp = self.recognizer.push(
                np.zeros((0, feats.shape[1]), np.float32)
            )
        if self._maybe_endpoint():
            return []
        return hyp

    def finish(self) -> list[int]:
        """Flush featgen + encoder; returns the final utterance's greedy
        tokens (with endpointing on, the last segment — earlier segments
        are in self.segments). The full streamed encoder output of that
        utterance is on `self.recognizer` for a final joint/beam pass."""
        feats = self.featgen.finish()
        if feats.shape[0]:
            self.frames_fed += feats.shape[0]
            self.total_frames_fed += feats.shape[0]
            self.recognizer.push(self._norm(feats))
        hyp = self.recognizer.finish()
        if self.endpoint_blanks > 0 and hyp:
            self.segments.append(hyp)
            self.segment_times.append(list(self.recognizer.times))
            self.segment_confs.append(list(self.recognizer.confs))
            self.segment_start_frames.append(self._cur_seg_start)
        return hyp

    def text(self) -> str:
        return self.recognizer.text()
