"""End-to-end CTC/attention transformer ASR.

The reference trains its headline models with ESPnet's
e2e_asr_transformer (e2e/wsj/run_fdlp_e1.sh:405-447, conf/train.yaml:
12 encoder / 6 decoder layers, adim 256, 4 heads, ff 2048, mtlalpha 0.3,
label smoothing 0.1, conv2d subsampling, noam schedule). This module is the
TPU-native equivalent: a Flax transformer with conv2d 4x subsampling,
joint CTC(0.3)/attention(0.7) loss with label smoothing, Noam LR schedule,
batched greedy + beam-search decoding with optional RNNLM shallow fusion,
checkpoint averaging, and the continual-learning multi-model decode
(asr_recog --api cl, run_cl_2stream.sh:250-254) as PM-weighted model-score
fusion.

TPU-first: static-shape decode loops via lax.scan over a max-length budget
with finished-beam masking; all scoring is batched over (beams x models).
"""

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


@dataclass(frozen=True)
class TransformerASRConfig:
    vocab_size: int = 52  # chars incl. <blank>=0, <sos/eos>=vocab-1
    adim: int = 256
    aheads: int = 4
    elayers: int = 12
    eunits: int = 2048
    dlayers: int = 6
    dunits: int = 2048
    dropout: float = 0.1
    mtlalpha: float = 0.3  # CTC weight in the joint loss
    lsm_weight: float = 0.1
    # 'transformer' (the reference's ESPnet encoder) or 'conformer'
    # (beyond-reference: macaron FFN halves + MHSA + depthwise-conv
    # module; LayerNorm replaces BatchNorm in the conv module so the
    # model stays stateless under jit)
    encoder_type: str = "transformer"
    conv_kernel: int = 15  # conformer depthwise conv width
    # Streaming-compatible chunked encoder self-attention (beyond
    # reference — the reference has no online mode at all): each
    # post-subsampling frame attends within its chunk of `attn_chunk`
    # frames plus `attn_left_chunks` chunks of left context
    # (-1 = unbounded left). 0 disables (full attention). Applies to
    # every encoder consumer that builds blocks from this config
    # (offline encode, the pipelined loss); infer/streaming_asr.py
    # runs the equivalent computation incrementally with cached
    # context for true online serving. With encoder_type='conformer'
    # the depthwise conv becomes causal so chunked decode stays exact.
    attn_chunk: int = 0
    attn_left_chunks: int = -1
    # Mixed precision (TPU-first; beyond reference — the reference
    # trains f32 single-GPU): 'bfloat16' runs every matmul/attention/
    # conv in bf16 on the MXU while parameters (and the optimizer
    # state) stay f32 master weights — the flax `dtype=` idiom, so
    # checkpoints are layout-identical to f32 ones. The two logit
    # heads (ctc_head, decoder output) always compute in f32, so
    # log_softmax/CTC stay numerically stable and every decode path
    # is unchanged. bf16 needs no loss scaling (f32-range exponent).
    compute_dtype: str = "float32"

    @property
    def cdtype(self):
        """flax `dtype=` argument: None (promotion semantics, exactly
        the pre-mixed-precision behavior) for float32."""
        if self.compute_dtype == "float32":
            return None
        return jnp.dtype(self.compute_dtype)

    @property
    def blank_id(self):
        return 0

    @property
    def sos_id(self):
        return self.vocab_size - 1

    @property
    def eos_id(self):
        return self.vocab_size - 1


def chunk_attention_mask(T: int, chunk: int, left_chunks: int = -1):
    """(T, T) bool mask for chunked streaming self-attention: query frame
    t (chunk c = t // chunk) may attend keys in chunks [c - left, c] —
    full attention within the chunk (incl. its own future frames, the
    standard streaming-chunk convention), no look-ahead past it."""
    c = np.arange(T) // chunk
    allowed = c[None, :] <= c[:, None]
    if left_chunks >= 0:
        allowed &= c[None, :] >= c[:, None] - left_chunks
    return jnp.asarray(allowed)


def posenc_host(length, dim, pos0=0):
    """Rows [pos0, pos0+length) of the sinusoidal table as float32
    numpy — the ONE construction shared by the offline encoder/decoder
    and the streaming step (infer/streaming_asr.py), whose exactness
    contract requires byte-identical tables."""
    pos = np.arange(pos0, pos0 + length)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-np.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def _posenc(length, dim, dtype=jnp.float32):
    return jnp.asarray(posenc_host(length, dim), dtype)


def _embed_scale(h, c):
    """sqrt(adim)-scaled embedding + sinusoidal positions, in h's own
    dtype (a Python-float scale and a cast posenc table, so bf16
    activations are not silently promoted back to f32)."""
    return h * float(np.sqrt(c.adim)) + _posenc(h.shape[1], c.adim,
                                                h.dtype)[None]


class _MHABlock(nn.Module):
    cfg: TransformerASRConfig
    ff_dim: int
    causal: bool = False
    cross: bool = False
    decode_mode: bool = False  # flax KV-cache incremental decoding

    @nn.compact
    def __call__(self, x, mask, memory=None, memory_mask=None,
                 deterministic=True):
        c = self.cfg
        h = nn.LayerNorm(dtype=c.cdtype)(x)
        if self.decode_mode:
            # causality comes from the autoregressive cache index
            self_mask = None
        else:
            self_mask = mask[:, None, None, :]
            if self.causal:
                T = x.shape[1]
                tri = jnp.tril(jnp.ones((T, T), bool))
                self_mask = self_mask & tri[None, None]
            elif c.attn_chunk > 0:
                # encoder form: streaming chunk mask from the shared cfg,
                # so every consumer that builds blocks from the config
                # (offline encode, PP stages) applies it identically
                self_mask = self_mask & chunk_attention_mask(
                    x.shape[1], c.attn_chunk, c.attn_left_chunks
                )[None, None]
        h = nn.MultiHeadDotProductAttention(
            num_heads=c.aheads, qkv_features=c.adim,
            dropout_rate=0.0, deterministic=deterministic,
            decode=self.decode_mode, dtype=c.cdtype,
        )(h, h, mask=self_mask)
        x = x + nn.Dropout(c.dropout)(h, deterministic=deterministic)
        if self.cross:
            h = nn.LayerNorm(dtype=c.cdtype)(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=c.aheads, qkv_features=c.adim,
                dropout_rate=0.0, deterministic=deterministic,
                dtype=c.cdtype,
            )(h, memory, mask=memory_mask[:, None, None, :])
            x = x + nn.Dropout(c.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=c.cdtype)(x)
        h = nn.Dense(self.ff_dim, dtype=c.cdtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        h = nn.Dense(c.adim, dtype=c.cdtype)(h)
        return x + nn.Dropout(c.dropout)(h, deterministic=deterministic)


class _ConformerBlock(nn.Module):
    """Conformer encoder block (Gulati et al. 2020): half-weighted
    macaron FFNs around MHSA + a depthwise-conv module. Differences from
    the paper, chosen for stateless jit on TPU: LayerNorm instead of
    BatchNorm inside the conv module, and the encoder's absolute
    sinusoidal positions instead of relative position encoding."""

    cfg: TransformerASRConfig
    ff_dim: int

    def _ffn(self, x, deterministic, name):
        c = self.cfg
        h = nn.LayerNorm(name=f"{name}_norm", dtype=c.cdtype)(x)
        h = nn.Dense(self.ff_dim, name=f"{name}_in", dtype=c.cdtype)(h)
        h = nn.swish(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        h = nn.Dense(c.adim, name=f"{name}_out", dtype=c.cdtype)(h)
        return nn.Dropout(c.dropout)(h, deterministic=deterministic)

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        c = self.cfg
        attn_mask = mask[:, None, None, :]
        if c.attn_chunk > 0:
            attn_mask = attn_mask & chunk_attention_mask(
                x.shape[1], c.attn_chunk, c.attn_left_chunks
            )[None, None]
        x = x + 0.5 * self._ffn(x, deterministic, "ffn1")
        h = nn.LayerNorm(name="mhsa_norm", dtype=c.cdtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=c.aheads, qkv_features=c.adim,
            dropout_rate=0.0, deterministic=deterministic,
            name="mhsa", dtype=c.cdtype,
        )(h, h, mask=attn_mask)
        x = x + nn.Dropout(c.dropout)(h, deterministic=deterministic)
        # conv module; padded frames are zeroed first so the depthwise
        # conv cannot leak them into valid positions. In streaming mode
        # the conv is causal (left-padded) so chunked/incremental decode
        # sees no look-ahead past the chunk boundary.
        h = nn.LayerNorm(name="conv_norm", dtype=c.cdtype)(x)
        h = h * mask[..., None].astype(h.dtype)
        h = nn.Dense(2 * c.adim, name="conv_pointwise_in", dtype=c.cdtype)(h)
        h = nn.glu(h, axis=-1)
        h = nn.Conv(
            c.adim, (c.conv_kernel,), feature_group_count=c.adim,
            padding=(
                ((c.conv_kernel - 1, 0),) if c.attn_chunk > 0 else "SAME"
            ),
            name="conv_depthwise", dtype=c.cdtype,
        )(h)
        h = nn.LayerNorm(name="conv_mid_norm", dtype=c.cdtype)(h)
        h = nn.swish(h)
        h = nn.Dense(c.adim, name="conv_pointwise_out", dtype=c.cdtype)(h)
        x = x + nn.Dropout(c.dropout)(h, deterministic=deterministic)
        x = x + 0.5 * self._ffn(x, deterministic, "ffn2")
        return nn.LayerNorm(name="final_norm", dtype=c.cdtype)(x)


class Conv2dSubsampling(nn.Module):
    """ESPnet-style conv2d input layer: two stride-2 unpadded (VALID)
    convs (4x time reduction, exactly the reference ESPnet's
    torch.nn.Conv2d defaults) + linear to adim.

    VALID makes the computation *prefix-stable*: subsampled frame j
    depends only on input frames 4j..4j+6 — independent of the total
    length — so (a) batch zero-padding can never leak into valid frames
    and (b) online chunked processing (infer/streaming_asr.py) produces
    bit-identical frames to the offline pass."""

    adim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, lengths):
        B, T, D = x.shape
        if T < 7 or D < 7:
            raise ValueError(
                "Conv2dSubsampling (VALID convs) needs at least 7 frames "
                f"and 7 feature dims for one output; got (T={T}, D={D}). "
                "Pad or skip shorter utterances."
            )
        h = x[..., None]  # (B, T, D, 1)
        h = nn.relu(
            nn.Conv(self.adim, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype)(h)
        )
        h = nn.relu(
            nn.Conv(self.adim, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype)(h)
        )
        B, T2, D2, C = h.shape
        h = nn.Dense(self.adim, dtype=self.dtype)(h.reshape(B, T2, D2 * C))
        # per-utterance lengths < 7 inside a padded batch yield 0 valid
        # frames (clamped; the formula goes negative below 3)
        out_len = jnp.maximum(((lengths - 1) // 2 - 1) // 2, 0)
        return h, out_len


class TransformerEncoder(nn.Module):
    cfg: TransformerASRConfig

    @nn.compact
    def __call__(self, feats, lengths, deterministic=True):
        c = self.cfg
        h, out_len = Conv2dSubsampling(c.adim, dtype=c.cdtype,
                                       name="embed")(feats, lengths)
        h = _embed_scale(h, c)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        mask = jnp.arange(h.shape[1])[None, :] < out_len[:, None]
        for i in range(c.elayers):
            if c.encoder_type == "conformer":
                h = _ConformerBlock(c, c.eunits, name=f"layer_{i}")(
                    h, mask, deterministic=deterministic
                )
            else:
                h = _MHABlock(c, c.eunits, name=f"layer_{i}")(
                    h, mask, deterministic=deterministic
                )
        return nn.LayerNorm(name="after_norm", dtype=c.cdtype)(h), out_len


class TransformerDecoder(nn.Module):
    cfg: TransformerASRConfig

    @nn.compact
    def __call__(self, tokens, memory, memory_len, deterministic=True,
                 decode_mode=False, pos=None, pe_len=4096):
        """Full-prefix pass, or (decode_mode=True) one KV-cached step:
        tokens (K, 1) = last generated tokens, pos = their position.
        Parameters are shared between the modes (same module names);
        the flax 'cache' collection carries cached_key/cached_value.
        Initialise the cache by one decode_mode call with a full-length
        dummy under mutable=['cache'] (flax zero-creates it from the
        input shape), then step with length-1 inputs."""
        c = self.cfg
        tok_mask = tokens != -1
        h = nn.Embed(c.vocab_size, c.adim, dtype=c.cdtype, name="embed")(
            jnp.maximum(tokens, 0)
        )
        if decode_mode and h.shape[1] == 1:
            # pe_len must bound the caller's max position: jnp.take
            # clips out-of-bounds indices, which would silently reuse
            # pe[pe_len-1] and diverge from the full-prefix path
            pe = jnp.take(_posenc(pe_len, c.adim, h.dtype), pos, axis=0)
            h = h * float(np.sqrt(c.adim)) + pe[None, None, :]
        else:
            h = _embed_scale(h, c)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        mem_mask = jnp.arange(memory.shape[1])[None, :] < memory_len[:, None]
        for i in range(c.dlayers):
            h = _MHABlock(c, c.dunits, causal=True, cross=True,
                          decode_mode=decode_mode, name=f"layer_{i}")(
                h, tok_mask, memory, mem_mask, deterministic
            )
        h = nn.LayerNorm(name="after_norm", dtype=c.cdtype)(h)
        # logits always f32 (dtype=None promotes bf16 h with the f32
        # kernel): log_softmax/label-smoothing stay stable in bf16 mode
        return nn.Dense(c.vocab_size, name="output")(h)


class TransformerASR(nn.Module):
    """Joint CTC/attention model. __call__ returns (ctc_logits, dec_logits,
    enc_len) for training; `encode` / `decode_step` serve inference."""

    cfg: TransformerASRConfig

    def setup(self):
        self.encoder = TransformerEncoder(self.cfg)
        self.decoder = TransformerDecoder(self.cfg)
        self.ctc_head = nn.Dense(self.cfg.vocab_size)

    def __call__(self, feats, lengths, tokens_in, deterministic=True):
        memory, enc_len = self.encoder(feats, lengths, deterministic)
        ctc_logits = self.ctc_head(memory)
        dec_logits = self.decoder(tokens_in, memory, enc_len, deterministic)
        return ctc_logits, dec_logits, enc_len

    def encode(self, feats, lengths):
        memory, enc_len = self.encoder(feats, lengths, True)
        return memory, enc_len, self.ctc_head(memory)

    def decode_step(self, tokens, memory, enc_len):
        """Full-prefix decoder pass (scores for the last position are
        logits[:, -1]); O(T^2) per step but static-shape."""
        return self.decoder(tokens, memory, enc_len, True)

    def decode_init_cache(self, dummy_tokens, memory, enc_len):
        """Zero-create the KV cache sized by dummy_tokens (K, max_len+1):
        call under mutable=['cache'] and keep the returned collection."""
        return self.decoder(
            dummy_tokens, memory, enc_len, True, decode_mode=True
        )

    def decode_incremental(self, last_tokens, pos, memory, enc_len,
                           pe_len=4096):
        """One KV-cached decoder step: last_tokens (K, 1) at position
        `pos` -> logits (K, 1, V). O(L) per step; exact same scores as
        decode_step (tests assert token parity). pe_len must exceed the
        maximum position (the caller's max_len)."""
        return self.decoder(
            last_tokens, memory, enc_len, True, decode_mode=True, pos=pos,
            pe_len=pe_len,
        )


def _encoder_block(c: TransformerASRConfig):
    """The encoder block module for c.encoder_type — both types share
    the (x, mask) call signature, so the PP stage closures and the
    loss below are encoder-agnostic."""
    if c.encoder_type == "conformer":
        return _ConformerBlock(c, c.eunits)
    return _MHABlock(c, c.eunits)


def encode_pipelined(model, params, feats, lengths, mesh, *,
                     n_micro: int = 2, axis: str = "pipe"):
    """`TransformerASR.encode` with the encoder blocks run as GPipe
    pipeline stages (parallel/pp.py) — the long/deep-encoder scale path.

    Takes an ordinary trained checkpoint (loop-layout params): the
    elayers block parameter subtrees are stacked into S =
    mesh.shape[axis] stages of elayers/S blocks each (elayers must
    divide by S) and sharded P('pipe'), so encoder weights occupy 1/S of
    each device's HBM while embed/after_norm/ctc_head stay replicated.
    Output matches `model.apply(..., method=model.encode)` to numeric
    precision (tests/test_pipeline_parallel.py::TestEncodePipelined).
    """
    import flax

    from speech_recognition_tools_tpu.parallel.pp import (
        microbatch,
        pipeline_apply,
        pipeline_param_sharding,
        stack_pipeline_params,
        unmicrobatch,
    )
    from speech_recognition_tools_tpu.parallel.tp import shard_params

    c = model.cfg
    S = mesh.shape[axis]
    if c.elayers % S:
        raise ValueError(f"elayers {c.elayers} not divisible by {S} stages")
    per = c.elayers // S
    enc_p = flax.core.unfreeze(params)["params"]["encoder"]

    embed = Conv2dSubsampling(c.adim, dtype=c.cdtype)
    h, out_len = embed.apply({"params": enc_p["embed"]}, feats, lengths)
    h = _embed_scale(h, c)
    mask = (jnp.arange(h.shape[1])[None, :] < out_len[:, None]).astype(h.dtype)

    block = _encoder_block(c)
    chunks = [
        stack_pipeline_params(
            [{"params": enc_p[f"layer_{i * per + j}"]} for j in range(per)]
        )
        for i in range(S)
    ]
    stacked = stack_pipeline_params(chunks)  # (S, per, ...)
    stacked = shard_params(stacked, mesh, pipeline_param_sharding(mesh, axis))

    def stage(p, state):
        x, m = state
        for j in range(per):
            x = block.apply(
                jax.tree.map(lambda a: a[j], p), x, m > 0.5
            )
        return x, m

    out_h, _ = pipeline_apply(
        stage, stacked, (microbatch(h, n_micro), microbatch(mask, n_micro)),
        mesh=mesh, axis=axis,
    )
    h = unmicrobatch(out_h)
    h = nn.LayerNorm(dtype=c.cdtype).apply(
        {"params": enc_p["after_norm"]}, h
    )
    ctc = nn.Dense(c.vocab_size).apply(
        {"params": flax.core.unfreeze(params)["params"]["ctc_head"]}, h
    )
    return h, out_len, ctc


class _RingSelfAttention(nn.Module):
    """Drop-in for flax's MultiHeadDotProductAttention with the score
    computation routed through parallel/ring.py (exact sequence-parallel
    attention; K/V blocks hop the mesh's time ring). Submodule names
    (query/key/value/out) and kernel shapes match flax's exactly, so an
    ordinary trained checkpoint applies unchanged."""

    cfg: TransformerASRConfig

    @nn.compact
    def __call__(self, x, lengths, mesh, time_axis):
        from speech_recognition_tools_tpu.parallel.ring import (
            ring_attention,
        )

        c = self.cfg
        hd = c.adim // c.aheads
        dense = functools.partial(
            nn.DenseGeneral, features=(c.aheads, hd), axis=-1
        )
        q = dense(name="query")(x)
        k = dense(name="key")(x)
        v = dense(name="value")(x)
        o = ring_attention(
            q, k, v, lengths, mesh=mesh, axis=time_axis, causal=False
        )
        return nn.DenseGeneral(
            features=c.adim, axis=(-2, -1), name="out"
        )(o)


class _RingMHABlock(nn.Module):
    """_MHABlock's non-causal self-attention encoder form with ring
    attention. Module names mirror _MHABlock's @nn.compact auto-names
    (LayerNorm_0, MultiHeadDotProductAttention_0, LayerNorm_1, Dense_0,
    Dense_1) so the SAME layer_i param subtrees apply. Deterministic
    (inference path)."""

    cfg: TransformerASRConfig
    ff_dim: int

    @nn.compact
    def __call__(self, x, lengths, mesh, time_axis):
        c = self.cfg
        h = nn.LayerNorm(name="LayerNorm_0")(x)
        h = _RingSelfAttention(
            c, name="MultiHeadDotProductAttention_0"
        )(h, lengths, mesh, time_axis)
        x = x + h
        h = nn.LayerNorm(name="LayerNorm_1")(x)
        h = nn.Dense(self.ff_dim, name="Dense_0")(h)
        h = nn.relu(h)
        h = nn.Dense(c.adim, name="Dense_1")(h)
        return x + h


class _RingConformerBlock(nn.Module):
    """_ConformerBlock with the MHSA routed through the time ring.
    Module names mirror _ConformerBlock's explicit names (ffn1_*, mhsa,
    conv_*, ffn2_*, final_norm) so the SAME layer_i param subtrees
    apply; the Dropout layers are omitted (no params, identity at
    inference). The depthwise conv runs on the time-sharded layout
    under GSPMD (XLA inserts the halo exchange); its input is zeroed
    past `lengths` exactly like the unsharded block, so ring-padded
    frames cannot leak into valid positions. Deterministic (inference
    path)."""

    cfg: TransformerASRConfig
    ff_dim: int

    def _ffn(self, x, name):
        c = self.cfg
        h = nn.LayerNorm(name=f"{name}_norm")(x)
        h = nn.Dense(self.ff_dim, name=f"{name}_in")(h)
        h = nn.swish(h)
        return nn.Dense(c.adim, name=f"{name}_out")(h)

    @nn.compact
    def __call__(self, x, lengths, mesh, time_axis):
        c = self.cfg
        mask = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
        x = x + 0.5 * self._ffn(x, "ffn1")
        h = nn.LayerNorm(name="mhsa_norm")(x)
        h = _RingSelfAttention(c, name="mhsa")(h, lengths, mesh, time_axis)
        x = x + h
        h = nn.LayerNorm(name="conv_norm")(x)
        h = h * mask[..., None].astype(h.dtype)
        h = nn.Dense(2 * c.adim, name="conv_pointwise_in")(h)
        h = nn.glu(h, axis=-1)
        h = nn.Conv(
            c.adim, (c.conv_kernel,), feature_group_count=c.adim,
            padding="SAME", name="conv_depthwise",
        )(h)
        h = nn.LayerNorm(name="conv_mid_norm")(h)
        h = nn.swish(h)
        h = nn.Dense(c.adim, name="conv_pointwise_out")(h)
        x = x + h
        x = x + 0.5 * self._ffn(x, "ffn2")
        return nn.LayerNorm(name="final_norm")(x)


def encode_ring(model, params, feats, lengths, mesh, *,
                time_axis: str = "time"):
    """`TransformerASR.encode` with every encoder self-attention routed
    through ring attention (parallel/ring.py) — the long-utterance scale
    path (SURVEY §5): per-device attention memory is O(T * T/S) instead
    of O(T^2) and K/V blocks ride the ICI ring.

    Takes an ordinary trained checkpoint. The post-subsampling frame
    axis is padded to a multiple of the ring size (padded keys are
    masked by `lengths` exactly like the unsharded mask). Output matches
    `model.apply(..., method=model.encode)` to numeric precision
    (tests/test_ring_attention.py::TestEncodeRing).
    """
    import flax

    c = model.cfg
    if c.attn_chunk > 0:
        raise ValueError(
            "encode_ring does not support chunked (streaming) attention; "
            "use infer/streaming_asr.py or the offline encode"
        )
    S = mesh.shape[time_axis]
    enc_p = flax.core.unfreeze(params)["params"]["encoder"]

    # the ring blocks' modules are dtype=None (f32 promotion with the
    # f32 master weights), so encode_ring always computes f32 — keep
    # the stem f32 too regardless of cfg.compute_dtype
    h, out_len = Conv2dSubsampling(c.adim).apply(
        {"params": enc_p["embed"]}, feats, lengths
    )
    h = h * float(np.sqrt(c.adim)) + _posenc(h.shape[1], c.adim)[None]
    T = h.shape[1]
    Tp = -(-T // S) * S
    h = jnp.pad(h, ((0, 0), (0, Tp - T), (0, 0)))
    h = jax.lax.with_sharding_constraint(
        h, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, time_axis, None)
        ),
    )
    ring_cls = (_RingConformerBlock if c.encoder_type == "conformer"
                else _RingMHABlock)
    block = ring_cls(c, c.eunits)
    for i in range(c.elayers):
        h = block.apply(
            {"params": enc_p[f"layer_{i}"]}, h, out_len, mesh, time_axis
        )
    h = h[:, :T]
    h = nn.LayerNorm(dtype=c.cdtype).apply(
        {"params": enc_p["after_norm"]}, h
    )
    ctc = nn.Dense(c.vocab_size).apply(
        {"params": flax.core.unfreeze(params)["params"]["ctc_head"]}, h
    )
    return h, out_len, ctc


def split_pipeline_params(params, n_stages: int):
    """Loop-layout checkpoint -> ({rest}, stacked) for PIPELINED
    TRAINING: the elayers encoder block subtrees are stacked into
    (n_stages, per, ...) leaves (shard P('pipe') over the mesh), and
    `rest` is the checkpoint with those blocks removed (embed,
    after_norm, decoder, ctc_head — replicated). Exact inverse:
    `merge_pipeline_params`."""
    import flax

    from speech_recognition_tools_tpu.parallel.pp import (
        stack_pipeline_params,
    )

    p = flax.core.unfreeze(params)
    enc = p["params"]["encoder"]
    layers = sorted(
        (k for k in enc if k.startswith("layer_")),
        key=lambda k: int(k.split("_")[1]),
    )
    L = len(layers)
    if L % n_stages:
        raise ValueError(f"elayers {L} not divisible by {n_stages} stages")
    per = L // n_stages
    chunks = [
        stack_pipeline_params(
            [enc[layers[i * per + j]] for j in range(per)]
        )
        for i in range(n_stages)
    ]
    stacked = stack_pipeline_params(chunks)  # (S, per, ...)
    rest = {k: v for k, v in enc.items() if not k.startswith("layer_")}
    p["params"]["encoder"] = rest
    return p, stacked


def merge_pipeline_params(rest, stacked):
    """Inverse of split_pipeline_params (bit-exact): rebuild the
    loop-layout checkpoint so recog/resume work unchanged."""
    import flax

    import jax as _jax

    p = flax.core.unfreeze(rest)
    enc = dict(p["params"]["encoder"])
    leaves = _jax.tree.leaves(stacked)
    S, per = leaves[0].shape[0], leaves[0].shape[1]
    for i in range(S):
        for j in range(per):
            enc[f"layer_{i * per + j}"] = _jax.tree.map(
                lambda a: a[i, j], stacked
            )
    p["params"]["encoder"] = enc
    return p


def pp_opt_state_to_loop(opt_state):
    """Optimizer state built over split-layout params ({'rest':...,
    'stacked':...}) -> the same state with every such moment subtree
    merged back to loop layout, so it can be CHECKPOINTED next to the
    loop-layout params and survive a resume (including Noam step
    counts). Bit-exact inverse: `pp_opt_state_from_loop`."""

    def is_split(n):
        return isinstance(n, dict) and set(n.keys()) == {"rest", "stacked"}

    return jax.tree.map(
        lambda n: merge_pipeline_params(n["rest"], n["stacked"])
        if is_split(n) else n,
        opt_state, is_leaf=is_split,
    )


def pp_opt_state_from_loop(opt_state, n_stages: int):
    """Inverse of pp_opt_state_to_loop: re-split every loop-layout
    moment subtree for `n_stages` pipeline stages (the stage count may
    differ from the one that wrote the checkpoint — the loop layout is
    the canonical form)."""

    def is_params(n):
        return isinstance(n, dict) and set(n.keys()) == {"params"}

    def f(n):
        if is_params(n):
            r, s = split_pipeline_params(n, n_stages)
            return {"rest": r, "stacked": s}
        return n

    return jax.tree.map(f, opt_state, is_leaf=is_params)


def asr_loss_pipelined(model, rest, stacked, batch, cfg, mesh, *,
                       n_micro: int = 2, axis: str = "pipe", rng=None,
                       data_axis: str | None = None):
    """`asr_loss` with the encoder blocks trained as GPipe pipeline
    stages (parallel/pp.py): stacked block params are sharded P('pipe'),
    microbatches hop the ring, and jax.grad through the scan IS the
    exact pipelined backward. Works for both encoder_types (the blocks
    share the (x, mask) stage signature).

    rng=None runs deterministic (== asr_loss train=False). With an rng,
    dropout is ON everywhere: the posenc/decoder dropouts use folded
    streams, and each microbatch carries its own key *through the
    pipeline state* (key data rides the ppermute hops with the
    activations), folded per (stage, block, data shard) inside the stage
    closure — so every (microbatch, layer) pair gets an independent mask
    without widening pipeline_apply's interface.

    data_axis: optional mesh axis for DP x PP — the microbatch examples
    shard over it inside the pipeline (per-device activation memory
    scales 1/dp) instead of being replicated onto every pipe ring.

    Returns (loss, aux) like asr_loss; grads flow to BOTH `rest` and
    `stacked` when differentiated over them."""
    import flax

    from speech_recognition_tools_tpu.parallel.pp import (
        microbatch,
        pipeline_apply,
        unmicrobatch,
    )

    c = cfg
    train = rng is not None
    feats, lengths = batch["feats"], batch["lengths"]
    tokens, token_len = batch["tokens"], batch["token_lengths"]
    enc_rest = flax.core.unfreeze(rest)["params"]["encoder"]
    leaves = jax.tree.leaves(stacked)
    per = leaves[0].shape[1]

    h, enc_len = Conv2dSubsampling(c.adim, dtype=c.cdtype).apply(
        {"params": enc_rest["embed"]}, feats, lengths
    )
    h = _embed_scale(h, c)
    if train:
        h = nn.Dropout(c.dropout).apply(
            {}, h, deterministic=False,
            rngs={"dropout": jax.random.fold_in(rng, 0)},
        )
    mask = (jnp.arange(h.shape[1])[None, :] < enc_len[:, None]).astype(
        h.dtype
    )
    block = _encoder_block(c)

    def stage(p, state):
        x, m, kd = state
        if train:
            sidx = jax.lax.axis_index(axis)
            if data_axis is not None:
                # distinct masks per data shard (the shards hold
                # different examples)
                sidx = sidx + mesh.shape[axis] * jax.lax.axis_index(
                    data_axis
                )
            key = jax.random.wrap_key_data(kd[0])
        for j in range(per):
            bp = {"params": jax.tree.map(lambda a: a[j], p)}
            if train:
                kj = jax.random.fold_in(key, sidx * per + j)
                x = block.apply(bp, x, m > 0.5, deterministic=False,
                                rngs={"dropout": kj})
            else:
                x = block.apply(bp, x, m > 0.5)
        return x, m, kd

    # per-microbatch key data (uint32), broadcast over the example axis
    # so it shards like the activations under data_axis — a normal state
    # leaf, injected/hopped/collected exactly like them
    mb_base = jax.random.fold_in(rng if train else jax.random.key(0), 2)
    kd1 = jax.random.key_data(mb_base)
    mb_keys = jax.vmap(
        lambda i: jax.random.key_data(jax.random.fold_in(mb_base, i))
    )(jnp.arange(n_micro))
    mb_keys = jnp.broadcast_to(
        mb_keys[:, None, :],
        (n_micro, h.shape[0] // n_micro) + kd1.shape,
    )

    out_h, _, _ = pipeline_apply(
        stage, stacked,
        (microbatch(h, n_micro), microbatch(mask, n_micro), mb_keys),
        mesh=mesh, axis=axis, data_axis=data_axis,
    )
    memory = unmicrobatch(out_h)
    memory = nn.LayerNorm(dtype=c.cdtype).apply(
        {"params": enc_rest["after_norm"]}, memory
    )

    rest_p = flax.core.unfreeze(rest)["params"]
    ctc_logits = nn.Dense(c.vocab_size).apply(
        {"params": rest_p["ctc_head"]}, memory
    )
    B, U = tokens.shape
    sos = jnp.full((B, 1), c.sos_id, tokens.dtype)
    tokens_in = jnp.concatenate([sos, tokens[:, :-1]], axis=1)
    tokens_in = jnp.where(
        jnp.arange(U)[None, :] <= token_len[:, None], tokens_in, -1
    )
    dec_logits = TransformerDecoder(c).apply(
        {"params": rest_p["decoder"]}, tokens_in, memory, enc_len,
        not train,
        rngs={"dropout": jax.random.fold_in(rng, 1)} if train else {},
    )
    return _joint_loss(ctc_logits, dec_logits, enc_len, batch, c)


def _joint_loss(ctc_logits, dec_logits, enc_len, batch, cfg):
    """The CTC + label-smoothed attention joint objective shared by
    asr_loss and asr_loss_pipelined."""
    tokens, token_len = batch["tokens"], batch["token_lengths"]
    _, U = tokens.shape
    tok_padmask = (jnp.arange(U)[None, :] >= token_len[:, None]).astype(
        jnp.float32
    )
    enc_padmask = (
        jnp.arange(ctc_logits.shape[1])[None, :] >= enc_len[:, None]
    ).astype(jnp.float32)
    ctc = optax.ctc_loss(
        ctc_logits, enc_padmask, jnp.maximum(tokens, 0), tok_padmask,
        blank_id=cfg.blank_id,
    )
    ctc = jnp.mean(ctc / jnp.maximum(token_len, 1))
    tgt = jnp.where(
        jnp.arange(U)[None, :] == token_len[:, None], cfg.eos_id, tokens
    )
    valid = (jnp.arange(U)[None, :] <= token_len[:, None]).astype(jnp.float32)
    logp = jax.nn.log_softmax(dec_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, jnp.maximum(tgt, 0)[..., None], -1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    ce = (1 - cfg.lsm_weight) * nll + cfg.lsm_weight * smooth
    att = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)
    loss = cfg.mtlalpha * ctc + (1 - cfg.mtlalpha) * att
    return loss, {"ctc": ctc, "att": att}


def asr_loss(model, params, batch, rng, cfg: TransformerASRConfig,
             train=True):
    """Joint loss: mtlalpha * CTC + (1-mtlalpha) * label-smoothed attention
    CE (ESPnet e2e_asr_transformer semantics)."""
    feats, lengths = batch["feats"], batch["lengths"]
    tokens, token_len = batch["tokens"], batch["token_lengths"]
    B, U = tokens.shape
    sos = jnp.full((B, 1), cfg.sos_id, tokens.dtype)
    tokens_in = jnp.concatenate([sos, tokens[:, :-1]], axis=1)
    tokens_in = jnp.where(
        jnp.arange(U)[None, :] <= token_len[:, None], tokens_in, -1
    )
    ctc_logits, dec_logits, enc_len = model.apply(
        params, feats, lengths, tokens_in,
        not train, rngs={"dropout": rng} if train else {},
    )
    return _joint_loss(ctc_logits, dec_logits, enc_len, batch, cfg)


def noam_schedule(adim, warmup=25000, factor=10.0):
    """ESPnet noam: factor * adim^-0.5 * min(step^-0.5, step*warmup^-1.5)."""

    def sched(step):
        step = jnp.maximum(step, 1)
        return (
            factor
            * adim**-0.5
            * jnp.minimum(step**-0.5, step * warmup**-1.5)
        )

    return sched


def greedy_ctc(ctc_logits, enc_len, blank_id=0):
    """Best-path CTC decode (host-side collapse)."""
    ids = np.asarray(jnp.argmax(ctc_logits, axis=-1))
    out = []
    for b in range(ids.shape[0]):
        seq = []
        prev = -1
        for t in range(int(enc_len[b])):
            i = int(ids[b, t])
            if i != prev and i != blank_id:
                seq.append(i)
            prev = i
        out.append(seq)
    return out


def beam_search(
    model,
    params,
    feats,
    lengths,
    cfg: TransformerASRConfig,
    beam_size: int = 10,
    max_len: int = 100,
    ctc_weight: float = 0.3,
    penalty: float = 0.0,
    lm_apply=None,
    lm_weight: float = 1.0,
    encode_fn=None,
):
    """Joint CTC/attention beam search with exact CTC prefix scoring
    (Watanabe-style hybrid decoding, as in the ESPnet asr_recog the
    reference invokes; decode.yaml: beam 10, ctc-weight 0.3, lm-weight 1.0)
    and optional RNNLM shallow fusion. Host-loop over steps; every step's
    attention, CTC-prefix and LM scoring is batched over (beams x vocab)
    on device. Returns the best token list (feats: one utterance (1,T,D)).

    encode_fn: optional (feats, lengths) -> (memory, enc_len, ctc_logits)
    replacement for the plain encoder — e.g. `encode_ring` for
    long-utterance sequence-parallel encoding, or `encode_pipelined`
    (which needs n_micro=1 here: beam_search encodes ONE utterance at a
    time, and the default 2 microbatches cannot split batch 1).
    """
    from speech_recognition_tools_tpu.decode.ctc_prefix import (
        ctc_prefix_scores,
        init_prefix_state,
    )

    if encode_fn is None:
        memory, enc_len, ctc_logits = model.apply(
            params, feats, lengths, method=TransformerASR.encode
        )
    else:
        memory, enc_len, ctc_logits = encode_fn(feats, lengths)
    K = beam_size
    memory = jnp.repeat(memory, K, axis=0)
    enc_len_b = jnp.repeat(enc_len, K, axis=0)
    V = cfg.vocab_size
    T2 = ctc_logits.shape[1]
    ctc_logp = jax.nn.log_softmax(ctc_logits[0], -1)  # (T2, V)

    tokens = jnp.full((K, max_len + 1), -1, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.sos_id)
    att_cum = jnp.full((K,), -jnp.inf).at[0].set(0.0)
    lm_cum = jnp.zeros((K,))
    scores = jnp.full((K,), -jnp.inf).at[0].set(0.0)
    finished = jnp.zeros((K,), bool)
    last_tokens = jnp.full((K,), -1, jnp.int32)
    prefix_lens = jnp.zeros((K,), jnp.int32)
    r_state = init_prefix_state(ctc_logp, enc_len[0], K, cfg.blank_id)

    for step in range(max_len):
        dec_logits = model.apply(
            params, tokens[:, : step + 1], memory, enc_len_b,
            method=TransformerASR.decode_step,
        )
        att_logp = jax.nn.log_softmax(dec_logits[:, step], axis=-1)  # (K,V)
        new_att = att_cum[:, None] + att_logp
        new_lm = lm_cum[:, None]
        if lm_apply is not None:
            new_lm = new_lm + lm_apply(tokens[:, : step + 1])

        if ctc_weight > 0:
            psi, full, r_new = ctc_prefix_scores(
                ctc_logp, enc_len[0], None, prefix_lens, last_tokens,
                r_state, cfg.blank_id,
            )
            # eos ends the hypothesis: its CTC score is the full-sequence
            # probability of the *current* prefix
            last_f = jnp.clip(enc_len[0] - 1, 0, T2 - 1)
            cur_full = jnp.logaddexp(
                r_state[:, last_f, 0], r_state[:, last_f, 1]
            )
            ctc_part = psi.at[:, cfg.eos_id].set(cur_full)
            ctc_part = ctc_part.at[:, cfg.blank_id].set(-jnp.inf)
        else:
            ctc_part = jnp.zeros((K, V))

        total = (
            (1.0 - ctc_weight) * new_att
            + ctc_weight * ctc_part
            + lm_weight * new_lm
            + penalty * (step + 1)
        )
        # finished beams only re-emit eos, keeping their score
        total = jnp.where(
            finished[:, None],
            jnp.full_like(total, -jnp.inf).at[:, cfg.eos_id].set(0.0)
            + jnp.where(finished, scores, 0.0)[:, None],
            total,
        )
        top_scores, top_idx = jax.lax.top_k(total.reshape(-1), K)
        beam_idx = top_idx // V
        tok_idx = (top_idx % V).astype(jnp.int32)
        tokens = tokens[beam_idx].at[:, step + 1].set(tok_idx)
        att_cum = new_att.reshape(-1)[top_idx]
        lm_cum = new_lm.reshape(-1)[top_idx] if lm_apply is not None else lm_cum[beam_idx]
        scores = top_scores
        was_finished = finished[beam_idx]
        if ctc_weight > 0:
            r_picked = r_new[beam_idx, tok_idx]  # (K, T2, 2)
            r_state = jnp.where(
                (was_finished | (tok_idx == cfg.eos_id))[:, None, None],
                r_state[beam_idx], r_picked,
            )
        last_new = jnp.where(
            was_finished | (tok_idx == cfg.eos_id),
            last_tokens[beam_idx], tok_idx,
        )
        prefix_lens = jnp.where(
            was_finished | (tok_idx == cfg.eos_id),
            prefix_lens[beam_idx], prefix_lens[beam_idx] + 1,
        )
        last_tokens = last_new
        finished = was_finished | (tok_idx == cfg.eos_id)
        if bool(jnp.all(finished)):
            break
    best = int(jnp.argmax(scores))
    seq = [int(t) for t in np.asarray(tokens[best, 1:]) if t >= 0]
    return [t for t in seq if t != cfg.eos_id]


def average_checkpoints(param_list):
    """Average parameter pytrees (run_fdlp_e1.sh:495-505
    average_checkpoints equivalent)."""
    n = len(param_list)
    return jax.tree.map(lambda *xs: sum(xs) / n, *param_list)


def cl_decode(
    models_params,
    pm_scores,
    feats,
    lengths,
    cfg: TransformerASRConfig,
    beam_size: int = 10,
    max_len: int = 100,
    beta: float = 300.0,
):
    """Continual-learning decode (asr_recog --api cl equivalent,
    run_cl_2stream.sh:250-254): per-utterance task weights from the PM
    (VAE) scores sharpen-softmaxed like infer.lifelong task_priors, then
    the K models' decoder log-probs are fused with those weights inside one
    beam search.
    """
    w = np.exp(beta * np.asarray(pm_scores, np.float64))
    w = w / w.sum()

    encoded = []
    for model, params in models_params:
        memory, enc_len, ctc_logits = model.apply(
            params, feats, lengths, method=TransformerASR.encode
        )
        encoded.append((model, params, memory, enc_len))

    K = beam_size
    V = cfg.vocab_size
    tokens = jnp.full((K, max_len + 1), -1, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.sos_id)
    scores = jnp.full((K,), -jnp.inf).at[0].set(0.0)
    finished = jnp.zeros((K,), bool)
    mem_b = [
        (m, p, jnp.repeat(mem, K, axis=0), jnp.repeat(el, K, axis=0))
        for m, p, mem, el in encoded
    ]
    for step in range(max_len):
        logp = 0.0
        for wi, (model, params, mem, el) in zip(w, mem_b):
            dl = model.apply(
                params, tokens[:, : step + 1], mem, el,
                method=TransformerASR.decode_step,
            )
            logp = logp + wi * jax.nn.log_softmax(dl[:, step], axis=-1)
        logp = jnp.where(
            finished[:, None],
            jnp.full_like(logp, -jnp.inf).at[:, cfg.eos_id].set(0.0),
            logp,
        )
        total = scores[:, None] + logp
        top_scores, top_idx = jax.lax.top_k(total.reshape(-1), K)
        beam_idx = top_idx // V
        tok_idx = (top_idx % V).astype(jnp.int32)
        tokens = tokens[beam_idx].at[:, step + 1].set(tok_idx)
        scores = top_scores
        finished = finished[beam_idx] | (tok_idx == cfg.eos_id)
        if bool(jnp.all(finished)):
            break
    best = int(jnp.argmax(scores))
    seq = [int(t) for t in np.asarray(tokens[best, 1:]) if t >= 0]
    return [t for t in seq if t != cfg.eos_id]
