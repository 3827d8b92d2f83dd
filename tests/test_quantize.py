"""Weight-only int8 quantization for serving (infer/quantize.py): the
error bound of the quantizer itself, the structural no-op contract of
dequantize_tree, and the int8 streaming/serving path — including the
exact batcher == single-stream guarantee under quantized weights and
the StreamBatcher oversubscription (evict/restore) slow path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_recognition_tools_tpu.infer.quantize import (
    dequantize_tree,
    has_quantized,
    quantize_encoder,
    quantize_leaf,
    quantize_tree,
    quantized_bytes,
)
from speech_recognition_tools_tpu.models.transformer_asr import (
    TransformerASR,
    TransformerASRConfig,
)

RS = np.random.RandomState(11)


def _tiny_cfg(encoder_type="transformer", **kw):
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


def test_quantize_leaf_error_bound():
    """max |w - deq(q(w))| <= scale/2 per output channel (symmetric
    round-to-nearest), including all-zero channels (scale forced to 1)."""
    w = RS.randn(37, 53).astype(np.float32) * 3.0
    w[:, 5] = 0.0  # a dead channel must not divide by zero
    q = quantize_leaf(w)
    deq = np.asarray(q["int8_q"], np.float32) * np.asarray(q["int8_scale"])
    err = np.abs(w - deq)
    bound = np.asarray(q["int8_scale"]) / 2 + 1e-7
    assert (err <= bound).all()
    assert np.asarray(q["int8_q"]).dtype == np.int8


def test_attention_qkv_scales_are_per_head():
    """3-D q/k/v kernels (in, heads, head_dim) must get one scale per
    (head, head_dim) output channel: an outlier weight in head 0 must
    not inflate the quantization step of the same column in head 1."""
    w = RS.randn(64, 4, 16).astype(np.float32)
    w[0, 0, 3] = 100.0  # outlier in head 0 only
    tree = {"query": {"kernel": jnp.asarray(w)}}
    q = quantize_tree(tree, min_size=1)
    scale = np.asarray(q["query"]["kernel"]["int8_scale"])
    assert scale.shape == (1, 4, 16)  # per-(head, head_dim)
    assert scale[0, 0, 3] > 10 * scale[0, 1, 3]  # outlier stays in head 0
    deq = (
        np.asarray(q["query"]["kernel"]["int8_q"], np.float32) * scale
    )
    assert np.abs(w - deq).max() <= scale.max() / 2 + 1e-7
    # head 1's error is bounded by ITS OWN small scale, not the outlier's
    assert np.abs(w[:, 1] - deq[:, 1]).max() <= scale[0, 1].max() / 2 + 1e-7
    # the attention out-projection (heads, head_dim, out) keeps the
    # plain per-last-axis granularity
    wo = RS.randn(4, 16, 64).astype(np.float32)
    qo = quantize_tree({"out": {"kernel": jnp.asarray(wo)}}, min_size=1)
    assert np.asarray(qo["out"]["kernel"]["int8_scale"]).shape == (1, 1, 64)


def test_quantize_tree_selects_only_big_named_kernels():
    tree = {
        "a": {"kernel": jnp.ones((64, 64)), "bias": jnp.ones((64,))},
        "b": {"kernel": jnp.ones((4, 4))},          # too small
        "c": {"scale": jnp.ones((64, 64))},         # wrong name
        "d": {"embedding": jnp.ones((128, 32))},
    }
    q = quantize_tree(tree, min_size=1024)
    assert has_quantized(q) and not has_quantized(tree)
    assert set(q["a"]["kernel"].keys()) == {"int8_q", "int8_scale"}
    assert set(q["d"]["embedding"].keys()) == {"int8_q", "int8_scale"}
    assert jnp.issubdtype(q["b"]["kernel"].dtype, jnp.floating)
    assert jnp.issubdtype(q["c"]["scale"].dtype, jnp.floating)
    # dequantize restores shapes/dtypes; unquantized leaves are the
    # same objects (structural no-op)
    d = dequantize_tree(q)
    assert d["a"]["kernel"].shape == (64, 64)
    assert d["c"]["scale"] is q["c"]["scale"]
    # bytes accounting: int8 form is ~4x smaller than the f32 equivalent
    # (the per-channel scale vector rides along in both counts)
    qb, fb = quantized_bytes({"k": q["a"]["kernel"]})
    scale_b = np.asarray(q["a"]["kernel"]["int8_scale"]).nbytes
    assert fb == 64 * 64 * 4 + scale_b
    assert qb == 64 * 64 + scale_b


def test_quantize_encoder_rejects_non_asr_tree():
    with pytest.raises(ValueError):
        quantize_encoder({"params": {"foo": jnp.ones((2, 2))}})


@pytest.mark.parametrize("encoder_type", ["transformer", "conformer"])
def test_int8_streaming_close_to_f32(encoder_type):
    """The int8 single-stream recognizer tracks the f32 one: encoder
    memory within the per-channel quantization error budget, and the
    vast majority of per-frame CTC argmax decisions unchanged."""
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        StreamingRecognizer,
    )

    cfg = _tiny_cfg(encoder_type, attn_chunk=4, attn_left_chunks=2)
    model = TransformerASR(cfg)
    x, params = _init(model, T=150, seed=33)
    qparams = quantize_encoder(params, min_size=1)
    assert has_quantized(qparams)

    sr = StreamingRecognizer(model, params)
    sr.push(x[0])
    sr.finish()
    sq = StreamingRecognizer(model, qparams)
    sq.push(x[0])
    sq.finish()
    assert sq.enc_len == sr.enc_len
    # LayerNormed activations are O(1); a ~0.4% weight error through two
    # blocks stays well inside 0.08 absolute
    np.testing.assert_allclose(sq.memory, sr.memory, atol=0.08)
    agree = np.mean(
        np.argmax(sq.ctc_logits, -1) == np.argmax(sr.ctc_logits, -1)
    )
    assert agree > 0.9


def test_int8_batcher_matches_int8_single_stream():
    """Batcher == single-stream exactness holds under quantized weights
    (both run the SAME int8 program, so parity stays bit-level)."""
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        StreamBatcher,
        StreamingRecognizer,
    )

    cfg = _tiny_cfg(attn_chunk=4, attn_left_chunks=2)
    model = TransformerASR(cfg)
    _, params = _init(model, T=60, seed=5)
    qparams = quantize_encoder(params, min_size=1)
    xs = [RS.randn(t, 8).astype(np.float32) for t in (120, 75)]

    singles = []
    for x in xs:
        sr = StreamingRecognizer(model, qparams)
        sr.push(x)
        singles.append((sr.finish(), sr.memory))
    sb = StreamBatcher(model, qparams, max_streams=2, store_memory=True)
    sids = [sb.open() for _ in xs]
    for sid, x in zip(sids, xs):
        sb.push(sid, x)
    for sid, (want_hyp, want_mem) in zip(sids, singles):
        assert sb.finish(sid) == want_hyp
        np.testing.assert_allclose(
            sb.state(sid).memory, want_mem, rtol=1e-4, atol=3e-5
        )


@pytest.mark.parametrize("encoder_type", ["transformer", "conformer"])
def test_batcher_oversubscription_evict_restore(encoder_type):
    """More live streams than cache rows: slot-less ready streams evict
    non-ready holders (row saved to host, restored later). Every stream
    must still match its single-stream recognizer exactly."""
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        StreamBatcher,
        StreamingRecognizer,
    )

    cfg = _tiny_cfg(encoder_type, attn_chunk=4, attn_left_chunks=2)
    model = TransformerASR(cfg)
    _, params = _init(model, T=60, seed=9)
    lens = [140, 90, 170]
    xs = [RS.randn(t, 8).astype(np.float32) for t in lens]

    singles = []
    for x in xs:
        sr = StreamingRecognizer(model, params)
        sr.push(x)
        singles.append((sr.finish(), sr.memory, sr.enc_len))

    sb = StreamBatcher(model, params, max_streams=2, store_memory=True)
    sids = [sb.open() for _ in xs]
    # ragged interleaving forces repeated evict/restore of the third row
    offs = [0] * 3
    sizes = [31, 19, 45]
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
