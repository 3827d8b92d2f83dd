"""bf16 mixed-precision e2e training/inference (compute_dtype='bfloat16'):
f32 master weights, bf16 matmul/attention/conv compute, f32 logit heads.
The default float32 path is byte-identical to the pre-mixed-precision code
(cdtype=None keeps flax promotion semantics), so these tests only exercise
the bf16 mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from speech_recognition_tools_tpu.models.transformer_asr import (
    TransformerASR,
    TransformerASRConfig,
    asr_loss,
    greedy_ctc,
)

RS = np.random.RandomState(3)


def _cfg(encoder_type="transformer", **kw):
    return TransformerASRConfig(
        vocab_size=8, adim=16, aheads=2, elayers=2, eunits=32,
        dlayers=1, dunits=32, dropout=0.0, encoder_type=encoder_type,
        conv_kernel=7, **kw,
    )


def _batch(B=2, T=40, D=12, U=4):
    feats = RS.randn(B, T, D).astype(np.float32)
    lengths = np.array([T, T - 7], np.int32)[:B]
    tokens = RS.randint(1, 7, size=(B, U)).astype(np.int32)
    token_len = np.array([U, U - 1], np.int32)[:B]
    tokens[1, U - 1 :] = -1
    return {
        "feats": jnp.asarray(feats), "lengths": jnp.asarray(lengths),
        "tokens": jnp.asarray(tokens), "token_lengths": jnp.asarray(token_len),
    }


def _init(model, batch, seed=0):
    return model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
        batch["feats"], batch["lengths"], batch["tokens"],
    )


@pytest.mark.parametrize("encoder_type", ["transformer", "conformer"])
def test_bf16_loss_matches_f32_and_heads_stay_f32(encoder_type):
    cfg32 = _cfg(encoder_type)
    cfg16 = _cfg(encoder_type, compute_dtype="bfloat16")
    m32, m16 = TransformerASR(cfg32), TransformerASR(cfg16)
    batch = _batch()
    params = _init(m32, batch)

    # same init under bf16 config: params are f32 masters either way
    p16 = _init(m16, batch)
    assert {str(x.dtype) for x in jax.tree.leaves(p16)} == {"float32"}
    chex_equal = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), params, p16
    )
    assert all(jax.tree.leaves(chex_equal))

    ctc16, dec16, _ = m16.apply(params, batch["feats"], batch["lengths"],
                                batch["tokens"], True)
    assert ctc16.dtype == jnp.float32 and dec16.dtype == jnp.float32

    l32, _ = asr_loss(m32, params, batch, None, cfg32, train=False)
    l16, _ = asr_loss(m16, params, batch, None, cfg16, train=False)
    assert abs(float(l32) - float(l16)) / abs(float(l32)) < 2e-2


def test_bf16_grads_are_f32_and_training_learns():
    cfg = _cfg(compute_dtype="bfloat16")
    model = TransformerASR(cfg)
    batch = _batch()
    params = _init(model, batch)

    def loss_fn(p, rng):
        return asr_loss(model, p, batch, rng, cfg, train=True)[0]

    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o, rng):
        loss, g = jax.value_and_grad(loss_fn)(p, rng)
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o, loss, g

    rng = jax.random.key(0)
    losses = []
    for i in range(12):
        params, opt_state, loss, g = step(params, opt_state,
                                          jax.random.fold_in(rng, i))
        losses.append(float(loss))
    # grads land in f32 (the dtype-cast transposes back to the master
    # dtype), so adam state and params never leave f32
    assert {str(x.dtype) for x in jax.tree.leaves(g)} == {"float32"}
    assert {str(x.dtype) for x in jax.tree.leaves(params)} == {"float32"}
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_bf16_decode_paths_run():
    cfg = _cfg(compute_dtype="bfloat16")
    model = TransformerASR(cfg)
    batch = _batch()
    params = _init(model, batch)
    mem, enc_len, ctc = model.apply(
        params, batch["feats"], batch["lengths"],
        method=TransformerASR.encode,
    )
    assert ctc.dtype == jnp.float32
    hyps = greedy_ctc(ctc, enc_len)
    assert len(hyps) == 2
    from speech_recognition_tools_tpu.models.transformer_asr import (
        beam_search,
    )
    out = beam_search(model, params, np.asarray(batch["feats"][:1]),
                      np.asarray(batch["lengths"][:1]), cfg, beam_size=2,
                      max_len=5)
    assert isinstance(out, list)  # token ids for the single utterance


@pytest.mark.parametrize("encoder_type", ["transformer", "conformer"])
def test_bf16_streaming_close_to_offline(encoder_type):
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        StreamingRecognizer,
    )

    cfg = _cfg(encoder_type, attn_chunk=4, attn_left_chunks=2,
               compute_dtype="bfloat16")
    model = TransformerASR(cfg)
    T, D = 120, 12
    x = RS.randn(1, T, D).astype(np.float32)
    params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(x), jnp.asarray([T]), jnp.zeros((1, 4), jnp.int32),
    )
    mem, enc_len, ctc = model.apply(
        params, jnp.asarray(x), jnp.asarray([T]),
        method=TransformerASR.encode,
    )
    n = int(enc_len[0])
    sr = StreamingRecognizer(model, params)
    for i in range(0, T, 30):
        sr.push(x[0, i : i + 30])
    sr.finish()
    assert sr.enc_len == n
    # both sides compute in bf16; the streaming recomputation order
    # differs, so agreement is at bf16 resolution, not f32's
    np.testing.assert_allclose(sr.memory, np.asarray(mem)[0, :n],
                               rtol=0.15, atol=0.05)
