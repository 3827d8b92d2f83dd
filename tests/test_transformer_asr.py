"""E2E transformer ASR tests: loss/grads, overfit a toy task, beam search,
LM fusion, checkpoint averaging, CL multi-model decode."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from speech_recognition_tools_tpu.models.rnnlm import (
    RNNLM,
    lm_loss,
    make_fusion_scorer,
)
from speech_recognition_tools_tpu.models.transformer_asr import (
    TransformerASR,
    TransformerASRConfig,
    asr_loss,
    average_checkpoints,
    beam_search,
    cl_decode,
    greedy_ctc,
    noam_schedule,
)

RS = np.random.RandomState(9)

CFG = TransformerASRConfig(
    vocab_size=12, adim=32, aheads=2, elayers=2, eunits=64,
    dlayers=2, dunits=64, dropout=0.0,
)
B, T, D, U = 2, 37, 8, 6


def _batch(seed=0):
    rs = np.random.RandomState(seed)
    feats = jnp.asarray(rs.randn(B, T, D), jnp.float32)
    lengths = jnp.asarray([T, T - 9])
    tokens = jnp.asarray(rs.randint(1, 11, (B, U)), jnp.int32)
    token_len = jnp.asarray([U - 1, U - 2])
    return dict(feats=feats, lengths=lengths, tokens=tokens,
                token_lengths=token_len)


@pytest.fixture(scope="module")
def model_and_params():
    model = TransformerASR(CFG)
    b = _batch()
    params = model.init(
        {"params": jax.random.key(0)},
        b["feats"], b["lengths"], b["tokens"],
    )
    return model, params


class TestTrain:
    @pytest.mark.slow
    def test_loss_and_grads(self, model_and_params):
        model, params = model_and_params
        loss, aux = asr_loss(model, params, _batch(), jax.random.key(1), CFG)
        assert np.isfinite(float(loss))
        g = jax.grad(
            lambda p: asr_loss(model, p, _batch(), jax.random.key(1), CFG)[0]
        )(params)
        assert all(np.all(np.isfinite(l)) for l in jax.tree.leaves(g))

    def test_overfits_tiny_task(self, model_and_params):
        model, params = model_and_params
        batch = _batch()
        sched = noam_schedule(CFG.adim, warmup=100, factor=1.0)
        tx = optax.adam(sched)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            (l, _), g = jax.value_and_grad(
                lambda p: asr_loss(model, p, batch, jax.random.key(0), CFG,
                                   train=False), has_aux=True
            )(params)
            u, opt = tx.update(g, opt)
            return optax.apply_updates(params, u), opt, l

        losses = []
        for _ in range(60):
            params, opt, l = step(params, opt)
            losses.append(float(l))
        assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    def test_noam_schedule_shape(self):
        s = noam_schedule(256, warmup=1000, factor=10.0)
        vals = [float(s(i)) for i in (1, 500, 1000, 5000)]
        assert vals[2] == max(vals)  # peak at warmup


class TestDecode:
    def test_greedy_ctc_collapse(self):
        logits = np.full((1, 5, 4), -10.0)
        for t, c in enumerate([1, 1, 0, 2, 2]):
            logits[0, t, c] = 10.0
        out = greedy_ctc(jnp.asarray(logits), np.asarray([5]))
        assert out == [[1, 2]]

    @pytest.mark.slow
    def test_beam_search_runs(self, model_and_params):
        model, params = model_and_params
        b = _batch()
        seq = beam_search(
            model, params, b["feats"][:1], b["lengths"][:1], CFG,
            beam_size=4, max_len=8,
        )
        assert isinstance(seq, list) and len(seq) <= 8
        assert all(0 <= t < CFG.vocab_size for t in seq)

    @pytest.mark.slow
    def test_beam_search_with_lm(self, model_and_params):
        model, params = model_and_params
        lm = RNNLM(vocab_size=CFG.vocab_size, embed_dim=8, hidden=16)
        lm_params = lm.init(
            {"params": jax.random.key(3)}, jnp.zeros((1, 4), jnp.int32)
        )
        b = _batch()
        seq = beam_search(
            model, params, b["feats"][:1], b["lengths"][:1], CFG,
            beam_size=3, max_len=6,
            lm_apply=make_fusion_scorer(lm, lm_params), lm_weight=0.5,
        )
        assert isinstance(seq, list)

    @pytest.mark.slow
    def test_cl_decode(self, model_and_params):
        model, params = model_and_params
        params2 = jax.tree.map(lambda x: x + 0.01, params)
        b = _batch()
        seq = cl_decode(
            [(model, params), (model, params2)], [0.02, 0.01],
            b["feats"][:1], b["lengths"][:1], CFG, beam_size=3, max_len=6,
        )
        assert isinstance(seq, list)

    def test_average_checkpoints(self, model_and_params):
        model, params = model_and_params
        p2 = jax.tree.map(lambda x: x * 3.0, params)
        avg = average_checkpoints([params, p2])
        a = jax.tree.leaves(avg)[0]
        x = jax.tree.leaves(params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(x) * 2.0, rtol=1e-6)


class TestRNNLM:
    def test_lm_trains(self):
        lm = RNNLM(vocab_size=10, embed_dim=8, hidden=16)
        toks = jnp.asarray(RS.randint(0, 10, (4, 12)), jnp.int32)
        lens = jnp.full((4,), 12, jnp.int32)
        params = lm.init({"params": jax.random.key(0)}, toks)
        loss = lm_loss(lm, params, toks, lens)
        assert np.isfinite(float(loss))
        g = jax.grad(lambda p: lm_loss(lm, p, toks, lens))(params)
        assert any(np.any(np.asarray(l) != 0) for l in jax.tree.leaves(g))


class TestJittedBeam:
    @pytest.mark.slow
    def test_matches_host_loop(self, model_and_params):
        from speech_recognition_tools_tpu.decode.beam_jit import (
            beam_search_jit,
            tokens_to_list,
        )

        model, params = model_and_params
        b = _batch()
        host_seq = beam_search(
            model, params, b["feats"][:1], b["lengths"][:1], CFG,
            beam_size=4, max_len=8,
        )
        toks, scores = beam_search_jit(
            model, params, b["feats"][:1], b["lengths"][:1],
            beam_size=4, max_len=8,
        )
        jit_seq = tokens_to_list(toks, scores, CFG.eos_id)
        assert jit_seq == host_seq, (jit_seq, host_seq)


class TestJittedBeamLMBatch:
    def _lm(self):
        lm = RNNLM(vocab_size=CFG.vocab_size, embed_dim=8, hidden=16)
        toks = jnp.asarray(RS.randint(0, CFG.vocab_size, (2, 6)), jnp.int32)
        lm_params = lm.init({"params": jax.random.key(3)}, toks)
        return lm, lm_params

    @pytest.mark.slow
    def test_lm_fusion_matches_host_loop(self, model_and_params):
        """Token parity of the in-scan RNNLM fusion vs the host loop at
        lm_weight > 0 (decode.yaml lm-weight 1.0 configuration)."""
        from speech_recognition_tools_tpu.decode.beam_jit import (
            beam_search_jit,
            tokens_to_list,
        )
        from speech_recognition_tools_tpu.models.rnnlm import (
            make_jit_fusion_scorer,
        )

        model, params = model_and_params
        lm, lm_params = self._lm()
        b = _batch()
        host_seq = beam_search(
            model, params, b["feats"][:1], b["lengths"][:1], CFG,
            beam_size=4, max_len=8,
            lm_apply=make_fusion_scorer(lm, lm_params), lm_weight=0.7,
        )
        toks, scores = beam_search_jit(
            model, params, b["feats"][:1], b["lengths"][:1],
            beam_size=4, max_len=8,
            lm_apply=make_jit_fusion_scorer(lm, lm_params), lm_weight=0.7,
        )
        jit_seq = tokens_to_list(toks, scores, CFG.eos_id)
        assert jit_seq == host_seq, (jit_seq, host_seq)

    @pytest.mark.slow
    def test_batched_matches_per_utterance(self, model_and_params):
        from speech_recognition_tools_tpu.decode.beam_jit import (
            beam_search_jit,
            beam_search_jit_batched,
            tokens_to_list,
        )

        model, params = model_and_params
        b = _batch()
        toks_b, scores_b = beam_search_jit_batched(
            model, params, b["feats"], b["lengths"], beam_size=4, max_len=8,
        )
        assert toks_b.shape[0] == B
        for i in range(B):
            toks_i, scores_i = beam_search_jit(
                model, params, b["feats"][i : i + 1], b["lengths"][i : i + 1],
                beam_size=4, max_len=8,
            )
            one = tokens_to_list(toks_i, scores_i, CFG.eos_id)
            bat = tokens_to_list(toks_b[i], scores_b[i], CFG.eos_id)
            assert one == bat, (i, one, bat)


class TestTrainLmCli:
    @pytest.mark.slow
    def test_trains_and_restores(self, tmp_path):
        from speech_recognition_tools_tpu.cli import train_lm
        from speech_recognition_tools_tpu.cli.recog_e2e import _load_lm

        text = tmp_path / "text"
        rs = np.random.RandomState(0)
        lines = []
        for i in range(20):
            words = ["ab", "ba", "aab"][rs.randint(3)]
            lines.append(f"u{i} {' '.join(words * (1 + i % 3))}")
        text.write_text("\n".join(lines) + "\n")
        out = str(tmp_path / "lm")
        train_lm.main([str(text), out, "--embed_dim", "8", "--hidden", "16",
                       "--epochs", "2", "--batch_size", "8"])
        lm, lm_params = _load_lm(out)
        logits = lm.apply(lm_params, jnp.zeros((1, 4), jnp.int32))
        assert logits.shape[-1] == lm.vocab_size


class TestIncrementalDecode:
    def test_incremental_matches_full_prefix(self, model_and_params):
        """KV-cached decoding (incremental=True) is token-identical to
        the O(L^2) full-prefix path."""
        from speech_recognition_tools_tpu.decode.beam_jit import (
            beam_search_jit,
            tokens_to_list,
        )

        model, params = model_and_params
        b = _batch()
        toks_i, sc_i = beam_search_jit(
            model, params, b["feats"][:1], b["lengths"][:1],
            beam_size=4, max_len=8, incremental=True,
        )
        toks_f, sc_f = beam_search_jit(
            model, params, b["feats"][:1], b["lengths"][:1],
            beam_size=4, max_len=8, incremental=False,
        )
        assert tokens_to_list(toks_i, sc_i, CFG.eos_id) == tokens_to_list(
            toks_f, sc_f, CFG.eos_id
        )
        np.testing.assert_allclose(
            np.asarray(sc_i), np.asarray(sc_f), rtol=1e-4, atol=1e-4
        )

    @pytest.mark.slow
    def test_decoder_step_logits_match(self, model_and_params):
        """decode_incremental logits == decode_step logits position by
        position for a fixed token prefix. Slow: eager per-position
        applies; the default suite keeps the token/score-level KV-cache
        parity test above."""
        model, params = model_and_params
        b = _batch()
        memory, enc_len, _ = model.apply(
            params, b["feats"][:1], b["lengths"][:1],
            method=TransformerASR.encode,
        )
        K, L = 2, 6
        memory = jnp.repeat(memory, K, axis=0)
        enc_len_b = jnp.repeat(enc_len, K, axis=0)
        toks = jnp.asarray(
            RS.randint(1, CFG.vocab_size - 1, (K, L)), jnp.int32
        )
        full = model.apply(
            params, toks, memory, enc_len_b,
            method=TransformerASR.decode_step,
        )
        _, mut = model.apply(
            params, toks, memory, enc_len_b,
            method=TransformerASR.decode_init_cache, mutable=["cache"],
        )
        cache = mut["cache"]
        for t in range(L):
            step, mut = model.apply(
                {**params, "cache": cache}, toks[:, t : t + 1], t,
                memory, enc_len_b,
                method=TransformerASR.decode_incremental,
                mutable=["cache"],
            )
            cache = mut["cache"]
            np.testing.assert_allclose(
                np.asarray(step[:, 0]), np.asarray(full[:, t]),
                rtol=2e-4, atol=2e-4,
            )


class TestConformer:
    """encoder_type='conformer' (beyond-reference): macaron FFN halves +
    MHSA + depthwise-conv module, LayerNorm-for-BatchNorm so the model
    stays stateless (models/transformer_asr.py::_ConformerBlock)."""

    CCFG = TransformerASRConfig(
        vocab_size=12, adim=32, aheads=2, elayers=2, eunits=64,
        dlayers=2, dunits=64, dropout=0.0, encoder_type="conformer",
        conv_kernel=7,
    )

    @pytest.fixture(scope="class")
    def conformer(self):
        model = TransformerASR(self.CCFG)
        b = _batch()
        params = model.init(
            {"params": jax.random.key(3)},
            b["feats"], b["lengths"], b["tokens"],
        )
        return model, params

    @pytest.mark.slow
    def test_loss_grads_and_learning(self, conformer):
        model, params = conformer
        batch = _batch()
        loss0, _ = asr_loss(model, params, batch, jax.random.key(1),
                            self.CCFG, train=False)
        assert np.isfinite(float(loss0))
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            (l, _), g = jax.value_and_grad(
                lambda p: asr_loss(model, p, batch, jax.random.key(0),
                                   self.CCFG, train=False), has_aux=True
            )(params)
            u, opt = tx.update(g, opt)
            return optax.apply_updates(params, u), opt, l

        losses = []
        for _ in range(40):
            params, opt, l = step(params, opt)
            losses.append(float(l))
        assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])

    def test_padding_invariance(self, conformer):
        """The conv module zeroes padded frames before the depthwise
        conv: extending an utterance with (zero) padding — what
        run_batched / iter_egs_batches produce — must not change the
        valid encoder outputs. (Nonzero pad fill would leak through the
        unmasked Conv2dSubsampling for the transformer encoder too.)"""
        model, params = conformer
        rs = np.random.RandomState(4)
        n = 29
        x = rs.randn(1, n, D).astype(np.float32)
        xpad = np.concatenate(
            [x, np.zeros((1, 16, D), np.float32)], axis=1
        )
        m1, l1, _ = model.apply(
            params, jnp.asarray(x), jnp.asarray([n]),
            method=model.encode,
        )
        m2, l2, _ = model.apply(
            params, jnp.asarray(xpad), jnp.asarray([n]),
            method=model.encode,
        )
        Tv = int(l1[0])
        assert int(l2[0]) == Tv
        np.testing.assert_allclose(
            np.asarray(m2[0, :Tv]), np.asarray(m1[0, :Tv]),
            rtol=1e-4, atol=1e-4,
        )

    @pytest.mark.slow
    def test_beam_search_decodes(self, conformer):
        model, params = conformer
        b = _batch()
        seq = beam_search(
            model, params, b["feats"][:1], b["lengths"][:1], self.CCFG,
            beam_size=3, max_len=8,
        )
        assert isinstance(seq, list)
        assert all(0 <= t < self.CCFG.vocab_size for t in seq)
