"""GPipe pipeline parallelism (parallel/pp.py): exact forward and
gradient parity with the sequential stack on the virtual device mesh.

The reference has no PP (SURVEY.md §2.8); these tests pin the TPU-native
extension's semantics: pipeline_apply(stage_fn over 'pipe') must equal
applying the S stages in sequence, for both activations and parameter
gradients (GPipe is an exact-gradient schedule, not an approximation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from speech_recognition_tools_tpu.parallel.pp import (
    microbatch,
    pipeline_apply,
    stack_pipeline_params,
    unmicrobatch,
)


def _mlp_stage(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _make_stage_params(key, n_stages, dim):
    keys = jax.random.split(key, n_stages)
    return [
        {
            "w": jax.random.normal(k, (dim, dim), jnp.float64) / np.sqrt(dim),
            "b": jnp.zeros((dim,), jnp.float64),
        }
        for k in keys
    ]


def _sequential(params_list, x):
    for p in params_list:
        x = _mlp_stage(p, x)
    return x


class TestPipelineApply:
    def test_forward_matches_sequential(self):
        assert jax.device_count() >= 8
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("pipe",))
        S, dim, B, M = 8, 16, 24, 6
        params = _make_stage_params(jax.random.key(0), S, dim)
        x = jax.random.normal(jax.random.key(1), (B, dim), jnp.float64)

        ref = _sequential(params, x)
        stacked = stack_pipeline_params(params)
        out = unmicrobatch(
            pipeline_apply(
                _mlp_stage, stacked, microbatch(x, M), mesh=mesh
            )
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-12)

    @pytest.mark.parametrize("n_micro", [1, 4, 12])
    def test_any_microbatch_count(self, n_micro):
        assert jax.device_count() >= 8
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("pipe",))
        S, dim, B = 4, 8, 12
        params = _make_stage_params(jax.random.key(2), S, dim)
        x = jax.random.normal(jax.random.key(3), (B, dim), jnp.float64)
        ref = _sequential(params, x)
        out = unmicrobatch(
            pipeline_apply(
                _mlp_stage, stack_pipeline_params(params),
                microbatch(x, n_micro), mesh=mesh,
            )
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-12)

    def test_gradients_match_sequential(self):
        """jax.grad through the schedule = the GPipe backward pipeline;
        parameter grads must equal the sequential stack's exactly."""
        assert jax.device_count() >= 8
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("pipe",))
        S, dim, B, M = 4, 8, 16, 4
        params = _make_stage_params(jax.random.key(4), S, dim)
        x = jax.random.normal(jax.random.key(5), (B, dim), jnp.float64)
        y = jax.random.normal(jax.random.key(6), (B, dim), jnp.float64)

        def loss_seq(plist):
            return jnp.mean((_sequential(plist, x) - y) ** 2)

        def loss_pp(stacked):
            out = unmicrobatch(
                pipeline_apply(
                    _mlp_stage, stacked, microbatch(x, M), mesh=mesh
                )
            )
            return jnp.mean((out - y) ** 2)

        g_seq = jax.grad(loss_seq)(params)
        g_pp = jax.grad(loss_pp)(stack_pipeline_params(params))
        g_seq_stacked = stack_pipeline_params(g_seq)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-12
            ),
            g_pp, g_seq_stacked,
        )

    def test_pytree_state_and_dp_x_pp(self):
        """(hidden, mask) pytree state on a 2x4 (data, pipe) mesh: the
        microbatch dim shards over 'data' while stages shard over
        'pipe' — the DP x PP hybrid."""
        assert jax.device_count() >= 8
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                    ("data", "pipe"))
        S, dim, B, M = 4, 8, 8, 2  # mb = 4, 2 per data shard
        params = _make_stage_params(jax.random.key(7), S, dim)
        x = jax.random.normal(jax.random.key(8), (B, dim), jnp.float64)
        mask = (jax.random.uniform(jax.random.key(9), (B, dim)) > 0.3
                ).astype(jnp.float64)

        def stage(p, state):
            h, m = state
            return jnp.tanh(h @ p["w"] + p["b"]) * m, m

        ref = (x, mask)
        for p in params:
            ref = stage(p, ref)

        out = pipeline_apply(
            stage, stack_pipeline_params(params),
            (microbatch(x, M), microbatch(mask, M)),
            mesh=mesh, data_axis="data",
        )
        np.testing.assert_allclose(
            np.asarray(unmicrobatch(out[0])), np.asarray(ref[0]), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(unmicrobatch(out[1])), np.asarray(mask), atol=0
        )

    def test_rejects_bad_microbatch(self):
        with pytest.raises(ValueError):
            microbatch(jnp.zeros((10, 3)), 4)


class TestEncodePipelined:
    @pytest.mark.slow
    def test_matches_model_encode(self):
        """encode_pipelined on an ordinary checkpoint == model.encode
        (memory, enc_len, ctc logits), with 2 blocks per stage."""
        from speech_recognition_tools_tpu.models.transformer_asr import (
            TransformerASR, TransformerASRConfig, encode_pipelined,
        )

        assert jax.device_count() >= 8
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("pipe",))
        cfg = TransformerASRConfig(
            vocab_size=13, adim=16, aheads=2, elayers=8, eunits=32,
            dlayers=1, dunits=32, dropout=0.0,
        )
        model = TransformerASR(cfg)
        B, T, D = 4, 20, 10
        rs = np.random.RandomState(1)
        feats = jnp.asarray(rs.randn(B, T, D), jnp.float32)
        lengths = jnp.asarray([T, T - 4, T, T - 7], jnp.int32)
        tokens = jnp.asarray(rs.randint(1, 12, (B, 5)), jnp.int32)
        params = model.init(
            {"params": jax.random.key(0)}, feats, lengths, tokens
        )

        ref_mem, ref_len, ref_ctc = model.apply(
            params, feats, lengths, method=model.encode
        )
        got_mem, got_len, got_ctc = encode_pipelined(
            model, params, feats, lengths, mesh, n_micro=2
        )
        np.testing.assert_array_equal(np.asarray(got_len), np.asarray(ref_len))
        np.testing.assert_allclose(
            np.asarray(got_mem), np.asarray(ref_mem), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got_ctc), np.asarray(ref_ctc), rtol=1e-4, atol=1e-4
        )

    def test_rejects_indivisible_layers(self):
        from speech_recognition_tools_tpu.models.transformer_asr import (
            TransformerASR, TransformerASRConfig, encode_pipelined,
        )

        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("pipe",))
        cfg = TransformerASRConfig(
            vocab_size=5, adim=8, aheads=2, elayers=3, eunits=16,
            dlayers=1, dunits=16,
        )
        model = TransformerASR(cfg)
        with pytest.raises(ValueError):
            encode_pipelined(model, {}, None, None, mesh)


class TestTransformerStagePP:
    def test_encoder_blocks_pipelined(self):
        """Real model stages: the transformer ASR encoder blocks run as
        pipeline stages (one _MHABlock per device) and must match the
        sequential encoder stack."""
        from speech_recognition_tools_tpu.models.transformer_asr import (
            TransformerASRConfig, _MHABlock,
        )

        assert jax.device_count() >= 8
        S = 4
        mesh = Mesh(np.array(jax.devices()[:S]).reshape(S), ("pipe",))
        cfg = TransformerASRConfig(
            vocab_size=11, adim=16, aheads=2, elayers=S, eunits=32,
            dlayers=1, dunits=32, dropout=0.0,
        )
        block = _MHABlock(cfg, cfg.eunits)
        B, T = 4, 10
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(B, T, cfg.adim), jnp.float32)
        mask = jnp.asarray(rs.rand(B, T) > 0.2)

        keys = jax.random.split(jax.random.key(0), S)
        plist = [block.init(k, x, mask) for k in keys]

        ref = x
        for p in plist:
            ref = block.apply(p, ref, mask)

        def stage(p, state):
            h, m = state
            return block.apply(p, h, m > 0.5), m

        out_h, _ = pipeline_apply(
            stage, stack_pipeline_params(plist),
            (microbatch(x, 2), microbatch(mask.astype(jnp.float32), 2)),
            mesh=mesh,
        )
        np.testing.assert_allclose(
            np.asarray(unmicrobatch(out_h)), np.asarray(ref),
            rtol=1e-5, atol=1e-5,
        )
