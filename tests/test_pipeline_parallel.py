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


class TestPipelinedTraining:
    """Training-side PP (VERDICT r3 weak #3a): stacked-layer param
    layout + converters + asr_loss_pipelined + the train_e2e
    --pipeline_parallel CLI path."""

    def _model(self, elayers=4, encoder_type="transformer", dropout=0.0,
               **cfg_kw):
        from speech_recognition_tools_tpu.models.transformer_asr import (
            TransformerASR,
            TransformerASRConfig,
        )

        cfg = TransformerASRConfig(
            vocab_size=12, adim=16, aheads=2, elayers=elayers, eunits=24,
            dlayers=1, dunits=24, dropout=dropout,
            encoder_type=encoder_type, **cfg_kw,
        )
        return TransformerASR(cfg), cfg

    def _batch(self, rs, B=4, T=20, D=8, U=5):
        return {
            "feats": jnp.asarray(rs.randn(B, T, D), jnp.float32),
            "lengths": jnp.asarray([T, T - 3, T - 5, T - 1], jnp.int32),
            "tokens": jnp.asarray(rs.randint(1, 10, (B, U)), jnp.int32),
            "token_lengths": jnp.asarray([U - 1] * B, jnp.int32),
        }

    def test_split_merge_roundtrip_bit_exact(self):
        model, cfg = self._model()
        rs = np.random.RandomState(0)
        b = self._batch(rs)
        params = model.init(
            {"params": jax.random.key(0)},
            b["feats"], b["lengths"], b["tokens"],
        )
        from speech_recognition_tools_tpu.models.transformer_asr import (
            merge_pipeline_params,
            split_pipeline_params,
        )

        rest, stacked = split_pipeline_params(params, 2)
        merged = merge_pipeline_params(rest, stacked)
        flat_a = jax.tree_util.tree_leaves_with_path(
            jax.tree.map(np.asarray, params)
        )
        flat_b = dict(jax.tree_util.tree_leaves_with_path(
            jax.tree.map(np.asarray, merged)
        ))
        for path, leaf in flat_a:
            assert np.array_equal(leaf, flat_b[path]), path

    @pytest.mark.parametrize(
        "encoder_type",
        ["transformer", pytest.param("conformer", marks=pytest.mark.slow)],
    )
    def test_pipelined_loss_matches_plain(self, encoder_type):
        """asr_loss_pipelined == asr_loss (train=False) to numeric
        precision: the GPipe schedule is a reordering, not an
        approximation. 2 stages x 2 blocks — the deeper 4-stage schedule
        is covered by TestPipelineApply and the driver dryrun (stage 5)."""
        from speech_recognition_tools_tpu.models.transformer_asr import (
            asr_loss,
            asr_loss_pipelined,
            split_pipeline_params,
        )

        model, cfg = self._model(encoder_type=encoder_type)
        rs = np.random.RandomState(1)
        b = self._batch(rs)
        params = model.init(
            {"params": jax.random.key(1)},
            b["feats"], b["lengths"], b["tokens"],
        )
        ref, aux_ref = asr_loss(
            model, params, b, jax.random.key(2), cfg, train=False
        )
        mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))
        rest, stacked = split_pipeline_params(params, 2)
        got, aux = asr_loss_pipelined(
            model, rest, stacked, b, cfg, mesh, n_micro=2
        )
        assert abs(float(got) - float(ref)) < 2e-4, (float(got), float(ref))
        assert abs(float(aux["ctc"]) - float(aux_ref["ctc"])) < 2e-4

    def test_pipelined_loss_chunked_attention_matches_plain(self):
        """Streaming-config (attn_chunk) models train under PP too: the
        chunk mask is built inside the encoder blocks from the shared
        config, so the GPipe stages apply it identically to the plain
        loss."""
        from speech_recognition_tools_tpu.models.transformer_asr import (
            asr_loss,
            asr_loss_pipelined,
            split_pipeline_params,
        )

        model, cfg = self._model(attn_chunk=2, attn_left_chunks=1)
        rs = np.random.RandomState(5)
        b = self._batch(rs)
        params = model.init(
            {"params": jax.random.key(5)},
            b["feats"], b["lengths"], b["tokens"],
        )
        ref, _ = asr_loss(
            model, params, b, jax.random.key(6), cfg, train=False
        )
        mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))
        rest, stacked = split_pipeline_params(params, 2)
        got, _ = asr_loss_pipelined(
            model, rest, stacked, b, cfg, mesh, n_micro=2
        )
        assert abs(float(got) - float(ref)) < 2e-4, (float(got), float(ref))

    @pytest.mark.slow
    def test_pipelined_loss_dp_x_pp_matches_plain(self):
        """asr_loss_pipelined(data_axis='data') on a 2x2 (data, pipe)
        mesh == asr_loss: sharding microbatch examples over 'data'
        inside the pipeline is a placement change, not a numeric one.
        This is the loss train_e2e runs when --data_parallel and
        --pipeline_parallel are both given (also driven by dryrun 5b)."""
        from speech_recognition_tools_tpu.models.transformer_asr import (
            asr_loss,
            asr_loss_pipelined,
            split_pipeline_params,
        )

        model, cfg = self._model()
        rs = np.random.RandomState(6)
        b = self._batch(rs)  # B=4 -> n_micro=2, 1 example per data shard
        params = model.init(
            {"params": jax.random.key(8)},
            b["feats"], b["lengths"], b["tokens"],
        )
        ref, aux_ref = asr_loss(
            model, params, b, jax.random.key(9), cfg, train=False
        )
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                    ("data", "pipe"))
        bsh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")
        )
        b = jax.tree.map(lambda x: jax.device_put(x, bsh), b)
        rest, stacked = split_pipeline_params(params, 2)
        got, aux = asr_loss_pipelined(
            model, rest, stacked, b, cfg, mesh, n_micro=2,
            data_axis="data",
        )
        assert abs(float(got) - float(ref)) < 2e-4, (float(got), float(ref))
        assert abs(float(aux["ctc"]) - float(aux_ref["ctc"])) < 2e-4

    def test_pp_opt_state_roundtrip_bit_exact(self):
        """pp_opt_state_from_loop/to_loop invert each other over a real
        optax chain (clip -> adam), so a PP resume carries the moments
        and step count."""
        import optax

        from speech_recognition_tools_tpu.models.transformer_asr import (
            pp_opt_state_from_loop,
            pp_opt_state_to_loop,
        )

        model, cfg = self._model()
        rs = np.random.RandomState(2)
        b = self._batch(rs)
        params = model.init(
            {"params": jax.random.key(4)},
            b["feats"], b["lengths"], b["tokens"],
        )
        tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
        loop_opt = tx.init(params)
        back = pp_opt_state_to_loop(pp_opt_state_from_loop(loop_opt, 2))
        la = jax.tree_util.tree_leaves_with_path(loop_opt)
        lb = dict(jax.tree_util.tree_leaves_with_path(back))
        assert len(la) == len(lb)
        for path, leaf in la:
            assert np.array_equal(np.asarray(leaf), np.asarray(lb[path])), path

    @pytest.mark.slow
    def test_pipelined_dropout_streams(self):
        """With an rng, the pipelined loss is reproducible per key,
        differs across keys and from the deterministic path, and grads
        still flow to the stacked stage params."""
        from speech_recognition_tools_tpu.models.transformer_asr import (
            asr_loss_pipelined,
            split_pipeline_params,
        )

        model, cfg = self._model(dropout=0.1)
        rs = np.random.RandomState(3)
        b = self._batch(rs)
        params = model.init(
            {"params": jax.random.key(5), "dropout": jax.random.key(6)},
            b["feats"], b["lengths"], b["tokens"],
        )
        mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))
        rest, stacked = split_pipeline_params(params, 2)

        def loss(rng, s=stacked):
            return asr_loss_pipelined(
                model, rest, s, b, cfg, mesh, n_micro=2, rng=rng
            )[0]

        det = asr_loss_pipelined(
            model, rest, stacked, b, cfg, mesh, n_micro=2
        )[0]
        l1, l1b = loss(jax.random.key(7)), loss(jax.random.key(7))
        l2 = loss(jax.random.key(8))
        assert float(l1) == float(l1b)
        assert float(l1) != float(l2)
        assert float(l1) != float(det)
        g = jax.grad(lambda s: loss(jax.random.key(7), s))(stacked)
        gn = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
        assert np.isfinite(gn) and gn > 0

    @pytest.mark.slow
    def test_train_e2e_pipeline_ragged_batches_and_specaug(
        self, tmp_path, capsys
    ):
        """--pipeline_parallel survives ragged tail batches (trimmed to
        a multiple of pp_microbatches x data shards with a NOTE, not a
        microbatch ValueError) and applies --specaug in the PP step."""
        from speech_recognition_tools_tpu.cli import train_e2e
        from speech_recognition_tools_tpu.io import build_egs

        rs = np.random.RandomState(11)
        feats = {
            f"u{i}": rs.randn(40, 8).astype(np.float32) for i in range(7)
        }
        egs = str(tmp_path / "egs_rag")
        build_egs(iter(feats.items()), egs)
        text = tmp_path / "text_rag"
        text.write_text("".join(f"u{i} ab cab\n" for i in range(7)))
        out = str(tmp_path / "e2e_rag")
        # batch_size 4 over 7 utts -> tail batch of 3: trimmed to 2
        train_e2e.main(
            [egs, str(text), out, "--adim", "16", "--aheads", "2",
             "--elayers", "2", "--eunits", "24", "--dlayers", "1",
             "--dunits", "24", "--epochs", "1", "--batch_size", "4",
             "--warmup_steps", "10", "--average_last", "1",
             "--dropout", "0.1", "--seed", "7", "--specaug",
             "--pipeline_parallel", "2", "--pp_microbatches", "2"]
        )
        txt = capsys.readouterr().out
        assert "trimming ragged batches" in txt
        assert "epoch 1:" in txt

    @pytest.mark.slow
    def test_train_e2e_pipeline_cli_loss_parity(self, tmp_path, capsys):
        """--pipeline_parallel 4 trains through the CLI with per-epoch
        loss parity vs the single-device run, and the checkpoints stay
        loop-layout (recog-compatible)."""
        import re

        from speech_recognition_tools_tpu.cli import train_e2e
        from speech_recognition_tools_tpu.io import build_egs

        def run(tag, extra):
            rs = np.random.RandomState(9)
            feats = {
                f"u{i}": rs.randn(40, 8).astype(np.float32)
                for i in range(8)
            }
            egs = str(tmp_path / f"egs_{tag}")
            build_egs(iter(feats.items()), egs)
            text = tmp_path / f"text_{tag}"
            text.write_text("".join(f"u{i} ab cab\n" for i in range(8)))
            out = str(tmp_path / f"e2e_{tag}")
            train_e2e.main(
                [egs, str(text), out, "--adim", "16", "--aheads", "2",
                 "--elayers", "4", "--eunits", "24", "--dlayers", "1",
                 "--dunits", "24", "--epochs", "2", "--batch_size", "8",
                 "--warmup_steps", "10", "--average_last", "2",
                 "--dropout", "0.0", "--seed", "5"] + extra
            )
            txt = capsys.readouterr().out
            return [float(m) for m in re.findall(r"loss ([\d.]+)", txt)], out

        base, _ = run("base", [])
        pp, out = run("pp", ["--pipeline_parallel", "4",
                             "--pp_microbatches", "2"])
        assert len(base) == len(pp) and base
        for a, b in zip(base, pp):
            assert abs(a - b) < 5e-3 * max(1.0, abs(a)), (base, pp)
        # PP resume carries the optimizer state: epoch checkpoints store
        # loop-layout opt_state, and a third epoch resumes from it
        import os

        from speech_recognition_tools_tpu.train.checkpoint import (
            load_checkpoint,
        )

        assert "opt_state" in load_checkpoint(
            os.path.join(out, "epoch_2")
        )[0]
        import shutil

        shutil.rmtree(os.path.join(out, "final_avg"))
        train_e2e.main(
            [str(tmp_path / "egs_pp"), str(tmp_path / "text_pp"), out,
             "--adim", "16", "--aheads", "2", "--elayers", "4",
             "--eunits", "24", "--dlayers", "1", "--dunits", "24",
             "--epochs", "3", "--batch_size", "8", "--warmup_steps", "10",
             "--average_last", "2", "--dropout", "0.0", "--seed", "5",
             "--pipeline_parallel", "4", "--pp_microbatches", "2"]
        )
        txt = capsys.readouterr().out
        assert "resumed from" in txt and "epoch 3:" in txt

        # loop-layout checkpoint: recog loads it unchanged, and the
        # --ring_attention path decodes the same hypotheses
        from speech_recognition_tools_tpu.cli import recog_e2e

        hyp = str(tmp_path / "hyp_pp.txt")
        recog_e2e.main([out, str(tmp_path / "egs_pp"), hyp,
                        "--beam_size", "2", "--max_len", "6"])
        hyp_ring = str(tmp_path / "hyp_ring.txt")
        recog_e2e.main([out, str(tmp_path / "egs_pp"), hyp_ring,
                        "--beam_size", "2", "--max_len", "6",
                        "--ring_attention", "4"])
        assert open(hyp).read() == open(hyp_ring).read()
