"""Expert parallelism (parallel/ep.py + CurlMultistreamClassifierEP):
the vmapped-expert layout must be numerically identical to the loop
layout, and the expert axis must shard over a mesh axis (SURVEY.md §2.8
EP row: the reference runs CURL components serially)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from speech_recognition_tools_tpu.models.curl import (
    CurlMultistreamClassifier,
    CurlMultistreamClassifierEP,
    curl_params_to_ep,
)
from speech_recognition_tools_tpu.parallel.ep import (
    expert_param_sharding,
    stack_expert_params,
    unstack_expert_params,
    vmap_experts,
)
from speech_recognition_tools_tpu.models.recurrent import DecoderRNN


def _model_kwargs(K):
    return dict(
        out_size=7, num_layers_enc=1, num_layers_dec=1, num_layers_class=1,
        hidden_size=12, hidden_size_classifier=10, bn_size=4, comp_num=K,
    )


class TestVmapExperts:
    def test_matches_per_expert_loop(self):
        """vmap_experts(DecoderRNN) with stacked per-expert params equals
        applying each expert's DecoderRNN separately."""
        K, B, T, D, H = 4, 2, 6, 5, 8
        base = DecoderRNN(1, H, 3)
        rs = np.random.RandomState(0)
        z = jnp.asarray(rs.randn(K, B, T, D), jnp.float32)
        lengths = jnp.asarray([T, T - 2], jnp.int32)
        plist = [
            base.init(jax.random.key(i), z[0], lengths) for i in range(K)
        ]
        ref = jnp.stack(
            [base.apply(plist[i], z[i], lengths) for i in range(K)]
        )

        vmod = vmap_experts(DecoderRNN, K)(1, H, 3)
        stacked = stack_expert_params(plist)
        got = vmod.apply(stacked, z, lengths)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        # round-trip
        back = unstack_expert_params(stacked, K)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            back, plist,
        )


class TestCurlEP:
    @pytest.mark.slow
    def test_ep_layout_matches_loop_layout(self):
        K, B, T, D = 4, 2, 8, 6
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randn(B, T, D), jnp.float32)
        lengths = jnp.asarray([T, T - 3], jnp.int32)

        loop = CurlMultistreamClassifier(**_model_kwargs(K))
        params = loop.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            x, lengths,
        )
        rng = jax.random.key(2)
        ref_cls, ref_rec, (ref_cat, ref_m, ref_v) = loop.apply(
            params, x, lengths, rng=rng
        )

        ep = CurlMultistreamClassifierEP(**_model_kwargs(K))
        ep_params = curl_params_to_ep(params, K)
        got_cls, got_rec, (got_cat, got_m, got_v) = ep.apply(
            ep_params, x, lengths, rng=rng
        )
        np.testing.assert_array_equal(np.asarray(got_cls), np.asarray(ref_cls))
        np.testing.assert_array_equal(np.asarray(got_rec), np.asarray(ref_rec))
        np.testing.assert_array_equal(np.asarray(got_cat), np.asarray(ref_cat))
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))

    def test_expert_axis_shards_over_mesh(self):
        """Experts sharded over a 4-device 'model' axis: same outputs,
        and a grad step executes with the sharded layout."""
        assert jax.device_count() >= 8
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4),
                    ("data", "model"))
        K, B, T, D = 4, 2, 8, 6
        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.randn(B, T, D), jnp.float32)
        lengths = jnp.asarray([T, T], jnp.int32)
        rng = jax.random.key(3)

        ep = CurlMultistreamClassifierEP(**_model_kwargs(K))
        params = ep.init(
            {"params": jax.random.key(4), "sample": jax.random.key(5)},
            x, lengths,
        )
        ref_cls, ref_rec, _ = ep.apply(params, x, lengths, rng=rng)

        from speech_recognition_tools_tpu.parallel.tp import shard_params

        spec = expert_param_sharding(mesh, "model", num_experts=K)
        sharded = shard_params(params, mesh, spec)
        # leading expert axis really is distributed
        lead = sharded["params"]["classifiers"]["regression"]["kernel"]
        assert len(lead.sharding.device_set) == 4

        with mesh:
            got_cls, got_rec, _ = jax.jit(
                lambda p: ep.apply(p, x, lengths, rng=rng)
            )(sharded)
            np.testing.assert_allclose(
                np.asarray(got_cls), np.asarray(ref_cls), atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(got_rec), np.asarray(ref_rec), atol=1e-6
            )

            def loss(p):
                cls, rec, _ = ep.apply(p, x, lengths, rng=rng)
                return jnp.mean(cls**2) + jnp.mean(rec**2)

            g = jax.jit(jax.grad(loss))(sharded)
            gl = g["params"]["classifiers"]["regression"]["kernel"]
            assert np.isfinite(float(jnp.sum(gl)))


class TestTrainAmEP:
    @pytest.mark.slow
    def test_train_am_expert_parallel_cli(self, tmp_path):
        """train_am --arch curl --expert_parallel 4 --data_parallel: the
        EP layout trains end-to-end, checkpoints, and the checkpoint
        config rebuilds the EP model class."""
        import os

        from speech_recognition_tools_tpu.cli import train_am
        from speech_recognition_tools_tpu.cli.dump_outputs import (
            load_model_from_checkpoint,
        )
        from speech_recognition_tools_tpu.io import build_egs

        rs = np.random.RandomState(5)
        feats = {f"u{i}": rs.randn(16, 6).astype(np.float32)
                 for i in range(4)}
        labels = {k: rs.randint(0, 5, 16).astype(np.int32) for k in feats}
        egs = str(tmp_path / "egs")
        build_egs(iter(feats.items()), egs, labels=labels, num_targets=5)
        out = str(tmp_path / "curl_ep")
        train_am.main(
            [egs, out, "--arch", "curl", "--expert_parallel", "4",
             "--data_parallel", "--comp_num", "4", "--num_layers", "1",
             "--num_layers_dec", "1", "--hidden_dim", "8", "--bn_dim", "3",
             "--epochs", "1", "--batch_size", "2"]
        )
        assert os.path.exists(os.path.join(out, "final"))
        model, _, cfg = load_model_from_checkpoint(out)
        assert type(model).__name__ == "CurlMultistreamClassifierEP"
        assert cfg["model_class"] == "CurlMultistreamClassifierEP"
