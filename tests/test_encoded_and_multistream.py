"""Tests for the encoded-classifier family, true multi-stream egs, and
frame-level egs (reference train_VAE_encoded_nnet_classfier.py,
train_CURL_encoded_classifier.py, compute_vae_encoded_likelihood.py,
train_multimod_nnet.py / nnetDataset3Seq, data_prep_feedforward.py)."""

import numpy as np
import pytest

from speech_recognition_tools_tpu.io import (
    build_egs,
    build_frame_egs,
    iter_egs_batches_multi,
    iter_frame_batches,
    load_egs_multi,
)

RS = np.random.RandomState(23)


def _make_egs(tmp_path, name, dim, n_utts=4, T=24, num_targets=3, keys=None):
    keys = keys or [f"u{i}" for i in range(n_utts)]
    feats = {k: RS.randn(T, dim).astype(np.float32) for k in keys}
    labels = {k: RS.randint(0, num_targets, T).astype(np.int32) for k in keys}
    out = str(tmp_path / name)
    build_egs(iter(feats.items()), out, labels=labels, num_targets=num_targets)
    return out, feats, labels


class TestFrameEgs:
    def test_build_and_iterate(self, tmp_path):
        feats = {f"u{i}": RS.randn(10, 4).astype(np.float32) for i in range(3)}
        labels = {k: RS.randint(0, 5, 10).astype(np.int32) for k in feats}
        out = str(tmp_path / "fegs")
        build_frame_egs(iter(feats.items()), out, labels, context=2,
                        num_targets=5)
        batches = list(iter_frame_batches(out, batch_size=8))
        # 30 frames, batch 8 -> 3 full batches (tail dropped)
        assert len(batches) == 3
        for b in batches:
            assert b["feats"].shape == (8, 4 * 5)  # spliced +/-2
            assert b["labels"].shape == (8,)
        # splicing: frame t of utt u must contain the raw frame at its center
        all_feats = np.concatenate([b["feats"] for b in batches])
        raw = np.concatenate([feats[k] for k in feats])
        centers = all_feats[:, 2 * 4 : 3 * 4]
        # every center row exists among the raw frames
        for row in centers[:5]:
            assert np.any(np.all(np.isclose(raw, row), axis=1))

    def test_feedforward_frame_training(self, tmp_path):
        from speech_recognition_tools_tpu.cli import train_am

        feats = {f"u{i}": RS.randn(20, 4).astype(np.float32) for i in range(4)}
        labels = {k: RS.randint(0, 3, 20).astype(np.int32) for k in feats}
        egs = str(tmp_path / "fegs")
        build_frame_egs(iter(feats.items()), egs, labels, context=1,
                        num_targets=3)
        out = str(tmp_path / "ff")
        train_am.main(
            [egs, out, "--arch", "feedforward", "--frame_egs",
             "--num_layers", "1", "--hidden_dim", "8",
             "--epochs", "1", "--batch_size", "16"]
        )
        import os

        assert os.path.exists(os.path.join(out, "final"))


class TestMultiStreamEgs:
    def test_load_and_batch(self, tmp_path):
        d1, f1, lab = _make_egs(tmp_path, "s1", 6)
        d2, f2, _ = _make_egs(tmp_path, "s2", 4)
        d3, f3, _ = _make_egs(tmp_path, "s3", 2)
        cfgs, utts = load_egs_multi([d1, d2, d3])
        assert len(utts) == 4 and len(utts[0][1]) == 3
        batches = list(iter_egs_batches_multi(utts, batch_size=2))
        assert len(batches) == 2
        b = batches[0]
        assert isinstance(b["feats"], list) and len(b["feats"]) == 3
        assert b["feats"][0].shape[-1] == 6
        assert b["feats"][1].shape[-1] == 4
        assert b["feats"][2].shape[-1] == 2
        # stream alignment: each stream's rows match the right utterance
        k0 = b["keys"][0]
        np.testing.assert_allclose(b["feats"][1][0, :24], f2[k0])

    def test_missing_utts_dropped(self, tmp_path):
        d1, _, _ = _make_egs(tmp_path, "a1", 3, keys=["x", "y", "z"])
        d2, _, _ = _make_egs(tmp_path, "a2", 3, keys=["x", "z"])
        _, utts = load_egs_multi([d1, d2])
        assert sorted(u[0] for u in utts) == ["x", "z"]

    def test_multimod_train_and_dump(self, tmp_path):
        from speech_recognition_tools_tpu.cli import dump_outputs, train_am

        d1, _, _ = _make_egs(tmp_path, "m1", 6)
        d2, _, _ = _make_egs(tmp_path, "m2", 4)
        out = str(tmp_path / "mm")
        train_am.main(
            [d1, out, "--arch", "multimod", "--multi_egs_dirs", d2,
             "--num_layers", "1", "--num_layers_dec", "1",
             "--hidden_dim", "16", "--epochs", "1", "--batch_size", "2"]
        )
        save = str(tmp_path / "post")
        dump_outputs.main(
            [out, d1, save, "--multi_egs_dirs", d2, "--add_softmax"]
        )
        from speech_recognition_tools_tpu.io import read_mat_scp

        got = dict(read_mat_scp(save + ".scp"))
        assert len(got) == 4
        post = next(iter(got.values()))
        assert post.shape == (24, 3)
        np.testing.assert_allclose(post.sum(-1), 1.0, atol=1e-4)


class TestEncodedClassifiers:
    @pytest.mark.parametrize("base_arch,enc_arch", [
        ("vae", "vae_encoded"),
        pytest.param("curl", "curl_encoded", marks=pytest.mark.slow),
    ])
    def test_train_and_dump(self, tmp_path, base_arch, enc_arch):
        from speech_recognition_tools_tpu.cli import dump_outputs, train_am

        egs, _, _ = _make_egs(tmp_path, "egs", 6)
        base_dir = str(tmp_path / base_arch)
        train_am.main(
            [egs, base_dir, "--arch", base_arch, "--num_layers", "1",
             "--num_layers_dec", "1", "--hidden_dim", "16", "--bn_dim", "4",
             "--comp_num", "2", "--epochs", "1", "--batch_size", "2"]
        )
        enc_dir = str(tmp_path / enc_arch)
        train_am.main(
            [egs, enc_dir, "--arch", enc_arch, "--base_model", base_dir,
             "--num_layers", "1", "--hidden_dim", "16",
             "--epochs", "1", "--batch_size", "2"]
        )
        save = str(tmp_path / "post")
        dump_outputs.main([enc_dir, egs, save, "--add_softmax"])
        from speech_recognition_tools_tpu.io import read_mat_scp

        got = dict(read_mat_scp(save + ".scp"))
        assert len(got) == 4
        post = next(iter(got.values()))
        assert post.shape == (24, 3)
        np.testing.assert_allclose(post.sum(-1), 1.0, atol=1e-4)

    @pytest.mark.slow
    def test_base_params_frozen(self, tmp_path):
        """The generative model must not move during classifier training:
        encode_fn closes over restored params and stop_gradients the
        latents, so the classifier checkpoint holds only classifier params."""
        import jax

        from speech_recognition_tools_tpu.cli import train_am
        from speech_recognition_tools_tpu.cli.dump_outputs import (
            load_frozen_encoder,
            load_model_from_checkpoint,
        )

        egs, feats, _ = _make_egs(tmp_path, "egs", 6)
        base_dir = str(tmp_path / "vae")
        train_am.main(
            [egs, base_dir, "--arch", "vae", "--num_layers", "1",
             "--num_layers_dec", "1", "--hidden_dim", "16", "--bn_dim", "4",
             "--epochs", "1", "--batch_size", "2"]
        )
        import jax.numpy as jnp

        f0 = jnp.asarray(np.stack([feats["u0"], feats["u1"]]))
        l0 = jnp.asarray([24, 24])
        rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
        encode = load_frozen_encoder(base_dir, "vae_encoded", rngs, f0, l0)
        z = encode(f0, l0)
        assert z.shape == (2, 24, 4)  # bn_dim latents
        # gradient through encode_fn is zero (stop_gradient)
        g = jax.grad(lambda x: jnp.sum(encode(x, l0) ** 2))(f0)
        np.testing.assert_allclose(np.asarray(g), 0.0)
