"""SpecAugment, async prefetch, CURL ELBO losses, curl_unsup training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_recognition_tools_tpu.dsp.specaug import SpecAugConfig, spec_augment
from speech_recognition_tools_tpu.io.prefetch import prefetch_to_device
from speech_recognition_tools_tpu.models.curl import (
    CurlSupervised,
    curl_loss_supervised,
    curl_loss_unsupervised,
    random_mixture_means,
)

RS = np.random.RandomState(8)


class TestSpecAug:
    def test_masks_and_shapes(self):
        B, T, D = 3, 60, 40
        feats = jnp.asarray(RS.rand(B, T, D) + 1.0, jnp.float32)
        lengths = jnp.asarray([60, 50, 30])
        out = spec_augment(jax.random.key(0), feats, lengths)
        assert out.shape == feats.shape
        # something changed, nothing exploded
        assert not np.allclose(np.asarray(out), np.asarray(feats))
        assert np.all(np.isfinite(np.asarray(out)))

    def test_zero_fill_masks_to_zero(self):
        cfg = SpecAugConfig(max_time_warp=0, replace_with_zero=True,
                            freq_mask_width=10, time_mask_width=20)
        feats = jnp.ones((2, 50, 30), jnp.float32)
        out = spec_augment(jax.random.key(1), feats, jnp.asarray([50, 50]), cfg)
        assert float(jnp.min(out)) == 0.0 and float(jnp.max(out)) == 1.0

    def test_no_ops_config(self):
        cfg = SpecAugConfig(max_time_warp=0, n_freq_masks=0, n_time_masks=0)
        feats = jnp.asarray(RS.rand(1, 40, 10), jnp.float32)
        out = spec_augment(jax.random.key(2), feats, jnp.asarray([40]), cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(feats))


class TestPrefetch:
    def test_order_and_content(self):
        batches = [{"x": np.full((4,), i, np.float32)} for i in range(7)]
        got = list(prefetch_to_device(iter(batches), size=3))
        assert len(got) == 7
        for i, b in enumerate(got):
            np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])

    def test_propagates_errors(self):
        def bad():
            yield {"x": np.ones(2)}
            raise RuntimeError("boom")

        import pytest

        it = prefetch_to_device(bad(), size=2)
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            list(it)


class TestCurlLosses:
    def _setup(self):
        B, T, D, K, bn = 2, 12, 6, 3, 4
        m = CurlSupervised(num_layers_enc=1, num_layers_dec=1, hidden_size=8,
                           bn_size=bn, comp_num=K)
        x = jnp.asarray(RS.randn(B, T, D), jnp.float32)
        lengths = jnp.asarray([T, T - 4])
        params = m.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            x, lengths,
        )
        recon, latent = m.apply(
            params, x, lengths, rngs={"sample": jax.random.key(2)}
        )
        mean_p = random_mixture_means(jax.random.key(3), K, bn)
        mask = jnp.arange(T)[None, :] < lengths[:, None]
        return x, recon, latent, mean_p, mask

    def test_losses_finite_and_masked(self):
        x, recon, latent, mean_p, mask = self._setup()
        sup = curl_loss_supervised(x, recon, latent, mean_p, 1, mask)
        unsup = curl_loss_unsupervised(x, recon, latent, mean_p, mask)
        assert np.isfinite(float(sup)) and np.isfinite(float(unsup))

    @pytest.mark.slow
    def test_train_am_curl_unsup(self, tmp_path):
        from speech_recognition_tools_tpu.cli import train_am
        from speech_recognition_tools_tpu.io import build_egs

        feats = {f"u{i}": RS.randn(20, 6).astype(np.float32) for i in range(4)}
        egs = str(tmp_path / "egs")
        build_egs(iter(feats.items()), egs)
        out = str(tmp_path / "curl_unsup")
        train_am.main(
            [egs, out, "--arch", "curl_unsup", "--num_layers", "1",
             "--num_layers_dec", "1", "--hidden_dim", "8", "--bn_dim", "4",
             "--comp_num", "2", "--epochs", "1", "--batch_size", "2",
             "--loss", "mse"]
        )
        import os

        assert os.path.exists(os.path.join(out, "final", "state.msgpack"))
