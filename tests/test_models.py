"""Model zoo tests: shapes, differentiability, masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tools_tpu import models as M

B, T, D, OUT = 2, 12, 10, 7
KEYS = {"params": jax.random.key(0), "sample": jax.random.key(1),
        "gumbel": jax.random.key(2), "dropout": jax.random.key(3)}


def _seq():
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, D), jnp.float32)
    lengths = jnp.asarray([T, T - 4])
    return x, lengths


class TestRecurrent:
    def test_feedforward_taps(self):
        x, _ = _seq()
        m = M.FeedforwardClassifier(num_layers=3, hidden_size=16, out_size=OUT)
        params = m.init(KEYS, x)
        embeds, logits = m.apply(params, x)
        assert len(embeds) == 3 and logits.shape == (B, T, OUT)
        assert all(e.shape == (B, T, 16) for e in embeds)

    def test_rnn_classifier_shape_and_grad(self):
        x, lengths = _seq()
        m = M.RNNClassifier(num_layers=2, hidden_size=16, out_size=OUT, dropout=0.1)
        params = m.init(KEYS, x, lengths)
        out = m.apply(params, x, lengths)
        assert out.shape == (B, T, OUT)

        def loss(p):
            o = m.apply(p, x, lengths)
            return jnp.sum(o**2)

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(jnp.all(jnp.isfinite(l)) for l in leaves)
        assert any(jnp.any(l != 0) for l in leaves)

    def test_masking_invariance(self):
        """Frames past `lengths` must not affect valid outputs (packed-
        sequence semantics)."""
        x, lengths = _seq()
        m = M.RNNClassifier(num_layers=2, hidden_size=16, out_size=OUT)
        params = m.init(KEYS, x, lengths)
        out1 = m.apply(params, x, lengths)
        x2 = x.at[1, T - 4 :, :].set(999.0)  # poison padded frames of utt 1
        out2 = m.apply(params, x2, lengths)
        np.testing.assert_allclose(
            np.asarray(out1[1, : T - 4]), np.asarray(out2[1, : T - 4]), atol=1e-6
        )

    def test_multitask_ae(self):
        x, lengths = _seq()
        m = M.AEClassifierMultitask(
            out_size=OUT, num_layers_enc=1, num_layers_class=1, num_layers_ae=1,
            hidden_size=8, bn_size=4,
        )
        params = m.init(KEYS, x, lengths)
        logits, recon = m.apply(params, x, lengths)
        assert logits.shape == (B, T, OUT) and recon.shape == (B, T, D)

    def test_aear(self):
        x, lengths = _seq()
        m = M.AEClassifierMultitaskAEAR(
            out_size=OUT, num_layers_enc=1, num_layers_class=1, num_layers_ae=1,
            hidden_size=8, bn_size=4, time_shift=2,
        )
        params = m.init(KEYS, x, lengths)
        logits, recon, recon_ar = m.apply(params, x, lengths)
        assert recon_ar.shape == (B, T - 2, D)

    def test_multistream(self):
        x, lengths = _seq()
        m = M.MultistreamRNN(
            num_streams=3, num_layers_subband=1, hidden_size_subband=6,
            num_layers=1, out_size=OUT,
        )
        params = m.init(KEYS, [x, x, x], lengths)
        out = m.apply(params, [x, x, x], lengths)
        assert out.shape == (B, T, OUT)

    def test_autoencoder_rnn_pm(self):
        x, lengths = _seq()
        m = M.AutoencoderRNN(num_layers_enc=1, num_layers_dec=1, hidden_size=8, bn_size=3)
        params = m.init(KEYS, x, lengths)
        recon, z = m.apply(params, x, lengths)
        assert recon.shape == (B, T, D) and z.shape == (B, T, 3)


class TestVAE:
    @pytest.mark.parametrize("use_transformer", [False, True])
    def test_vae(self, use_transformer):
        x, lengths = _seq()
        m = M.VAE(num_layers_enc=1, num_layers_dec=1, hidden_size=16, bn_size=4,
                  use_transformer=use_transformer, nhead=2)
        params = m.init(KEYS, x, lengths)
        recon, (means, logvars) = m.apply(
            params, x, lengths, rngs={"sample": jax.random.key(9)}
        )
        assert recon.shape == (B, T, D)
        assert means.shape == (B, T, 4) and logvars.shape == (B, T, 4)
        ll, kl = M.vae_loss(x, recon, (means, logvars), "gauss")
        assert np.isfinite(float(ll)) and np.isfinite(float(kl))
        ll2, kl2 = M.vae_loss(x, recon, (means, logvars), "laplace")
        assert np.isfinite(float(ll2))

    def test_vae_only_ae(self):
        x, lengths = _seq()
        m = M.VAE(num_layers_enc=1, num_layers_dec=1, hidden_size=8, bn_size=4, only_ae=True)
        params = m.init(KEYS, x, lengths)
        recon, _ = m.apply(params, x, lengths)
        assert recon.shape == (B, T, D)

    def test_vae_classifier(self):
        x, lengths = _seq()
        m = M.VAEClassifier(
            out_size=OUT, num_layers_enc=1, num_layers_class=1, num_layers_ae=1,
            hidden_size=8, bn_size=4,
        )
        params = m.init(KEYS, x, lengths)
        logits, recon, latent = m.apply(
            params, x, lengths, rngs={"sample": jax.random.key(5)}
        )
        assert logits.shape == (B, T, OUT) and recon.shape == (B, T, D)

    def test_arvae(self):
        x, lengths = _seq()
        m = M.ARVAE(num_layers_enc=1, num_layers_dec=1, hidden_size=8, bn_size=4, num_outs=3)
        params = m.init(KEYS, x, lengths)
        outs, latent = m.apply(params, x, lengths, rngs={"sample": jax.random.key(5)})
        assert outs.shape == (3, B, T, D)

    def test_vae_encoded_classifier(self):
        x, lengths = _seq()
        m = M.VAEEncodedClassifier(num_layers=2, hidden_size=8, out_size=OUT)
        latent_means = x[..., :4]
        params = m.init(KEYS, latent_means)
        out = m.apply(params, latent_means)
        assert out.shape == (B, T, OUT)


class TestCURL:
    def _model_and_params(self, comp_num=2):
        x, lengths = _seq()
        m = M.CurlMultistreamClassifier(
            out_size=OUT, num_layers_enc=1, num_layers_dec=1, num_layers_class=1,
            hidden_size=8, hidden_size_classifier=8, bn_size=4, comp_num=comp_num,
        )
        params = m.init(KEYS, x, lengths)
        return m, params, x, lengths

    def test_curl_supervised(self):
        x, lengths = _seq()
        m = M.CurlSupervised(
            num_layers_enc=1, num_layers_dec=1, hidden_size=8, bn_size=4, comp_num=3
        )
        params = m.init(KEYS, x, lengths)
        recon, (cat, means, logvars) = m.apply(
            params, x, lengths, rngs={"sample": jax.random.key(5)}
        )
        assert recon.shape == (3, B, T, D)
        assert cat.shape == (B, T, 3) and means.shape == (3, B, T, 4)
        np.testing.assert_allclose(np.asarray(jnp.sum(cat, -1)), 1.0, atol=1e-5)

    def test_curl_multistream_classifier(self):
        m, params, x, lengths = self._model_and_params()
        class_out, recon, latent = m.apply(
            params, x, lengths, rngs={"sample": jax.random.key(5)}
        )
        assert class_out.shape == (2, B, T, OUT)
        assert recon.shape == (2, B, T, D)
        feats = M.compute_latent_features(latent)
        assert feats.shape == (B, T, 4)

    def test_expand_component(self):
        m, params, x, lengths = self._model_and_params(comp_num=2)
        m2, params2 = M.expand_component(m, params, jax.random.key(7), (x, lengths))
        assert m2.comp_num == 3
        class_out, recon, latent = m2.apply(
            params2, x, lengths, rngs={"sample": jax.random.key(5)}
        )
        assert class_out.shape == (3, B, T, OUT)
        # old components' posterior-mean heads must be preserved:
        old_means = np.asarray(params["params"]["curl_encoder"]["means"]["kernel"])
        new_means = np.asarray(params2["params"]["curl_encoder"]["means"]["kernel"])
        np.testing.assert_array_equal(new_means[:, : old_means.shape[1]], old_means)

    def test_curl_encoded_classifier(self):
        m, params, x, lengths = self._model_and_params()
        _, _, latent = m.apply(params, x, lengths, rngs={"sample": jax.random.key(5)})
        feats = M.compute_latent_features(latent)
        head = M.CurlEncodedClassifier(num_layers=2, hidden_size=8, out_size=OUT)
        hp = head.init(KEYS, feats)
        assert head.apply(hp, feats).shape == (B, T, OUT)


class TestModnet:
    def test_modulation_net(self):
        x = jnp.asarray(np.random.RandomState(0).randn(B, 1, 6, 20), jnp.float32)
        m = M.ModulationNet(
            input_h=6, in_channels=(1,), out_channels=(2,), kernel=3,
            freq_num=5, wind_size=0.5, head_num=3, num_layers_dec=2,
            hidden_size=8, out_size=OUT,
        )
        params = m.init(KEYS, x)
        logits, mod_f = m.apply(params, x, rngs={"gumbel": jax.random.key(4)})
        assert logits.shape == (B, OUT) and mod_f.shape == (B, 3)

    def test_modulation_sigmoid_net(self):
        x = jnp.asarray(np.random.RandomState(0).randn(B, 1, 6, 20), jnp.float32)
        m = M.ModulationSigmoidNet(
            in_channels=(1,), out_channels=(2,), kernel=3, input_filter_kernel=5,
            freq_num=4, wind_size=0.5, num_layers_dec=2, hidden_size=8, out_size=OUT,
        )
        params = m.init(KEYS, x)
        logits, mean_mod = m.apply(params, x)
        assert logits.shape == (B, OUT)

    def test_gumbel_straight_through(self):
        logits = jnp.asarray(np.random.RandomState(0).randn(4, 6), jnp.float32)
        y = M.gumbel_softmax(jax.random.key(0), logits, 0.8)
        np.testing.assert_allclose(np.asarray(jnp.sum(y, -1)), 1.0, atol=1e-5)
        assert np.allclose(np.sort(np.asarray(y), axis=-1)[:, :-1].max(), 0.0)


class TestCNN:
    def test_cnn_classifier(self):
        x = jnp.asarray(np.random.RandomState(0).randn(B, 1, 9, 11), jnp.float32)
        m = M.CnnClassifier(
            in_channels=(1,), out_channels=(4,), kernel=3, num_layers_dec=2,
            hidden_size=8, output_size=OUT,
        )
        params = m.init(KEYS, x)
        assert m.apply(params, x).shape == (B, OUT)

    def test_cnn_frame_classifier(self):
        x = jnp.asarray(np.random.RandomState(0).randn(B, 1, 9, T), jnp.float32)
        m = M.CNNFrameClassifier(out_channels=(4, 4), kernel=(3, 3), output_size=OUT)
        params = m.init(KEYS, x)
        assert m.apply(params, x).shape == (B, T, OUT)

    def test_cldnn(self):
        x = jnp.asarray(np.random.RandomState(0).randn(B, 1, 9, T), jnp.float32)
        lengths = jnp.asarray([T, T - 3])
        m = M.CLDNN(out_channels=(4,), kernel=(3, 3), hidden_size=8,
                    l_num_layers=1, d_num_layers=2, output_size=OUT)
        params = m.init(KEYS, x, lengths)
        assert m.apply(params, x, lengths).shape == (B, T, OUT)

    def test_cldnn3d(self):
        x = jnp.asarray(np.random.RandomState(0).randn(B, 1, 3, 9, T), jnp.float32)
        lengths = jnp.asarray([T, T - 3])
        m = M.CLDNN3D(num_streams=3, out_channels=(4,), kernel=(3, 3), hidden_size=8,
                      l_num_layers=1, d_num_layers=2, output_size=OUT)
        params = m.init(KEYS, x, lengths)
        assert m.apply(params, x, lengths).shape == (B, T, OUT)

    def test_vae_cnn_pooled_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).randn(B, 1, 8, 12), jnp.float32)
        m = M.VAECNN(in_channels=(1, 4), out_channels=(4, 8), kernel=(3, 3), bn_size=5)
        params = m.init(KEYS, x)
        recon, (means, logvars) = m.apply(params, x, rngs={"sample": jax.random.key(5)})
        assert recon.shape == x.shape and means.shape == (B, 5)

    def test_vae_cnn_nopool(self):
        x = jnp.asarray(np.random.RandomState(0).randn(B, 1, 8, 12), jnp.float32)
        m = M.VAECNNNopool(in_channels=(1, 4), out_channels=(4, 8), kernel=(3, 3), bn_size=5)
        params = m.init(KEYS, x)
        recon, (means, logvars) = m.apply(params, x, rngs={"sample": jax.random.key(5)})
        assert recon.shape == x.shape and means.shape == (B, 12, 5)

    def test_cnn_ae(self):
        x = jnp.asarray(np.random.RandomState(0).randn(B, 1, 8, 12), jnp.float32)
        m = M.CNNAE(in_channels=(1, 4), out_channels=(4, 8), kernel=(3, 3), bn_size=5)
        params = m.init(KEYS, x)
        recon, z = m.apply(params, x)
        assert recon.shape == x.shape

    @pytest.mark.slow
    def test_rate_scale_vae(self):
        x = jnp.asarray(np.random.RandomState(0).randn(B, 1, 8, 12), jnp.float32)
        m = M.VaeRsModulation(in_channels=(1, 4), out_channels=(4, 8), kernel=(3, 3), bn_size=5)
        params = m.init(KEYS, x)
        recon, latent = m.apply(params, x, rngs={"sample": jax.random.key(5)})
        assert recon.shape == x.shape
        # rate/scale params are learnable
        def loss(p):
            r, _ = m.apply(p, x, rngs={"sample": jax.random.key(5)})
            return jnp.sum(r**2)
        g = jax.grad(loss)(params)
        assert float(jnp.sum(jnp.abs(g["params"]["enc_rs"]["rates"]))) > 0

    def test_unpool_inverts_pool(self):
        from speech_recognition_tools_tpu.models.cnn import (
            _maxpool_with_indices, _maxunpool,
        )
        x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 8, 2), jnp.float32)
        pooled, idx = _maxpool_with_indices(x)
        up = _maxunpool(pooled, idx, (6, 8))
        # every pooled max value must land back at its argmax position
        assert np.allclose(np.asarray(jnp.max(up, (1, 2))), np.asarray(jnp.max(x, (1, 2))))
        nonzero = np.asarray(up) != 0
        assert nonzero.sum() <= pooled.size
