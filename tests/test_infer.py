import pytest
"""Inference/PM/adaptation/lifelong tests, incl. numeric oracles for the
fusion math and m-measure taken from the reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tools_tpu import models as M
from speech_recognition_tools_tpu.infer import (
    AdaptConfig,
    adapt_model,
    autoT_fusion,
    compute_log_prior_from_alignments,
    compute_mmeasure,
    extract_posteriors,
    framewise_vae_score,
    genclassifier_outputs,
    lifelong_fusion_incremental,
    lifelong_fusion_powerset,
    pm_score_contrastive,
    pm_score_reconstruction,
    task_priors,
)
from speech_recognition_tools_tpu.infer.lifelong import powerset

RS = np.random.RandomState(3)
B, T, D, C = 2, 40, 6, 5


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


class TestPosteriorsPriors:
    def test_extract_and_genclassifier(self):
        model = M.FeedforwardClassifier(num_layers=2, hidden_size=8, out_size=C)
        x = jnp.asarray(RS.randn(B, T, D), jnp.float32)
        params = model.init({"params": jax.random.key(0)}, x)

        def apply_fn(feats, lengths):
            return model.apply(params, feats)

        post = extract_posteriors(apply_fn, x, None, layer=0)
        np.testing.assert_allclose(np.asarray(post.sum(-1)), 1.0, atol=1e-5)
        emb = extract_posteriors(apply_fn, x, None, layer=1)
        assert emb.shape == (B, T, 8)

        logits = model.apply(params, x)[1]
        prior = np.log(_softmax(RS.randn(C)))
        ll = genclassifier_outputs(logits, prior, prior_weight=0.8)
        oracle = np.asarray(jax.nn.log_softmax(logits, -1)) - 0.8 * prior
        np.testing.assert_allclose(np.asarray(ll), oracle, atol=1e-6)

    def test_log_prior_from_alignments(self):
        ali = [("u1", np.asarray([0, 0, 1, 2])), ("u2", np.asarray([2, 2]))]
        lp = compute_log_prior_from_alignments(iter(ali), 3)
        np.testing.assert_allclose(np.exp(lp), [2 / 6, 1 / 6, 3 / 6])


class TestLifelong:
    def _posteriors(self, K=3):
        return [_softmax(RS.randn(T, C)) for _ in range(K)]

    def test_powerset(self):
        ps = powerset([0, 1, 2])
        assert len(ps) == 8 and [] in ps and [0, 1, 2] in ps

    def test_powerset_fusion_oracle(self):
        """Replicate the reference loop literally as oracle."""
        K = 2
        all_pcx = self._posteriors(K)
        log_priors = [np.log(_softmax(RS.randn(C))) for _ in range(K)]
        tp = np.asarray([0.7, 0.3])
        got = lifelong_fusion_powerset(all_pcx, log_priors, tp, 0.8)

        num = np.zeros((T, C))
        denom = np.zeros(C)
        for st in powerset(range(K)):
            num_prod = np.ones((T, C))
            denom_prod = np.ones(C)
            perf = 1
            for b in st:
                num_prod *= all_pcx[b]
                perf *= tp[b]
                denom_prod *= np.exp(log_priors[b])
            denom_prod /= denom_prod.sum()
            num_prod = num_prod / num_prod.sum(1)[:, None]
            num += num_prod * perf
            denom += denom_prod
        oracle = np.log(num) - 0.8 * np.log(denom)
        np.testing.assert_allclose(got, oracle, rtol=1e-10)

    def test_postpm_weighted_power_fusion(self):
        """postpm variant: num_prod *= pcx^tp[b]
        (compute_advanced_likelihood_postpm.py:169); oracle replicates
        the reference loop literally."""
        K = 2
        all_pcx = self._posteriors(K)
        log_priors = [np.log(_softmax(RS.randn(C))) for _ in range(K)]
        tp = np.asarray([0.6, 0.4])
        got = lifelong_fusion_powerset(all_pcx, log_priors, tp, 0.8,
                                       weighted_power=True)

        num = np.zeros((T, C))
        denom = np.zeros(C)
        for st in powerset(range(K)):
            num_prod = np.ones((T, C))
            denom_prod = np.ones(C)
            perf = 1
            for b in st:
                num_prod *= np.power(all_pcx[b], tp[b])
                perf *= tp[b]
                denom_prod *= np.exp(log_priors[b])
            denom_prod /= denom_prod.sum()
            num_prod = num_prod / num_prod.sum(1)[:, None]
            num += num_prod * perf
            denom += denom_prod
        oracle = np.log(num) - 0.8 * np.log(denom)
        np.testing.assert_allclose(got, oracle, rtol=1e-10)
        # weighting must actually change the fusion
        plain = lifelong_fusion_powerset(all_pcx, log_priors, tp, 0.8)
        assert np.max(np.abs(plain - got)) > 1e-6

    def test_incremental_fusion(self):
        K = 3
        all_pcx = self._posteriors(K)
        log_priors = [np.log(_softmax(RS.randn(C))) for _ in range(K)]
        tp = np.asarray([0.5, 0.3, 0.2])
        got = lifelong_fusion_incremental(all_pcx, log_priors, tp, 0.8)
        oracle = sum(
            (np.log(all_pcx[k]) - 0.8 * log_priors[k]) * tp[k] for k in range(K)
        ) / K
        np.testing.assert_allclose(got, oracle, rtol=1e-12)

    def test_task_priors_dp(self):
        tp = task_priors("dp", [0.01, 0.02], beta=300.0)
        oracle = np.exp(300 * np.asarray([0.01, 0.02]))
        oracle /= oracle.sum()
        np.testing.assert_allclose(tp, oracle)
        assert tp[1] > tp[0]

    def test_task_priors_modes(self):
        posts = self._posteriors(2)
        for mode in ("mm", "lowent"):
            tp = task_priors(mode, [0.01, 0.02], posteriors=posts)
            assert tp.shape == (2,) and abs(tp.sum() - 1) < 1e-9
        tp = task_priors("fixed", [0, 0], fixed=[0.4, 0.6])
        np.testing.assert_allclose(tp, [0.4, 0.6])

    def test_framewise_vae_score(self):
        x = RS.randn(T, D)
        ae = RS.randn(T, D)
        mu, lv = RS.randn(T, 4), RS.randn(T, 4) * 0.1
        got = framewise_vae_score(x, ae, mu, lv)
        ll = np.mean(-0.5 * (x - ae) ** 2 - 0.5 * np.log(2 * np.pi), axis=1)
        kl = 0.5 * np.mean(1 - mu**2 - np.exp(lv) ** 2 + 2 * lv, axis=1)
        np.testing.assert_allclose(got, ll + kl, rtol=1e-12)

    def test_autoT_picks_best(self):
        K = 2
        all_pcx = self._posteriors(K)
        log_priors = [np.log(_softmax(RS.randn(C))) for _ in range(K)]
        llh, t = autoT_fusion(all_pcx, log_priors, [0.01, 0.015])
        assert llh.shape == (T, C) and t in (1, 10, 50, 100, 200, 300, 500, 1000)


class TestMMeasure:
    def test_oracle(self):
        feats = RS.randn(T, C)
        got = compute_mmeasure(feats, delta_list=(5, 10))
        # literal reference loop
        sm = _softmax(feats)
        acc = 0.0
        for d in (5, 10):
            m = 0.0
            for i in range(d, T):
                x, y = sm[i], sm[i - d]
                m += np.sum(x * np.log(x / y)) + np.sum(y * np.log(y / x))
            acc += m / (T - d)
        np.testing.assert_allclose(got, acc / 2, rtol=1e-10)


class TestPMScore:
    def _pm(self):
        pm = M.AutoencoderRNN(num_layers_enc=1, num_layers_dec=1,
                              hidden_size=8, bn_size=3)
        seq = jnp.asarray(RS.randn(B, T, D), jnp.float32)
        lengths = jnp.asarray([T, T - 5])
        params = pm.init({"params": jax.random.key(0)}, seq, lengths)
        return pm, params, seq, lengths

    def test_reconstruction_score(self):
        pm, params, seq, lengths = self._pm()
        s = pm_score_reconstruction(pm.apply, params, seq, lengths)
        assert s.shape == (B,) and np.all(np.asarray(s) > 0)

    def test_contrastive_score(self):
        pm, params, seq, lengths = self._pm()
        s = pm_score_contrastive(pm.apply, params, seq, lengths, (3, 5, 7))
        assert s.shape == (B,) and np.all(np.isfinite(np.asarray(s)))


class TestAdaptation:
    def test_adapt_reduces_pm_loss_without_touching_pm(self):
        am = M.FeedforwardClassifier(num_layers=2, hidden_size=16, out_size=C)
        pm = M.AutoencoderRNN(num_layers_enc=1, num_layers_dec=1,
                              hidden_size=8, bn_size=3)
        x = jnp.asarray(RS.randn(B, T, D), jnp.float32)
        lengths = jnp.asarray([T, T])
        am_params = am.init({"params": jax.random.key(0)}, x)
        logits0 = am.apply(am_params, x)[1]
        pm_params = pm.init({"params": jax.random.key(1)}, logits0, lengths)
        pm_mean = np.zeros(C, np.float32)

        def am_apply(params, feats, lengths):
            return am.apply(params, feats)

        batches = lambda: iter([dict(feats=x, lengths=lengths)])
        losses = []
        adapted = adapt_model(
            am_apply, am_params, pm.apply, pm_params, pm_mean, batches,
            AdaptConfig(learning_rate=5e-3), epochs=8,
            log_fn=lambda s: losses.append(s),
        )
        # PM loss before vs after
        def pm_loss(params):
            post = am.apply(params, x)[1] - pm_mean
            recon, _ = pm.apply(pm_params, post, lengths)
            return float(jnp.mean((recon - post) ** 2))

        assert pm_loss(adapted) < pm_loss(am_params) * 0.9
        # AM changed, PM untouched by construction (closed-over constant)
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), am_params, adapted
        )
        assert max(jax.tree.leaves(diff)) > 0

    @pytest.mark.slow
    def test_adapt_variants_run(self):
        am = M.FeedforwardClassifier(num_layers=1, hidden_size=8, out_size=C)
        pm = M.AutoencoderRNN(num_layers_enc=1, num_layers_dec=1,
                              hidden_size=8, bn_size=3)
        x = jnp.asarray(RS.randn(B, T, D), jnp.float32)
        lengths = jnp.asarray([T, T])
        am_params = am.init({"params": jax.random.key(0)}, x)
        logits0 = am.apply(am_params, x)[1]
        pm_params = pm.init({"params": jax.random.key(1)}, logits0, lengths)
        pm_mean = np.zeros(C, np.float32)

        def am_apply(params, feats, lengths):
            return am.apply(params, feats)

        labels = jnp.asarray(RS.randint(0, C, (B, T)), jnp.int32)
        for cfg in (
            AdaptConfig(time_shift=2),
            AdaptConfig(time_shifts=(1, 3)),
            AdaptConfig(l2_source=0.1),
            AdaptConfig(contrastive=True, time_shifts=(3, 5)),
            AdaptConfig(supervised_weight=0.5),
            AdaptConfig(loss="l1"),
            AdaptConfig(mm_weight=0.3, mm_deltas=(2, 5)),  # AEPC variant
        ):
            batch = dict(feats=x, lengths=lengths, labels=labels)
            adapted = adapt_model(
                am_apply, am_params, pm.apply, pm_params, pm_mean,
                lambda: iter([batch]), cfg, epochs=1, log_fn=lambda s: None,
            )
            assert np.all(
                np.isfinite(np.asarray(jax.tree.leaves(adapted)[0]))
            )
