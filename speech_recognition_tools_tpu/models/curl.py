"""CURL: Gaussian-mixture-latent VAEs for lifelong/continual learning.

Parity targets in /root/reference/src/nnet/nnet_models.py:
  curlEncoder :536, curlDecoder :573, curlDecoderMultistream :602,
  curlLatentSampler :632, nnetCurlSupervised :649,
  nnetCurlMultistreamClassifier :663 (expand_component :687,
  gradient-scaling hooks :726-728), curlEncodedClassifier :511,
  compute_latent_features :739.

TPU re-design highlights:
  * Per-component mean/var heads and decoders are vmapped over the component
    axis where the reference loops Python lists of submodules — one batched
    matmul instead of K small ones.
  * expand_component: JAX parameters are immutable pytrees, so lifelong
    growth is functional — `expand_component(old_params, new_model, rng)`
    builds the K+1-component parameter tree, copying the old components and
    freshly initialising the new one (the reference mutates nn.ModuleLists
    in place, :687-720).
  * The reference's gradient-scaling hooks on the encoder latents
    (:726-728, grad *= enc_scale) become a jax.custom_vjp scale_gradient.
"""


import jax
import jax.numpy as jnp
from flax import linen as nn

from speech_recognition_tools_tpu.models.recurrent import (
    DecoderRNN,
    GRUStack,
    LinearConvStack,
)


@jax.custom_vjp
def scale_gradient(x, scale):
    return x


def _sg_fwd(x, scale):
    return x, scale


def _sg_bwd(scale, g):
    return (g * scale, None)


scale_gradient.defvjp(_sg_fwd, _sg_bwd)


class CurlEncoder(nn.Module):
    """GRU stack -> categorical posterior + per-component mean/logvar heads
    (reference curlEncoder :536). Heads are a single Dense producing
    (comp_num * bn_size) then reshaped — same math as comp_num separate
    Linears, one MXU matmul."""

    num_layers: int
    hidden_size: int
    bn_size: int
    comp_num: int

    @nn.compact
    def __call__(self, inputs, lengths):
        x = GRUStack(self.num_layers, self.hidden_size)(inputs, lengths)
        B, T = x.shape[:2]
        means = nn.Dense(self.comp_num * self.bn_size, name="means")(x)
        logvars = nn.Dense(self.comp_num * self.bn_size, name="vars")(x)
        means = means.reshape(B, T, self.comp_num, self.bn_size)
        logvars = logvars.reshape(B, T, self.comp_num, self.bn_size)
        # component axis leading, matching the reference's cat over [None] axes
        means = jnp.moveaxis(means, 2, 0)  # (K, B, T, bn)
        logvars = jnp.moveaxis(logvars, 2, 0)
        cat = nn.softmax(nn.Dense(self.comp_num, name="categorical")(x), axis=-1)
        return cat, means, logvars


class CurlDecoder(nn.Module):
    """Shared decoder applied to each component's latent (reference
    curlDecoder :573)."""

    num_layers: int
    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, all_latents, lengths):
        dec = DecoderRNN(self.num_layers, self.hidden_size, self.out_size)
        return jnp.stack([dec(z, lengths) for z in all_latents])


class CurlDecoderMultistream(nn.Module):
    """One decoder per component/stream (reference curlDecoderMultistream
    :602)."""

    num_streams: int
    num_layers: int
    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, all_latents, lengths):
        outs = [
            DecoderRNN(
                self.num_layers, self.hidden_size, self.out_size,
                name=f"stream_{i}",
            )(all_latents[i], lengths)
            for i in range(self.num_streams)
        ]
        return jnp.stack(outs)


def sample_curl_latent(key, means, logvars):
    """Per-component reparameterised samples (reference curlLatentSampler
    :632): z_k = mu_k + exp(logvar_k) * eps."""
    return means + jnp.exp(logvars) * jax.random.normal(
        key, means.shape, means.dtype
    )


class CurlSupervised(nn.Module):
    """CURL AE (reference nnetCurlSupervised :649)."""

    num_layers_enc: int
    num_layers_dec: int
    hidden_size: int
    bn_size: int
    comp_num: int
    input_size: int | None = None

    @nn.compact
    def __call__(self, inputs, lengths, *, rng=None):
        in_dim = self.input_size or inputs.shape[-1]
        latent = CurlEncoder(
            self.num_layers_enc, self.hidden_size, self.bn_size, self.comp_num,
            name="curl_encoder",
        )(inputs, lengths)
        if rng is None:
            rng = self.make_rng("sample")
        sampled = sample_curl_latent(rng, latent[1], latent[2])
        recon = CurlDecoder(
            self.num_layers_dec, self.hidden_size, in_dim, name="curl_decoder"
        )(sampled, lengths)
        return recon, latent


class CurlMultistreamClassifier(nn.Module):
    """CURL with per-component decoders and classifier streams (reference
    nnetCurlMultistreamClassifier :663). Encoder latents get gradient
    scaling by enc_scale (reference's register_hook :726-728)."""

    out_size: int
    num_layers_enc: int
    num_layers_dec: int
    num_layers_class: int
    hidden_size: int
    hidden_size_classifier: int
    bn_size: int
    comp_num: int
    enc_scale: float = 0.2
    input_size: int | None = None

    @nn.compact
    def __call__(self, inputs, lengths, *, rng=None):
        in_dim = self.input_size or inputs.shape[-1]
        cat, means, logvars = CurlEncoder(
            self.num_layers_enc, self.hidden_size, self.bn_size, self.comp_num,
            name="curl_encoder",
        )(inputs, lengths)
        cat = scale_gradient(cat, self.enc_scale)
        means = scale_gradient(means, self.enc_scale)
        logvars = scale_gradient(logvars, self.enc_scale)
        if rng is None:
            rng = self.make_rng("sample")
        sampled = sample_curl_latent(rng, means, logvars)
        class_out = jnp.stack(
            [
                DecoderRNN(
                    self.num_layers_class,
                    self.hidden_size_classifier,
                    self.out_size,
                    name=f"classifier_{i}",
                )(sampled[i], lengths)
                for i in range(self.comp_num)
            ]
        )
        recon = CurlDecoderMultistream(
            self.comp_num, self.num_layers_dec, self.hidden_size, in_dim,
            name="curl_decoder",
        )(sampled, lengths)
        return class_out, recon, (cat, means, logvars)


class CurlMultistreamClassifierEP(nn.Module):
    """Expert-parallel CurlMultistreamClassifier: the per-component
    decoder/classifier streams are vmapped (params carry a leading
    comp_num axis) instead of looped over named submodules, so the
    expert axis shards over a device mesh axis
    (parallel.ep.expert_param_sharding) — SURVEY.md §2.8's EP
    equivalent of the reference's serial component loop
    (nnet_models.py:616-629,722-736). Numerically identical to
    CurlMultistreamClassifier; `curl_params_to_ep` converts a trained
    loop-layout checkpoint (tests/test_expert_parallel.py pins parity).
    """

    out_size: int
    num_layers_enc: int
    num_layers_dec: int
    num_layers_class: int
    hidden_size: int
    hidden_size_classifier: int
    bn_size: int
    comp_num: int
    enc_scale: float = 0.2
    input_size: int | None = None

    @nn.compact
    def __call__(self, inputs, lengths, *, rng=None):
        from speech_recognition_tools_tpu.parallel.ep import vmap_experts

        in_dim = self.input_size or inputs.shape[-1]
        cat, means, logvars = CurlEncoder(
            self.num_layers_enc, self.hidden_size, self.bn_size, self.comp_num,
            name="curl_encoder",
        )(inputs, lengths)
        cat = scale_gradient(cat, self.enc_scale)
        means = scale_gradient(means, self.enc_scale)
        logvars = scale_gradient(logvars, self.enc_scale)
        if rng is None:
            rng = self.make_rng("sample")
        sampled = sample_curl_latent(rng, means, logvars)
        VDecoder = vmap_experts(DecoderRNN, self.comp_num)
        class_out = VDecoder(
            self.num_layers_class, self.hidden_size_classifier, self.out_size,
            name="classifiers",
        )(sampled, lengths)
        recon = VDecoder(
            self.num_layers_dec, self.hidden_size, in_dim, name="decoders",
        )(sampled, lengths)
        return class_out, recon, (cat, means, logvars)


def curl_params_to_ep(params, comp_num: int):
    """Convert a CurlMultistreamClassifier param tree (loop layout:
    `classifier_i` + `curl_decoder/stream_i` subtrees) into the
    CurlMultistreamClassifierEP layout (stacked `classifiers` /
    `decoders` with a leading expert axis). Outputs are bit-identical
    between the two layouts."""
    import flax

    from speech_recognition_tools_tpu.parallel.ep import stack_expert_params

    p = flax.core.unfreeze(params)["params"]
    new = {
        "curl_encoder": p["curl_encoder"],
        "classifiers": stack_expert_params(
            [p[f"classifier_{i}"] for i in range(comp_num)]
        ),
        "decoders": stack_expert_params(
            [p["curl_decoder"][f"stream_{i}"] for i in range(comp_num)]
        ),
    }
    out = {"params": new}
    if isinstance(params, flax.core.FrozenDict):
        out = flax.core.freeze(out)
    return out


def curl_loss_supervised(x, recon, latent, mean_p, comp_idx, mask=None):
    """Supervised CURL ELBO for a known component (reference
    train_CURLclassifier_v2.py curl_loss_supervised :33-49): gaussian
    reconstruction log-lhood of the chosen component's decoder + KL of its
    latent to the component prior N(mean_p[idx], I) + log-posterior of the
    component. Maximised (return is the objective, negate for a loss)."""
    import numpy as np

    cat, means, logvars = latent
    ll = jnp.sum(
        -0.5 * (x - recon[comp_idx]) ** 2 - 0.5 * np.log(2 * np.pi), axis=-1
    )
    kl = 0.5 * jnp.sum(
        1
        - (means[comp_idx] - mean_p[comp_idx]) ** 2
        - jnp.exp(logvars[comp_idx]) ** 2
        + 2 * logvars[comp_idx],
        axis=-1,
    )
    per_frame = ll + kl
    cat_reg = jnp.log(jnp.maximum(cat[..., comp_idx], 1e-12))
    if mask is None:
        return jnp.mean(per_frame) + jnp.mean(cat_reg)
    m = mask.astype(per_frame.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return (
        jnp.sum(per_frame * m) / denom + jnp.sum(cat_reg * m) / denom
    )


def curl_loss_unsupervised(x, recon, latent, mean_p, mask=None):
    """Unsupervised CURL ELBO (reference curl_loss_unsupervised :52-69):
    posterior-weighted per-component ELBOs minus the categorical entropy
    regulariser KL(q(y|x) || uniform)."""
    import numpy as np

    cat, means, logvars = latent
    K = recon.shape[0]
    total = 0.0
    for k in range(K):
        ll = jnp.sum(
            -0.5 * (x - recon[k]) ** 2 - 0.5 * np.log(2 * np.pi), axis=-1
        )
        kl = 0.5 * jnp.sum(
            1
            - (means[k] - mean_p[k]) ** 2
            - jnp.exp(logvars[k]) ** 2
            + 2 * logvars[k],
            axis=-1,
        )
        w = cat[..., k]
        term = w * (ll + kl)
        if mask is None:
            total = total + jnp.mean(term)
        else:
            m = mask.astype(term.dtype)
            total = total + jnp.sum(term * m) / jnp.maximum(jnp.sum(m), 1.0)
    ent = jnp.sum(cat * jnp.log(jnp.maximum(cat, 1e-12)), axis=-1) + np.log(K)
    if mask is None:
        cat_reg = jnp.mean(ent)
    else:
        m = mask.astype(ent.dtype)
        cat_reg = jnp.sum(ent * m) / jnp.maximum(jnp.sum(m), 1.0)
    return total - cat_reg


def random_mixture_means(key, comp_num, bn_size, scale=1.0):
    """Random component prior means (reference train_CURLclassifier_v2.py
    :215 draws random mixture means once at startup)."""
    return jax.random.normal(key, (comp_num, bn_size)) * scale


def compute_latent_features(latent):
    """Posterior-weighted mixture latent for downstream classifiers
    (reference compute_latent_features :739): sum_k q(k|x) * mu_k."""
    cat, means, _ = latent  # cat (B,T,K), means (K,B,T,D)
    return jnp.einsum("btk,kbtd->btd", cat, means)


class CurlEncodedClassifier(nn.Module):
    """Conv classifier on a frozen CURL model's mixture latent (reference
    curlEncodedClassifier :511). Call with compute_latent_features output."""

    num_layers: int
    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, latent_feats, lengths=None):
        return LinearConvStack(
            self.num_layers, self.hidden_size, self.out_size, name="head"
        )(latent_feats)


def expand_component(model: CurlMultistreamClassifier, params, rng, example):
    """Functional lifelong-learning growth (reference expand_component
    :687-720): returns (new_model, new_params) with comp_num+1 components.

    The categorical head, per-component mean/var heads, the new decoder
    stream and the new classifier are freshly initialised; all existing
    component parameters are copied so prior-task behaviour is preserved.

    Args:
      model: current CurlMultistreamClassifier.
      params: its parameter pytree ({'params': ...} style).
      rng: PRNG key for the new component's init.
      example: (inputs, lengths) used to shape-init the grown model.
    """
    import dataclasses

    import flax

    new_model = dataclasses.replace(model, comp_num=model.comp_num + 1)
    inputs, lengths = example
    new_params = new_model.init(
        {"params": rng, "sample": jax.random.fold_in(rng, 1)}, inputs, lengths
    )
    old = flax.core.unfreeze(params)["params"]
    new = flax.core.unfreeze(new_params)["params"]
    K, bn = model.comp_num, model.bn_size

    enc_o, enc_n = old["curl_encoder"], new["curl_encoder"]
    # GRU trunk: copy verbatim
    for k in enc_o:
        if k.startswith("gru") or k == "GRUStack_0":
            enc_n[k] = enc_o[k]
    # mean/var heads: first K*bn output columns copied
    for head in ("means", "vars"):
        enc_n[head]["kernel"] = (
            enc_n[head]["kernel"].at[:, : K * bn].set(enc_o[head]["kernel"])
        )
        enc_n[head]["bias"] = (
            enc_n[head]["bias"].at[: K * bn].set(enc_o[head]["bias"])
        )
    # categorical: first K logits copied (reference copies weight+bias rows)
    enc_n["categorical"]["kernel"] = (
        enc_n["categorical"]["kernel"].at[:, :K].set(enc_o["categorical"]["kernel"])
    )
    enc_n["categorical"]["bias"] = (
        enc_n["categorical"]["bias"].at[:K].set(enc_o["categorical"]["bias"])
    )
    # existing decoder streams + classifiers copied
    for i in range(K):
        new["curl_decoder"][f"stream_{i}"] = old["curl_decoder"][f"stream_{i}"]
        new[f"classifier_{i}"] = old[f"classifier_{i}"]
    out = {"params": new}
    if isinstance(params, flax.core.FrozenDict):
        out = flax.core.freeze(out)
    return new_model, out
