"""Recurrent (and transformer) VAEs + VAE-based classifiers.

Parity targets in /root/reference/src/nnet/nnet_models.py:
  VAEEncoder :262, VAEEncoderTransformer :300, VAEDecoderTransformer :326,
  VAEDecoder :344, latentSampler :372, nnetVAEClassifier :385, nnetVAE :401
  (vae_loss :432, compute_llhood :446, generate :460), nnetARVAE :470,
  VAEEncodedClassifier :488.

Notes vs the reference:
  * The sampler is functional (takes a PRNG key) instead of calling
    torch.randn inside the module.
  * The reference's VAEEncoderTransformer builds a transformer stack then
    immediately overwrites it with GRUs (dead code, :306-313). Here the
    transformer variants are *real* pre-LN transformer encoders, since that
    is the documented intent.
  * vae_loss replicates the reference's exact loss algebra, including its
    KL sign convention (kl term as written at :442-443, *added* according
    to trainers' usage loss = -(log_lhood + kl)).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from speech_recognition_tools_tpu.models.recurrent import (
    DecoderRNN,
    GRUStack,
    LinearConvStack,
    length_mask,
)


class VAEEncoder(nn.Module):
    """GRU stack -> (means, logvars, hidden) (reference VAEEncoder :262)."""

    num_layers: int
    hidden_size: int
    bn_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, inputs, lengths, deterministic: bool = True):
        x = GRUStack(self.num_layers, self.hidden_size, self.dropout)(
            inputs, lengths, deterministic
        )
        means = nn.Dense(self.bn_size, name="means")(x)
        logvars = nn.Dense(self.bn_size, name="vars")(x)
        return means, logvars, x


class VAEDecoder(nn.Module):
    """GRU stack -> mean head (reference VAEDecoder :344)."""

    num_layers: int
    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, inputs, lengths):
        x = GRUStack(self.num_layers, self.hidden_size)(inputs, lengths)
        return nn.Dense(self.out_size, name="means")(x)


class TransformerBlock(nn.Module):
    d_model: int
    nhead: int
    d_ff: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        attn_mask = mask[:, None, None, :]  # (B, 1, 1, T)
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead,
            dropout_rate=self.dropout,
            deterministic=deterministic,
        )(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.d_ff)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model)(h)
        return x + h


class VAEEncoderTransformer(nn.Module):
    """Transformer encoder -> (means, logvars, hidden)
    (reference VAEEncoderTransformer :300 — implemented for real here)."""

    num_layers: int
    hidden_size: int
    bn_size: int
    dropout: float = 0.0
    nhead: int = 16

    @nn.compact
    def __call__(self, inputs, lengths, deterministic: bool = True):
        d_model = inputs.shape[-1]
        mask = length_mask(lengths, inputs.shape[1])
        x = inputs
        for i in range(self.num_layers):
            x = TransformerBlock(
                d_model, self.nhead, self.hidden_size, self.dropout,
                name=f"block_{i}",
            )(x, mask, deterministic)
        means = nn.Dense(self.bn_size, name="means")(x)
        logvars = nn.Dense(self.bn_size, name="vars")(x)
        return means, logvars, x


class VAEDecoderTransformer(nn.Module):
    """Transformer decoder-as-encoder stack -> mean head
    (reference VAEDecoderTransformer :326)."""

    num_layers: int
    hidden_size: int
    out_size: int
    dropout: float = 0.0
    nhead: int = 16

    @nn.compact
    def __call__(self, inputs, lengths, deterministic: bool = True):
        d_model = inputs.shape[-1]
        mask = length_mask(lengths, inputs.shape[1])
        x = inputs
        for i in range(self.num_layers):
            x = TransformerBlock(
                d_model, self.nhead, self.hidden_size, self.dropout,
                name=f"block_{i}",
            )(x, mask, deterministic)
        return nn.Dense(self.out_size, name="means")(x)


def sample_latent(key, means, logvars):
    """Reparameterised sample mu + exp(logvar) * eps (reference
    latentSampler :377-382 — note: exp(logvar) scales eps directly, i.e.
    the head predicts log *std*; replicated exactly)."""
    return means + jnp.exp(logvars) * jax.random.normal(
        key, means.shape, means.dtype
    )


class VAE(nn.Module):
    """Recurrent VAE (reference nnetVAE :401). `only_ae` decodes the means
    without sampling; `use_transformer` swaps both halves."""

    num_layers_enc: int
    num_layers_dec: int
    hidden_size: int
    bn_size: int
    dropout: float = 0.0
    only_ae: bool = False
    use_transformer: bool = False
    input_size: int | None = None
    nhead: int = 16

    @nn.compact
    def __call__(self, inputs, lengths, *, rng=None, deterministic: bool = True):
        in_dim = self.input_size or inputs.shape[-1]
        if self.use_transformer:
            encoder = VAEEncoderTransformer(
                self.num_layers_enc, self.hidden_size, self.bn_size,
                self.dropout, nhead=self.nhead, name="encoder",
            )
        else:
            encoder = VAEEncoder(
                self.num_layers_enc, self.hidden_size, self.bn_size,
                self.dropout, name="encoder",
            )
        means, logvars, _ = encoder(inputs, lengths, deterministic)
        if self.use_transformer:
            decoder = VAEDecoderTransformer(
                self.num_layers_dec, self.hidden_size, in_dim,
                nhead=self.nhead, name="decoder",
            )
            dec = lambda z, l: decoder(z, l, deterministic)
        else:
            decoder = VAEDecoder(
                self.num_layers_dec, self.hidden_size, in_dim, name="decoder"
            )
            dec = decoder
        if self.only_ae:
            recon = dec(means, lengths)
        else:
            if rng is None:
                rng = self.make_rng("sample")
            z = sample_latent(rng, means, logvars)
            recon = dec(z, lengths)
        return recon, (means, logvars)


def vae_loss(x, ae_out, latent, out_dist="gauss", mask=None):
    """Reference nnetVAE.vae_loss :432-444 — returns (log_lhood, kl) with
    the exact formulas (gauss: mean(-0.5 (x-y)^2 - 0.5 log 2pi);
    laplace: mean(-|x-y| - log 2); kl as written, to be *added*).

    `mask` (B, T) restricts the means to valid frames (the reference
    operates on padded tensors; masked mean is the ragged-batch analogue).
    """
    means, logvars = latent
    if out_dist == "gauss":
        ll = -0.5 * (x - ae_out) ** 2 - 0.5 * np.log(2 * np.pi)
    elif out_dist == "laplace":
        ll = -jnp.abs(x - ae_out) - np.log(2)
    else:
        raise ValueError("out_dist must be 'gauss' or 'laplace'")
    kl = 0.5 * (1 - means**2 - jnp.exp(logvars) ** 2 + 2 * logvars)
    if mask is None:
        return jnp.mean(ll), jnp.mean(kl)
    m = mask[..., None].astype(ll.dtype)
    denom_ll = jnp.sum(m) * ll.shape[-1]
    denom_kl = jnp.sum(m) * kl.shape[-1]
    return jnp.sum(ll * m) / denom_ll, jnp.sum(kl * m) / denom_kl


def vae_generate(model, params, key, size=512, bn_size=None, batch=1):
    """Sample from the prior and decode (reference nnetVAE.generate
    :460-467): z ~ N(0, I) of shape (batch, size, bn) through the decoder."""
    bn = bn_size or model.bn_size
    dtype = params["params"]["decoder"]["means"]["kernel"].dtype
    z = jax.random.normal(key, (batch, size, bn), dtype)
    lengths = jnp.full((batch,), size, jnp.int32)
    dec_params = {"params": params["params"]["decoder"]}
    decoder = VAEDecoder(
        model.num_layers_dec, model.hidden_size,
        model.input_size or params["params"]["decoder"]["means"]["kernel"].shape[1],
    )
    return decoder.apply(dec_params, z, lengths)


def vae_llhood(model, params, key, inputs, lengths, sample_num=10, out_dist="gauss"):
    """Multi-sample likelihood estimate (reference compute_llhood :446-458):
    average reconstruction log-lhood and -kl over `sample_num` latent
    draws. Used by PM scoring and lifelong decoding."""
    recon_ll = 0.0
    kl_acc = 0.0
    for i in range(sample_num):
        key, sub = jax.random.split(key)
        recon, latent = model.apply(
            params, inputs, lengths, rngs={"sample": sub}
        )
        ll, kl = vae_loss(inputs, recon, latent, out_dist)
        recon_ll += ll
        kl_acc -= kl
    return recon_ll / sample_num, kl_acc / sample_num


class VAEClassifier(nn.Module):
    """VAE + classifier head on the sampled latent (reference
    nnetVAEClassifier :385)."""

    out_size: int
    num_layers_enc: int
    num_layers_class: int
    num_layers_ae: int
    hidden_size: int
    bn_size: int
    dropout: float = 0.0
    input_size: int | None = None

    @nn.compact
    def __call__(self, inputs, lengths, *, rng=None, deterministic: bool = True):
        in_dim = self.input_size or inputs.shape[-1]
        means, logvars, _ = VAEEncoder(
            self.num_layers_enc, self.hidden_size, self.bn_size, self.dropout,
            name="vae_encoder",
        )(inputs, lengths, deterministic)
        if rng is None:
            rng = self.make_rng("sample")
        z = sample_latent(rng, means, logvars)
        logits = DecoderRNN(
            self.num_layers_class, self.hidden_size, self.out_size,
            name="classifier",
        )(z, lengths)
        recon = VAEDecoder(
            self.num_layers_ae, self.hidden_size, in_dim, name="vae_decoder"
        )(z, lengths)
        return logits, recon, (means, logvars)


class ARVAE(nn.Module):
    """One encoder, `num_outs` decoders for multi-shift autoregressive
    prediction (reference nnetARVAE :470)."""

    num_layers_enc: int
    num_layers_dec: int
    hidden_size: int
    bn_size: int
    num_outs: int
    dropout: float = 0.0
    input_size: int | None = None

    @nn.compact
    def __call__(self, inputs, lengths, *, rng=None, deterministic: bool = True):
        in_dim = self.input_size or inputs.shape[-1]
        means, logvars, _ = VAEEncoder(
            self.num_layers_enc, self.hidden_size, self.bn_size, self.dropout,
            name="vae_encoder",
        )(inputs, lengths, deterministic)
        if rng is None:
            rng = self.make_rng("sample")
        z = sample_latent(rng, means, logvars)
        outs = [
            VAEDecoder(
                self.num_layers_dec, self.hidden_size, in_dim,
                name=f"decoder_{i}",
            )(z, lengths)
            for i in range(self.num_outs)
        ]
        return jnp.stack(outs), (means, logvars)


class VAEEncodedClassifier(nn.Module):
    """Conv classifier on a (frozen) VAE's latent means (reference
    VAEEncodedClassifier :488). Pass the pretrained VAE module + params via
    bind or call `encode_then_classify` with precomputed means."""

    num_layers: int
    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, latent_means, lengths=None):
        return LinearConvStack(
            self.num_layers, self.hidden_size, self.out_size, name="head"
        )(latent_means)
