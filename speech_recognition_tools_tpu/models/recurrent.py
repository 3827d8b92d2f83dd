"""Recurrent acoustic models (GRU stacks) and feedforward baselines.

Parity targets in /root/reference/src/nnet/nnet_models.py:
  nnetFeedforward :9, nnetLinearWithConv :34, nnetRNN :54, rnnSubnet :92,
  nnetRNNMultimod :121, encoderRNN :164, decoderRNN :203,
  nnetAEClassifierMultitask :229, nnetAEClassifierMultitaskAEAR :243.
Plus `AutoencoderRNN` — the PM autoencoder the reference imports from a
missing `ae_model.py` (SURVEY.md §2.3 "dead/missing references"); provided
here as a working equivalent (GRU encoder -> bottleneck -> GRU decoder).

TPU design: PyTorch's pack_padded_sequence machinery is replaced by masked
scans — every GRU layer runs over the padded batch and the carry is frozen
past each sequence's length, which matches packed semantics at padded
positions while keeping one static-shape program. The reference's 1x1
Conv1d output/regression layers are plain Dense applied over (B, T, D)
(identical math, MXU-shaped).
"""

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def length_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) -> (B, T) boolean validity mask."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


class MaskedGRULayer(nn.Module):
    """Single GRU layer over (B, T, D) with carry frozen past `lengths`."""

    features: int

    @nn.compact
    def __call__(self, inputs, lengths):
        B = inputs.shape[0]
        cell = nn.GRUCell(features=self.features, name="cell")
        mask = length_mask(lengths, inputs.shape[1])

        def step(cell, carry, x):
            xs, m = x
            new_carry, out = cell(carry, xs)
            keep = m[:, None]
            carry = jnp.where(keep, new_carry, carry)
            out = jnp.where(keep, out, jnp.zeros_like(out))
            return carry, out

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry0 = cell.initialize_carry(
            jax.random.key(0), (B, inputs.shape[-1])
        )
        _, out = scan(cell, carry0, (inputs, mask))
        return out


class GRUStack(nn.Module):
    """Stack of masked GRU layers with optional inter-layer dropout
    (reference nnetRNN applies dropout between layers only, :80-82)."""

    num_layers: int
    hidden_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, inputs, lengths, deterministic: bool = True):
        x = inputs
        for i in range(self.num_layers):
            x = MaskedGRULayer(self.hidden_size, name=f"gru_{i}")(x, lengths)
            if self.dropout > 0 and i + 1 < self.num_layers:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class FeedforwardClassifier(nn.Module):
    """MLP classifier returning pre-activation embeddings of every hidden
    layer plus logits (the taps feed multilayer PM/adaptation;
    reference nnetFeedforward :24-31)."""

    num_layers: int
    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, inputs):
        embeds = []
        x = inputs
        for i in range(self.num_layers):
            x = nn.Dense(self.hidden_size, name=f"dense_{i}")(x)
            embeds.append(x)  # tap before activation
            x = nn.relu(x)
        logits = nn.Dense(self.out_size, name="out")(x)
        return embeds, logits


class LinearConvStack(nn.Module):
    """ReLU Dense stack over sequences (reference nnetLinearWithConv :34
    uses 1x1 Conv1d; Dense over the feature axis is the same operator)."""

    num_layers: int
    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, inputs, lengths=None):
        x = inputs
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_size, name=f"dense_{i}")(x))
        return nn.Dense(self.out_size, name="out")(x)


class RNNClassifier(nn.Module):
    """GRU stack + Dense output over frames (reference nnetRNN :54)."""

    num_layers: int
    hidden_size: int
    out_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, inputs, lengths, deterministic: bool = True):
        x = GRUStack(self.num_layers, self.hidden_size, self.dropout)(
            inputs, lengths, deterministic
        )
        return nn.Dense(self.out_size, name="regression")(x)


class RNNSubnet(nn.Module):
    """Per-modulation-stream GRU subnet (reference rnnSubnet :92)."""

    num_layers: int
    hidden_size: int

    @nn.compact
    def __call__(self, inputs, lengths):
        return GRUStack(self.num_layers, self.hidden_size)(inputs, lengths)


class MultistreamRNN(nn.Module):
    """Multi-stream AM: per-stream GRU subnets, concatenated, fused GRU
    stack, Dense output (reference nnetRNNMultimod :121)."""

    num_streams: int
    num_layers_subband: int
    hidden_size_subband: int
    num_layers: int
    out_size: int

    @nn.compact
    def __call__(self, stream_inputs: Sequence[jax.Array], lengths):
        outs = [
            RNNSubnet(
                self.num_layers_subband,
                self.hidden_size_subband,
                name=f"subnet_{i}",
            )(x, lengths)
            for i, x in enumerate(stream_inputs)
        ]
        x = jnp.concatenate(outs, axis=-1)
        x = GRUStack(
            self.num_layers,
            self.num_streams * self.hidden_size_subband,
            name="fusion",
        )(x, lengths)
        return nn.Dense(self.out_size, name="regression")(x)


class EncoderRNN(nn.Module):
    """GRU stack + ReLU bottleneck (reference encoderRNN :164)."""

    num_layers: int
    hidden_size: int
    bn_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, inputs, lengths, deterministic: bool = True):
        x = GRUStack(self.num_layers, self.hidden_size, self.dropout)(
            inputs, lengths, deterministic
        )
        return nn.relu(nn.Dense(self.bn_size, name="bottleneck")(x))


class DecoderRNN(nn.Module):
    """GRU stack + Dense regression (reference decoderRNN :203); used both
    as classifier head and AE decoder."""

    num_layers: int
    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, inputs, lengths):
        x = GRUStack(self.num_layers, self.hidden_size)(inputs, lengths)
        return nn.Dense(self.out_size, name="regression")(x)


class AEClassifierMultitask(nn.Module):
    """Shared encoder -> classifier + AE decoder (reference
    nnetAEClassifierMultitask :229)."""

    out_size: int
    num_layers_enc: int
    num_layers_class: int
    num_layers_ae: int
    hidden_size: int
    bn_size: int
    dropout: float = 0.0
    input_size: int | None = None  # AE output dim; default: input dim

    @nn.compact
    def __call__(self, inputs, lengths, deterministic: bool = True):
        in_dim = self.input_size or inputs.shape[-1]
        z = EncoderRNN(
            self.num_layers_enc, self.hidden_size, self.bn_size, self.dropout,
            name="encoder",
        )(inputs, lengths, deterministic)
        logits = DecoderRNN(
            self.num_layers_class, self.hidden_size, self.out_size,
            name="classifier",
        )(z, lengths)
        recon = DecoderRNN(
            self.num_layers_ae, self.hidden_size, in_dim, name="ae"
        )(z, lengths)
        return logits, recon


class AEClassifierMultitaskAEAR(nn.Module):
    """Multitask AE + autoregressive decoder predicting the time-shifted
    input (reference nnetAEClassifierMultitaskAEAR :243-259)."""

    out_size: int
    num_layers_enc: int
    num_layers_class: int
    num_layers_ae: int
    hidden_size: int
    bn_size: int
    time_shift: int
    input_size: int | None = None

    @nn.compact
    def __call__(self, inputs, lengths, deterministic: bool = True):
        in_dim = self.input_size or inputs.shape[-1]
        enc = EncoderRNN(
            self.num_layers_enc, self.hidden_size, self.bn_size, name="encoder"
        )
        z = enc(inputs, lengths, deterministic)
        logits = DecoderRNN(
            self.num_layers_class, self.hidden_size, self.out_size,
            name="classifier",
        )(z, lengths)
        recon = DecoderRNN(
            self.num_layers_ae, self.hidden_size, in_dim, name="ae"
        )(z, lengths)
        # AR branch: encode the input truncated by time_shift; the target is
        # the input shifted forward (loss pairs recon_ar[t] with x[t+shift]).
        z_ar = enc(
            inputs[:, : -self.time_shift, :],
            lengths - self.time_shift,
            deterministic,
        )
        recon_ar = DecoderRNN(
            self.num_layers_ae, self.hidden_size, in_dim, name="ar"
        )(z_ar, lengths - self.time_shift)
        return logits, recon, recon_ar


class AutoencoderRNN(nn.Module):
    """RNN autoencoder used as the performance-monitoring (PM) model.

    The reference imports `ae_model.autoencoderRNN`
    (nnet_adapt_ae.py:14, per_utt_fer_v2.py:18) but ships no ae_model.py;
    this is the working equivalent: GRU encoder -> linear bottleneck ->
    GRU decoder -> linear reconstruction.
    """

    num_layers_enc: int
    num_layers_dec: int
    hidden_size: int
    bn_size: int
    out_size: int | None = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, inputs, lengths, deterministic: bool = True):
        out_dim = self.out_size or inputs.shape[-1]
        x = GRUStack(
            self.num_layers_enc, self.hidden_size, self.dropout, name="encoder"
        )(inputs, lengths, deterministic)
        z = nn.Dense(self.bn_size, name="bottleneck")(x)
        y = GRUStack(self.num_layers_dec, self.hidden_size, name="decoder")(
            z, lengths
        )
        return nn.Dense(out_dim, name="reconstruction")(y), z
