"""Learned-modulation networks (modnet).

Parity targets in /root/reference/src/nnet/nnet_models.py:
  modnetEncoder :755, modnetClassifier :828, modulationNet :845,
  gumbel_softmax :862-883, modnetSigmoidEncoder :886,
  modulationSigmoidNet :950.

A CNN looks at a (freq x time) patch, each head picks a modulation
frequency via straight-through gumbel-softmax (or sigmoid weights), and the
patch is projected onto sinusoids of the picked frequency; a MLP classifies
the resulting modulation features. The gumbel sampling is functional (PRNG
key) instead of torch.rand-on-cuda.
"""

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def gumbel_softmax(key, logits, temperature):
    """Straight-through gumbel-softmax (reference gumbel_softmax :872-883):
    forward pass one-hot of the perturbed argmax, backward pass soft."""
    eps = 1e-20
    u = jax.random.uniform(key, logits.shape, logits.dtype)
    g = -jnp.log(-jnp.log(u + eps) + eps)
    y = jax.nn.softmax((logits + g) / temperature, axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), y.shape[-1], dtype=y.dtype)
    return jax.lax.stop_gradient(hard - y) + y


class ModnetClassifier(nn.Module):
    """Plain ReLU MLP head (reference modnetClassifier :828)."""

    num_layers: int
    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_size, name=f"dense_{i}")(x))
        return nn.Dense(self.out_size, name="out")(x)


class ModnetEncoder(nn.Module):
    """CNN -> per-head gumbel-softmax frequency pick -> sine projections
    (reference modnetEncoder :755-825).

    Input: (B, C, H, W) patches (C=in_channels[0], H=freq bins, W=frames).
    Returns (modulations (B, H*head_num), mod_freqs (B, head_num)).
    """

    in_channels: Sequence[int]
    out_channels: Sequence[int]
    kernel: int
    freq_num: int
    wind_size: float
    head_num: int
    temperature: float = 0.8

    @nn.compact
    def __call__(self, inputs, *, rng=None):
        if rng is None:
            rng = self.make_rng("gumbel")
        feats = inputs  # (B, C, H, W)
        B, C, H, W = inputs.shape
        x = jnp.transpose(inputs, (0, 2, 3, 1))  # NHWC
        for i, out_ch in enumerate(self.out_channels):
            x = nn.relu(
                nn.Conv(
                    out_ch,
                    (self.kernel, self.kernel),
                    padding="VALID",
                    name=f"conv_{i}",
                )(x)
            )
        x = x.reshape(B, -1)

        fs = (1.0 / self.wind_size) * jnp.linspace(
            1.0, self.freq_num, self.freq_num
        )
        t = jnp.linspace(0.0, self.wind_size, W)
        modulations = []
        mod_f = []
        for h in range(self.head_num):
            logits = nn.Dense(self.freq_num, name=f"regressor_{h}")(x)
            rng, sub = jax.random.split(rng)
            pick = gumbel_softmax(sub, logits, self.temperature)
            f = jnp.sum(pick * fs[None, :], axis=1)  # (B,)
            mod_f.append(f[:, None])
            sins = jnp.sin(2 * np.pi * f[:, None] * t[None, :])  # (B, W)
            proj = jnp.mean(
                sins[:, None, :] * feats[:, 0, :, :], axis=2
            )  # (B, H)
            modulations.append(proj)
        return jnp.concatenate(modulations, axis=1), jnp.concatenate(mod_f, axis=1)


class ModulationNet(nn.Module):
    """ModnetEncoder + MLP classifier (reference modulationNet :845)."""

    input_h: int
    in_channels: Sequence[int]
    out_channels: Sequence[int]
    kernel: int
    freq_num: int
    wind_size: float
    head_num: int
    num_layers_dec: int
    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, inputs, *, rng=None):
        mods, mod_f = ModnetEncoder(
            self.in_channels,
            self.out_channels,
            self.kernel,
            self.freq_num,
            self.wind_size,
            self.head_num,
            name="encoder",
        )(inputs, rng=rng)
        logits = ModnetClassifier(
            self.num_layers_dec, self.hidden_size, self.out_size,
            name="classifier",
        )(mods)
        return logits, mod_f


class ModnetSigmoidEncoder(nn.Module):
    """Sigmoid-weighted sin/cos magnitude variant (reference
    modnetSigmoidEncoder :886-947): input is smoothed by a learned 1-D
    filter; modulation magnitudes at every candidate frequency are weighted
    by sigmoid gates."""

    in_channels: Sequence[int]
    out_channels: Sequence[int]
    kernel: int
    input_filter_kernel: int
    freq_num: int
    wind_size: float

    @nn.compact
    def __call__(self, inputs):
        B, C, H, W = inputs.shape
        # learned smoothing filter along time, applied per freq row
        smoother = nn.Conv(
            1, (self.input_filter_kernel,), padding="SAME", name="input_filter"
        )
        rows = inputs.reshape(B * C * H, W, 1)
        feats = smoother(rows).reshape(B, C, H, W)

        x = jnp.transpose(inputs, (0, 2, 3, 1))
        for i, out_ch in enumerate(self.out_channels):
            x = nn.relu(
                nn.Conv(
                    out_ch, (self.kernel, self.kernel), padding="VALID",
                    name=f"conv_{i}",
                )(x)
            )
        x = x.reshape(B, -1)
        gates = nn.sigmoid(nn.Dense(self.freq_num, name="regression")(x))

        fs = (1.0 / self.wind_size) * jnp.linspace(1.0, self.freq_num, self.freq_num)
        wtd_mean_mod = jnp.mean(gates * fs[None, :])
        t = jnp.linspace(0.0, self.wind_size, W)
        mods = []
        for idx in range(self.freq_num):
            arg = 2 * np.pi * fs[idx] * t
            sins = jnp.mean(jnp.sin(arg)[None, None, :] * feats[:, 0], axis=2)
            coss = jnp.mean(jnp.cos(arg)[None, None, :] * feats[:, 0], axis=2)
            mag = jnp.sqrt(sins**2 + coss**2)  # (B, H)
            mods.append(mag * gates[:, idx][:, None])
        return jnp.concatenate(mods, axis=1), wtd_mean_mod


class ModulationSigmoidNet(nn.Module):
    """ModnetSigmoidEncoder + MLP classifier (reference
    modulationSigmoidNet :950)."""

    in_channels: Sequence[int]
    out_channels: Sequence[int]
    kernel: int
    input_filter_kernel: int
    freq_num: int
    wind_size: float
    num_layers_dec: int
    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, inputs):
        mods, mean_mod = ModnetSigmoidEncoder(
            self.in_channels,
            self.out_channels,
            self.kernel,
            self.input_filter_kernel,
            self.freq_num,
            self.wind_size,
            name="encoder",
        )(inputs)
        logits = ModnetClassifier(
            self.num_layers_dec, self.hidden_size, self.out_size,
            name="classifier",
        )(mods)
        return logits, mean_mod
