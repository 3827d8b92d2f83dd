"""Convolutional acoustic models and conv VAEs.

Parity targets in /root/reference/src/nnet/nnet_models_cnn.py:
  nnetCNNClassifier :8, nnetCLDNN :32, nnetCLDNN3D :85, VAECNNEncoder :145,
  VAECNNEncoderNopool :180, VAECNNDecoder :210, VAECNNDecoderNopool :242,
  nnetVAECNN :286, nnetVAECNNNopool :302, VAECNNEncoderNopoolAE :318,
  nnetCNNAE :347, rsconv2d :360, rsconvTranspose2d :401,
  VAECNNModulationEncoder :442, VAECNNModulationDecoder :475,
  nnetVaeRsModulation :510; plus the frame-level cnnClassifier
  (nnet_models.py :966).

TPU conventions: NHWC layout (inputs arrive as (B, C, H, W) to match the
reference's call sites and are transposed internally); the pooled VAE uses
argmax-pooling with index-preserving unpooling expressed as a scatter; the
rate-scale (Gabor-like) convs synthesise their kernels
sin(rate*t + scale*f) * hanning2d from learnable rate/scale as a single
broadcast expression, not a Python loop.
"""

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from speech_recognition_tools_tpu.models.recurrent import length_mask
from speech_recognition_tools_tpu.models.vae import sample_latent


def _same_pad(kernel):
    return (int((kernel[0] - 1) / 2), int((kernel[1] - 1) / 2))


class CnnClassifier(nn.Module):
    """Patch classifier: VALID Conv2d stack -> flatten -> MLP (reference
    nnet_models.py cnnClassifier :966). Input (B, C, H, W)."""

    in_channels: Sequence[int]
    out_channels: Sequence[int]
    kernel: int
    num_layers_dec: int
    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, inputs):
        x = jnp.transpose(inputs, (0, 2, 3, 1))
        for i, out_ch in enumerate(self.out_channels):
            x = nn.relu(
                nn.Conv(out_ch, (self.kernel, self.kernel), padding="VALID",
                        name=f"conv_{i}")(x)
            )
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_layers_dec - 1):
            x = nn.relu(nn.Dense(self.hidden_size, name=f"dense_{i}")(x))
        return nn.Dense(self.output_size, name="out")(x)


class CNNFrameClassifier(nn.Module):
    """Frame-wise CNN AM: SAME-padded Conv2d stack over (freq, time),
    flatten freq into channels, 1x1 output over time (reference
    nnetCNNClassifier :8). Input (B, C, H, W) -> (B, W, out)."""

    out_channels: Sequence[int]
    kernel: tuple
    output_size: int

    @nn.compact
    def __call__(self, inputs):
        x = jnp.transpose(inputs, (0, 2, 3, 1))  # (B, H, W, C)
        for i, out_ch in enumerate(self.out_channels):
            x = nn.relu(
                nn.Conv(out_ch, tuple(self.kernel), padding="SAME",
                        name=f"conv_{i}")(x)
            )
        B, H, W, C = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, W, H * C)
        return nn.Dense(self.output_size, name="lin")(x)


class MaskedLSTMLayer(nn.Module):
    """Single LSTM layer over (B, T, D) with carry frozen past lengths."""

    features: int

    @nn.compact
    def __call__(self, inputs, lengths):
        B = inputs.shape[0]
        cell = nn.OptimizedLSTMCell(features=self.features, name="cell")
        mask = length_mask(lengths, inputs.shape[1])

        def step(cell, carry, x):
            xs, m = x
            new_carry, out = cell(carry, xs)
            keep = m[:, None]
            carry = jax.tree.map(lambda nc, oc: jnp.where(keep, nc, oc), new_carry, carry)
            out = jnp.where(keep, out, jnp.zeros_like(out))
            return carry, out

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry0 = cell.initialize_carry(jax.random.key(0), (B, inputs.shape[-1]))
        _, out = scan(cell, carry0, (inputs, mask))
        return out


class CLDNN(nn.Module):
    """CNN -> dim-reduce -> LSTM stack -> DNN (reference nnetCLDNN :32).
    Input (B, C, H, W), lengths over W. Output (B, W, out)."""

    out_channels: Sequence[int]
    kernel: tuple
    hidden_size: int
    l_num_layers: int
    d_num_layers: int
    output_size: int

    @nn.compact
    def __call__(self, inputs, lengths):
        x = jnp.transpose(inputs, (0, 2, 3, 1))
        for i, out_ch in enumerate(self.out_channels):
            x = nn.relu(
                nn.Conv(out_ch, tuple(self.kernel), padding="SAME",
                        name=f"conv_{i}")(x)
            )
        B, H, W, C = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, W, H * C)
        x = nn.Dense(self.hidden_size, name="dim_reduce")(x)
        for i in range(self.l_num_layers):
            x = MaskedLSTMLayer(self.hidden_size, name=f"lstm_{i}")(x, lengths)
        for i in range(self.d_num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_size, name=f"dnn_{i}")(x))
        return nn.Dense(self.output_size, name="dnn_out")(x)


class CLDNN3D(nn.Module):
    """Per-stream CNNs -> concat -> LSTM -> DNN (reference nnetCLDNN3D :85).
    Input (B, C, S, H, W)."""

    num_streams: int
    out_channels: Sequence[int]
    kernel: tuple
    hidden_size: int
    l_num_layers: int
    d_num_layers: int
    output_size: int

    @nn.compact
    def __call__(self, inputs, lengths):
        B, C, S, H, W = inputs.shape
        streams = []
        for s in range(self.num_streams):
            x = jnp.transpose(inputs[:, :, s], (0, 2, 3, 1))
            for i, out_ch in enumerate(self.out_channels):
                x = nn.relu(
                    nn.Conv(out_ch, tuple(self.kernel), padding="SAME",
                            name=f"conv_s{s}_{i}")(x)
                )
            streams.append(x)
        x = jnp.concatenate(streams, axis=-1)  # (B, H, W, S*C')
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, W, -1)
        x = nn.Dense(self.hidden_size, name="dim_reduce")(x)
        for i in range(self.l_num_layers):
            x = MaskedLSTMLayer(self.hidden_size, name=f"lstm_{i}")(x, lengths)
        for i in range(self.d_num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_size, name=f"dnn_{i}")(x))
        return nn.Dense(self.output_size, name="dnn_out")(x)


def _maxpool_with_indices(x):
    """2x2/stride-2 max pool returning flat argmax indices (reference uses
    nn.MaxPool2d(return_indices=True) for index-preserving unpooling)."""
    B, H, W, C = x.shape
    H2, W2 = H // 2, W // 2
    xw = x[:, : H2 * 2, : W2 * 2, :].reshape(B, H2, 2, W2, 2, C)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(B, H2, W2, 4, C)
    idx = jnp.argmax(xw, axis=3)
    pooled = jnp.max(xw, axis=3)
    return pooled, idx


def _maxunpool(x, idx, out_hw):
    """Inverse of _maxpool_with_indices: scatter each pooled value back to
    its argmax position."""
    B, H2, W2, C = x.shape
    onehot = jax.nn.one_hot(idx, 4, dtype=x.dtype)  # (B,H2,W2,C,4)
    onehot = jnp.swapaxes(onehot, -1, -2)  # (B,H2,W2,4,C)
    spread = onehot * x[:, :, :, None, :]
    spread = spread.reshape(B, H2, W2, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    out = spread.reshape(B, H2 * 2, W2 * 2, C)
    H, W = out_hw
    return jnp.pad(out, ((0, 0), (0, H - H2 * 2), (0, W - W2 * 2), (0, 0)))


class VAECNN(nn.Module):
    """Pooled conv VAE with index-preserving unpooling (reference
    nnetVAECNN :286 + VAECNNEncoder/Decoder). Input (B, C, H, W)."""

    in_channels: Sequence[int]
    out_channels: Sequence[int]
    kernel: tuple
    bn_size: int

    @nn.compact
    def __call__(self, inputs, *, rng=None):
        x = jnp.transpose(inputs, (0, 2, 3, 1))
        H0, W0 = x.shape[1], x.shape[2]
        indices, sizes = [], []
        for i, out_ch in enumerate(self.out_channels):
            x = nn.relu(
                nn.Conv(out_ch, tuple(self.kernel), padding="SAME",
                        name=f"enc_conv_{i}")(x)
            )
            sizes.append((x.shape[1], x.shape[2]))
            x, idx = _maxpool_with_indices(x)
            indices.append(idx)
        B = x.shape[0]
        h_bn, w_bn, c_bn = x.shape[1], x.shape[2], x.shape[3]
        flat = x.reshape(B, -1)
        means = nn.Dense(self.bn_size, name="means")(flat)
        logvars = nn.Dense(self.bn_size, name="vars")(flat)
        if rng is None:
            rng = self.make_rng("sample")
        z = sample_latent(rng, means, logvars)
        y = nn.Dense(h_bn * w_bn * c_bn, name="expand")(z)
        y = y.reshape(B, h_bn, w_bn, c_bn)
        dec_channels = list(self.in_channels[::-1])
        for i, out_ch in enumerate(dec_channels):
            y = _maxunpool(y, indices[-1 - i], sizes[-1 - i])
            y = nn.ConvTranspose(
                out_ch, tuple(self.kernel), padding="SAME",
                name=f"dec_conv_{i}",
            )(y)
            if i + 1 < len(dec_channels):
                y = nn.relu(y)
        recon = jnp.transpose(y, (0, 3, 1, 2))
        return recon, (means, logvars)


class VAECNNNopool(nn.Module):
    """Sequence-preserving conv VAE (reference nnetVAECNNNopool :302):
    no pooling, 1x1 mean/var heads over time. Input (B, C, H, W)."""

    in_channels: Sequence[int]
    out_channels: Sequence[int]
    kernel: tuple
    bn_size: int

    @nn.compact
    def __call__(self, inputs, *, rng=None):
        x = jnp.transpose(inputs, (0, 2, 3, 1))
        B, H, W, _ = x.shape
        for i, out_ch in enumerate(self.out_channels):
            x = nn.relu(
                nn.Conv(out_ch, tuple(self.kernel), padding="SAME",
                        name=f"enc_conv_{i}")(x)
            )
        seq = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, W, -1)  # (B, W, H*C)
        means = nn.Dense(self.bn_size, name="means")(seq)
        logvars = nn.Dense(self.bn_size, name="vars")(seq)
        if rng is None:
            rng = self.make_rng("sample")
        z = sample_latent(rng, means, logvars)
        # decoder mirrors the encoder: expand to the encoder's last channel
        # count, then transpose-convs walk the reversed channel list
        # (reference VAECNNDecoderNopool :242 with in=out_channels[::-1]).
        c_top = self.out_channels[-1]
        y = nn.Dense(H * c_top, name="expand")(z)  # (B, W, H*c_top)
        y = y.reshape(B, W, H, c_top).transpose(0, 2, 1, 3)
        dec_channels = list(self.in_channels[::-1])
        for i, out_ch in enumerate(dec_channels):
            y = nn.ConvTranspose(
                out_ch, tuple(self.kernel), padding="SAME",
                name=f"dec_conv_{i}",
            )(y)
            if i + 1 < len(dec_channels):
                y = nn.relu(y)
        recon = jnp.transpose(y, (0, 3, 1, 2))
        return recon, (means, logvars)


class CNNAE(nn.Module):
    """Plain conv AE with ReLU bottleneck (reference nnetCNNAE :347)."""

    in_channels: Sequence[int]
    out_channels: Sequence[int]
    kernel: tuple
    bn_size: int

    @nn.compact
    def __call__(self, inputs):
        x = jnp.transpose(inputs, (0, 2, 3, 1))
        B, H, W, _ = x.shape
        for i, out_ch in enumerate(self.out_channels):
            x = nn.relu(
                nn.Conv(out_ch, tuple(self.kernel), padding="SAME",
                        name=f"enc_conv_{i}")(x)
            )
        seq = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, W, -1)
        z = nn.relu(nn.Dense(self.bn_size, name="bn")(seq))
        c_top = self.out_channels[-1]
        y = nn.Dense(H * c_top, name="expand")(z)
        y = y.reshape(B, W, H, c_top).transpose(0, 2, 1, 3)
        dec_channels = list(self.in_channels[::-1])
        for i, out_ch in enumerate(dec_channels):
            y = nn.ConvTranspose(
                out_ch, tuple(self.kernel), padding="SAME",
                name=f"dec_conv_{i}",
            )(y)
            if i + 1 < len(dec_channels):
                y = nn.relu(y)
        return jnp.transpose(y, (0, 3, 1, 2)), z


class RateScaleConv(nn.Module):
    """Rate-scale (Gabor-like) conv: kernels are
    sin(rate*t + scale*f) * hanning2d with learnable per-(out,in) rate and
    scale (reference rsconv2d :360-398). Synthesised as one broadcast
    expression. Input/output (B, H, W, C) NHWC."""

    in_channel: int
    out_channel: int
    kernel_size: tuple  # (kf, kt)

    @nn.compact
    def __call__(self, x):
        kf, kt = self.kernel_size
        rates = self.param(
            "rates",
            nn.initializers.uniform(1.0),
            (self.out_channel, self.in_channel),
            jnp.float32,
        ).astype(x.dtype)
        scales = self.param(
            "scales",
            nn.initializers.zeros,
            (self.out_channel, self.in_channel),
            jnp.float32,
        ).astype(x.dtype)
        t = jnp.arange(kt, dtype=x.dtype)[None, None, None, :]
        f = jnp.arange(kf, dtype=x.dtype)[None, None, :, None]
        ww = jnp.asarray(
            np.outer(np.hanning(kf), np.hanning(kt)), x.dtype
        )[None, None]
        w = jnp.sin(rates[:, :, None, None] * t + scales[:, :, None, None] * f) * ww
        # (O, I, kf, kt) -> HWIO
        w = jnp.transpose(w, (2, 3, 1, 0))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class RateScaleConvTranspose(nn.Module):
    """Transposed rate-scale conv (reference rsconvTranspose2d :401)."""

    in_channel: int
    out_channel: int
    kernel_size: tuple

    @nn.compact
    def __call__(self, x):
        kf, kt = self.kernel_size
        rates = self.param(
            "rates",
            nn.initializers.uniform(1.0),
            (self.in_channel, self.out_channel),
            jnp.float32,
        ).astype(x.dtype)
        scales = self.param(
            "scales",
            nn.initializers.zeros,
            (self.in_channel, self.out_channel),
            jnp.float32,
        ).astype(x.dtype)
        t = jnp.arange(kt, dtype=x.dtype)[None, None, None, :]
        f = jnp.arange(kf, dtype=x.dtype)[None, None, :, None]
        ww = jnp.asarray(np.outer(np.hanning(kf), np.hanning(kt)), x.dtype)[None, None]
        w = jnp.sin(rates[:, :, None, None] * t + scales[:, :, None, None] * f) * ww
        # true transposed-conv (adjoint) semantics, like the reference's
        # F.conv_transpose2d (rsconvTranspose2d :440): lax.conv_transpose
        # correlates, so flip the synthesised kernel spatially
        w = w[:, :, ::-1, ::-1]
        w = jnp.transpose(w, (2, 3, 0, 1))  # HWIO (I=in, O=out)
        return jax.lax.conv_transpose(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class VaeRsModulation(nn.Module):
    """Conv VAE whose last encoder / first decoder conv is rate-scale
    (reference nnetVaeRsModulation :510). Input (B, C, H, W)."""

    in_channels: Sequence[int]
    out_channels: Sequence[int]
    kernel: tuple
    bn_size: int

    @nn.compact
    def __call__(self, inputs, *, rng=None):
        x = jnp.transpose(inputs, (0, 2, 3, 1))
        B, H, W, _ = x.shape
        for i, out_ch in enumerate(self.out_channels[:-1]):
            x = nn.relu(
                nn.Conv(out_ch, tuple(self.kernel), padding="SAME",
                        name=f"enc_conv_{i}")(x)
            )
        x = nn.relu(
            RateScaleConv(
                self.in_channels[-1], self.out_channels[-1], tuple(self.kernel),
                name="enc_rs",
            )(x)
        )
        seq = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, W, -1)
        means = nn.Dense(self.bn_size, name="means")(seq)
        logvars = nn.Dense(self.bn_size, name="vars")(seq)
        if rng is None:
            rng = self.make_rng("sample")
        z = sample_latent(rng, means, logvars)
        c_top = self.out_channels[-1]
        y = nn.Dense(H * c_top, name="expand")(z)
        y = y.reshape(B, W, H, c_top).transpose(0, 2, 1, 3)
        y = nn.relu(
            RateScaleConvTranspose(
                c_top, self.in_channels[-1], tuple(self.kernel),
                name="dec_rs",
            )(y)
        )
        dec_channels = list(self.in_channels[::-1])[1:]
        for i, out_ch in enumerate(dec_channels):
            y = nn.ConvTranspose(
                out_ch, tuple(self.kernel), padding="SAME",
                name=f"dec_conv_{i}",
            )(y)
            if i + 1 < len(dec_channels):
                y = nn.relu(y)
        return jnp.transpose(y, (0, 3, 1, 2)), (means, logvars)
