"""SpecAugment: time warp, frequency masking, time masking.

The reference's e2e recipes apply it through ESPnet's preprocessing
(e2e/wsj/conf/specaug.yaml: time_warp max 5, 2 freq masks F=30, 2 time
masks T=40, replace with the utterance mean). Implemented as a pure
batched JAX transform driven by a PRNG key — runs on-device inside the
training step.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SpecAugConfig:
    max_time_warp: int = 5
    freq_mask_width: int = 30
    n_freq_masks: int = 2
    time_mask_width: int = 40
    n_time_masks: int = 2
    replace_with_zero: bool = False  # False = utterance mean (yaml default)


def _mask_axis(key, feats, lengths_axis, width, n_masks, axis, fill):
    """Apply n random masks of width <= `width` along `axis` (1=time,
    2=freq). lengths_axis: per-utt valid size along that axis."""
    B = feats.shape[0]
    size = feats.shape[axis]
    idx = jnp.arange(size)
    out = feats
    for i in range(n_masks):
        key, k1, k2 = jax.random.split(key, 3)
        w = jax.random.randint(k1, (B,), 0, width + 1)
        start = (
            jax.random.uniform(k2, (B,))
            * jnp.maximum(lengths_axis - w, 1)
        ).astype(jnp.int32)
        mask = (idx[None, :] >= start[:, None]) & (
            idx[None, :] < (start + w)[:, None]
        )
        shape = [B, 1, 1]
        shape[axis] = size
        mask = mask.reshape(shape)
        out = jnp.where(mask, fill, out)
    return out


def _time_warp(key, feats, lengths, max_warp):
    """Linear time warp: a random anchor within [max_warp, len-max_warp)
    moves by up to +-max_warp; frames gather from the piecewise-linear
    warped grid (PIL-mode equivalent)."""
    B, T, D = feats.shape
    key, k1, k2 = jax.random.split(key, 3)
    center = (
        max_warp
        + jax.random.uniform(k1, (B,))
        * jnp.maximum(lengths - 2 * max_warp, 1)
    ).astype(jnp.int32)
    shift = jax.random.randint(k2, (B,), -max_warp, max_warp + 1)
    tgt = jnp.arange(T)[None, :].astype(jnp.float32)
    c = center[:, None].astype(jnp.float32)
    s = (center + shift)[:, None].astype(jnp.float32)
    L = lengths[:, None].astype(jnp.float32)
    # piecewise linear source index: [0, s) <- [0, c); [s, L) <- [c, L)
    src = jnp.where(
        tgt < s,
        tgt * c / jnp.maximum(s, 1.0),
        c + (tgt - s) * (L - c) / jnp.maximum(L - s, 1.0),
    )
    src = jnp.clip(jnp.round(src).astype(jnp.int32), 0, T - 1)
    warped = jnp.take_along_axis(feats, src[..., None], axis=1)
    valid = jnp.arange(T)[None, :, None] < lengths[:, None, None]
    return jnp.where(valid, warped, feats)


def spec_augment(key, feats, lengths, cfg: SpecAugConfig = SpecAugConfig()):
    """Apply SpecAugment to a padded (B, T, D) batch."""
    B, T, D = feats.shape
    if cfg.replace_with_zero:
        fill = jnp.zeros((B, 1, 1), feats.dtype)
    else:
        m = (jnp.arange(T)[None, :] < lengths[:, None]).astype(feats.dtype)
        mean = jnp.sum(feats * m[..., None], axis=(1, 2)) / jnp.maximum(
            jnp.sum(m, axis=1) * D, 1.0
        )
        fill = mean[:, None, None]
    k1, k2, k3 = jax.random.split(key, 3)
    out = feats
    if cfg.max_time_warp:
        out = _time_warp(k1, out, lengths, cfg.max_time_warp)
    out = _mask_axis(
        k2, out, jnp.full((B,), D), cfg.freq_mask_width, cfg.n_freq_masks,
        axis=2, fill=fill,
    )
    out = _mask_axis(
        k3, out, lengths, cfg.time_mask_width, cfg.n_time_masks,
        axis=1, fill=fill,
    )
    return out
