"""Windowed overlap-add of per-frame pole-model envelopes.

Replicates the OLA pointer logic of the reference FDLP driver
(`/root/reference/src/featgen/computeFDLPSpectrogram.py:203-225`):

  * frame 0 contributes the second half of its envelope, ms[kkb2:], at
    output position 0;
  * frame i >= 1 contributes its full kk-sample envelope at
    ptr_i = (hop - kkb2) + (i-1)*hop + cumulative jitter, where the
    reference adds randrange(2) per step;
  * contributions falling outside [0, T) are dropped (the reference clips
    the last two frames explicitly; middle frames never overflow).

TPU-first design: the tap positions are uniform-stride —
pos[i, k] = i*hop + k - kkb2 for every frame i (frame 0's offset -kkb2 is
the same formula) — so jitter-free OLA is ceil(kk/hop) static shifted
adds of hop-sized envelope chunks (pure VPU adds, bandwidth-optimal; the
round-1 one-hot placement matmul was the pipeline's bottleneck at ~28 ms
per batch on v5e). The jittered path (reference adds randrange(2) per
step, making positions data-dependent) keeps the one-hot placement
matmul.
"""

import jax
import jax.numpy as jnp


def ola_positions(
    max_frames: int,
    hop: int,
    kk: int,
    kkb2: int,
    jitter: jax.Array | None = None,
):
    """Output position of envelope tap k of frame i.

    Args:
      max_frames: static frame bound F.
      hop: OLA hop int(np.round(fduration*frate*overlap_fraction)).
      kk: envelope length int(np.round(fduration*frate)).
      kkb2: int(np.round(fduration*frate/2)).
      jitter: optional (F,) int array of per-step jitter in {0,1}
        (reference: randrange(2) added after each frame i >= 1). None = 0.

    Returns:
      pos: (F, kk) int32 output index for each envelope tap.
      valid: (F, kk) bool — False for frame-0 taps k < kkb2 (the reference
        only uses ms[kkb2:] for the first frame).
    """
    i = jnp.arange(max_frames)[:, None]
    k = jnp.arange(kk)[None, :]
    if jitter is None:
        cum_jit = jnp.zeros((max_frames, 1), jnp.int32)
    else:
        # jitter[u] is added when advancing from frame u to u+1 (u >= 1);
        # frame i >= 2 sees sum of jitter[1..i-1].
        j = jnp.where(jnp.arange(max_frames) >= 1, jitter, 0)
        cum = jnp.cumsum(j) - j  # exclusive cumsum
        cum_jit = cum[:, None].astype(jnp.int32)
    offset = jnp.where(i == 0, -kkb2, (hop - kkb2) + (i - 1) * hop + cum_jit)
    pos = offset + k
    valid = jnp.where(i == 0, k >= kkb2, True)
    return pos.astype(jnp.int32), valid


def overlap_add(
    env: jax.Array,
    pos: jax.Array,
    valid: jax.Array,
    num_frames: jax.Array,
    out_len_valid: jax.Array,
    max_out_len: int,
    *,
    hop: int | None = None,
    kkb2: int | None = None,
) -> jax.Array:
    """Place envelopes at their OLA positions and sum.

    Args:
      env: (B, F, NB, kk) envelopes.
      pos: (F, kk) or (B, F, kk) tap positions.
      valid: (F, kk) static tap validity.
      num_frames: (B,) valid frames per utterance.
      out_len_valid: (B,) true output length T_b per utterance.
      max_out_len: static output bound T.
      hop, kkb2: when given (jitter-free path), positions are known to be
        the uniform stride pos[i, k] = i*hop + k - kkb2 and the fast
        shifted-add kernel is used; otherwise the one-hot placement
        matmul handles arbitrary (jittered) positions.

    Returns: (B, NB, T) accumulated envelopes (zero beyond T_b).
    """
    B, F, NB, kk = env.shape
    if hop is not None:
        return _overlap_add_strided(
            env, valid, num_frames, out_len_valid, max_out_len, hop, kkb2
        )
    if pos.ndim == 2:
        pos = jnp.broadcast_to(pos[None], (B, F, kk))

    mask = (
        valid[None]
        & (pos >= 0)
        & (pos < out_len_valid[:, None, None])
        & (jnp.arange(F)[None, :, None] < num_frames[:, None, None])
    )

    def one(env_b, pos_b, mask_b):
        # (NB, F*kk) @ (F*kk, T) one-hot placement
        vals = jnp.where(mask_b[:, None, :], env_b, 0.0)
        vals = vals.transpose(1, 0, 2).reshape(NB, F * kk)
        p = jnp.where(mask_b, pos_b, -1).reshape(F * kk)
        onehot = (
            p[:, None] == jnp.arange(max_out_len)[None, :]
        ).astype(env_b.dtype)
        return jnp.dot(
            vals,
            onehot,
            preferred_element_type=vals.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    return jax.vmap(one)(env, pos, mask)


def _overlap_add_strided(
    env, valid, num_frames, out_len_valid, max_out_len, hop, kkb2
):
    """Uniform-stride OLA: ceil(kk/hop) shifted adds of hop-sized chunks.

    Tap (i, k) lands at t = i*hop + k - kkb2. Chunk j of frame i (taps
    k in [j*hop, (j+1)*hop)) lands at shifted-output block (i + j); the
    accumulated shifted output is then sliced at kkb2 (which also drops
    the t < 0 taps) and masked beyond each utterance's true length (which
    drops the t >= T_b taps, like the reference's end clipping).
    """
    B, F, NB, kk = env.shape
    nchunks = -(-kk // hop)
    mask = (
        valid[None]
        & (jnp.arange(F)[None, :, None] < num_frames[:, None, None])
    )
    env = jnp.where(mask[:, :, None, :], env, 0.0)
    env = jnp.moveaxis(env, 2, 1)  # (B, NB, F, kk)
    pad = nchunks * hop - kk
    if pad:
        env = jnp.pad(env, ((0, 0), (0, 0), (0, 0), (0, pad)))
    chunks = env.reshape(B, NB, F, nchunks, hop)

    total = (F + nchunks - 1) * hop
    out = jnp.zeros((B, NB, F + nchunks - 1, hop), env.dtype)
    for j in range(nchunks):
        out = jax.lax.dynamic_update_slice_in_dim(
            out,
            jax.lax.dynamic_slice_in_dim(out, j, F, axis=2)
            + chunks[:, :, :, j, :],
            j,
            axis=2,
        )
    out = out.reshape(B, NB, total)

    # slice [kkb2, kkb2 + T); pad right if the shifted buffer is short
    if kkb2 + max_out_len > total:
        out = jnp.pad(
            out, ((0, 0), (0, 0), (0, kkb2 + max_out_len - total))
        )
    out = jax.lax.slice_in_dim(out, kkb2, kkb2 + max_out_len, axis=2)
    tmask = jnp.arange(max_out_len)[None, :] < out_len_valid[:, None]
    return out * tmask[:, None, :].astype(out.dtype)
