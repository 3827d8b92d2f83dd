"""Ring attention (parallel/ring.py): exact forward + gradient parity
with single-device masked attention on the virtual mesh — the
long-context extension point SURVEY.md §5 names (the reference truncates
to 512 frames instead)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from speech_recognition_tools_tpu.parallel.ring import NEG, ring_attention


def _full_attention(q, k, v, lengths, causal=False, scale=None):
    """Plain masked attention with the same mask fill (the oracle)."""
    B, T, H, Dh = q.shape
    if scale is None:
        scale = 1.0 / np.sqrt(Dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    kpos = jnp.arange(T)
    mask = (kpos[None, :] < lengths[:, None])[:, None, None, :]
    if causal:
        mask = mask & (kpos[None, None, None, :] <= kpos[None, None, :, None])
    s = jnp.where(mask, s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _qkv(key, B, T, H, Dh):
    ks = jax.random.split(key, 3)
    shape = (B, T, H, Dh)
    return tuple(jax.random.normal(k, shape, jnp.float32) for k in ks)


class TestRingAttention:
    @pytest.mark.parametrize(
        "causal",
        [False, pytest.param(True, marks=pytest.mark.slow)],
    )
    def test_matches_full_attention(self, causal):
        # 4-dev ring: the hop/masking logic is block-count-invariant and
        # the 8-dev case is exercised by the driver dryrun (stage 7);
        # halving the unrolled ring keeps the default-suite compile
        # budget down
        assert jax.device_count() >= 4
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("time",))
        B, T, H, Dh = 2, 64, 4, 8
        q, k, v = _qkv(jax.random.key(0), B, T, H, Dh)
        lengths = jnp.asarray([T, T - 23], jnp.int32)

        ref = _full_attention(q, k, v, lengths, causal=causal)
        got = ring_attention(q, k, v, lengths, mesh=mesh, causal=causal)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.slow
    def test_gradients_match(self):
        assert jax.device_count() >= 8
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("time",))
        B, T, H, Dh = 2, 32, 2, 4
        q, k, v = _qkv(jax.random.key(1), B, T, H, Dh)
        lengths = jnp.asarray([T, T - 9], jnp.int32)
        tgt = jax.random.normal(jax.random.key(2), q.shape)
        # only valid query rows contribute (padding rows carry the same
        # uniform-weight garbage in both implementations, but keep the
        # loss on real rows as a caller would)
        qmask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None, None]

        def loss_ring(args):
            out = ring_attention(*args, lengths, mesh=mesh, causal=True)
            return jnp.sum(((out - tgt) * qmask) ** 2)

        def loss_full(args):
            out = _full_attention(*args, lengths, causal=True)
            return jnp.sum(((out - tgt) * qmask) ** 2)

        g_ring = jax.grad(loss_ring)((q, k, v))
        g_full = jax.grad(loss_full)((q, k, v))
        for a, b in zip(g_ring, g_full):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )
            assert np.all(np.isfinite(np.asarray(a)))

    @pytest.mark.slow
    def test_float16_padding_rows_stay_finite(self):
        """-1e30 overflows to -inf when cast to f16; the dtype-clamped
        fill must keep fully-masked padding rows (and their grads)
        finite."""
        assert jax.device_count() >= 8
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("time",))
        B, T, H, Dh = 1, 16, 2, 4
        q, k, v = (t.astype(jnp.float16)
                   for t in _qkv(jax.random.key(3), B, T, H, Dh))
        lengths = jnp.asarray([4], jnp.int32)  # rows 4..15 fully masked

        out = ring_attention(q, k, v, lengths, mesh=mesh)
        assert np.all(np.isfinite(np.asarray(out)))

        def loss(args):
            o = ring_attention(*args, lengths, mesh=mesh)
            qmask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None, None]
            return jnp.sum(((o.astype(jnp.float32)) * qmask) ** 2)

        g = jax.grad(loss)((q, k, v))
        for a in g:
            assert np.all(np.isfinite(np.asarray(a)))

    def test_rejects_indivisible_time(self):
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("time",))
        q = jnp.zeros((1, 12, 2, 4))
        with pytest.raises(ValueError):
            ring_attention(q, q, q, mesh=mesh)


class TestEncodeRing:
    """encode_ring (VERDICT r3 weak #3b consumer): the full transformer
    encoder with self-attention routed through the time ring must match
    model.encode on an ordinary checkpoint, including ragged lengths and
    frame counts that need padding to the ring size."""

    def _setup(self, encoder_type="transformer"):
        from speech_recognition_tools_tpu.models.transformer_asr import (
            TransformerASR,
            TransformerASRConfig,
        )

        cfg = TransformerASRConfig(
            vocab_size=12, adim=16, aheads=2, elayers=2, eunits=24,
            dlayers=1, dunits=24, dropout=0.0, encoder_type=encoder_type,
        )
        model = TransformerASR(cfg)
        rs = np.random.RandomState(4)
        B, T, D, U = 2, 70, 8, 4  # subsampled T=17: pads to 20 on 4 devs
        batch = {
            "feats": jnp.asarray(rs.randn(B, T, D), jnp.float32),
            "lengths": jnp.asarray([T, T - 13], jnp.int32),
            "tokens": jnp.asarray(rs.randint(1, 10, (B, U)), jnp.int32),
        }
        params = model.init(
            {"params": jax.random.key(3)},
            batch["feats"], batch["lengths"], batch["tokens"],
        )
        return model, params, batch

    # full-encoder ring parity is compile-heavy (~47 s on the 1-core CI
    # box); the default suite keeps TestRingAttention's layer-level
    # parity as the fast representative and the dryrun covers the
    # sharded path (stage 7)
    @pytest.mark.slow
    @pytest.mark.parametrize(
        "encoder_type",
        ["transformer", pytest.param("conformer", marks=pytest.mark.slow)],
    )
    def test_matches_plain_encode(self, encoder_type):
        from speech_recognition_tools_tpu.models.transformer_asr import (
            TransformerASR,
            encode_ring,
        )

        model, params, batch = self._setup(encoder_type)
        mem_ref, len_ref, ctc_ref = model.apply(
            params, batch["feats"], batch["lengths"],
            method=TransformerASR.encode,
        )
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("time",))
        mem, enc_len, ctc = encode_ring(
            model, params, batch["feats"], batch["lengths"], mesh
        )
        assert (np.asarray(enc_len) == np.asarray(len_ref)).all()
        # compare only valid frames (padded rows differ by construction)
        for b in range(mem.shape[0]):
            L = int(enc_len[b])
            err = float(jnp.max(jnp.abs(mem[b, :L] - mem_ref[b, :L])))
            cerr = float(jnp.max(jnp.abs(ctc[b, :L] - ctc_ref[b, :L])))
            assert err < 1e-4, (b, err)
            assert cerr < 1e-4, (b, cerr)

    @pytest.mark.slow
    def test_beam_search_encode_fn_hook(self):
        """beam_search(encode_fn=encode_ring ...) decodes identical
        tokens to the plain path on a real (trained-shape) checkpoint.
        Slow: the host beam loop's per-step dispatch dominates; the
        default suite covers encode parity above, and the --ring_attention
        CLI flag is driven in test_pipeline_parallel's slow CLI test."""
        from speech_recognition_tools_tpu.models.transformer_asr import (
            beam_search,
            encode_ring,
        )

        model, params, batch = self._setup()
        cfg = model.cfg
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("time",))
        f1, l1 = batch["feats"][:1], batch["lengths"][:1]
        ref = beam_search(model, params, f1, l1, cfg, beam_size=2,
                          max_len=6)
        got = beam_search(
            model, params, f1, l1, cfg, beam_size=2, max_len=6,
            encode_fn=lambda f, l: encode_ring(model, params, f, l, mesh),
        )
        assert ref == got, (ref, got)
