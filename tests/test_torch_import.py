"""Golden parity: reference torch checkpoints -> native flax checkpoints.

Builds the reference's own torch modules (/root/reference/src/nnet/
nnet_models.py — the correct use of the read-only mount, as oracles),
converts their state_dicts with io/torch_import.py and asserts forward
parity on valid frames. This is the migration path for users with trained
reference models (train_rnn_nnet_classifier.py:273-288 checkpoint dicts).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/src/nnet")
refm = pytest.importorskip("nnet_models")
refm_cnn = pytest.importorskip("nnet_models_cnn")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from speech_recognition_tools_tpu.io.torch_import import (  # noqa: E402
    convert_state_dict,
    detect_family,
    import_torch_checkpoint,
)

D, H, BN, C, B, T = 7, 10, 5, 6, 3, 12
LENGTHS = [12, 9, 5]  # descending (torch pack_padded enforce_sorted)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    return x, np.asarray(LENGTHS, np.int64)


def _torch_fwd(module, x, lengths=None):
    module.eval()
    with torch.no_grad():
        if lengths is None:
            return module(torch.from_numpy(x))
        return module(torch.from_numpy(x), torch.from_numpy(lengths))


def _valid(arr, lengths):
    """Concatenate valid frames of (B, T, ...)."""
    arr = np.asarray(arr)
    return np.concatenate([arr[b, : lengths[b]] for b in range(len(lengths))])


def _apply_native(cfg, variables, x, lengths):
    """Rebuild through the CLI config contract (the checkpoints' consumer
    path) and apply."""
    import argparse

    from speech_recognition_tools_tpu.cli.train_am import build_model

    args = argparse.Namespace(**cfg)
    model = build_model(args, cfg["feature_dim"], cfg.get("num_classes"))
    if cfg["arch"] == "feedforward":
        return model.apply(variables, jnp.asarray(x))
    return model.apply(variables, jnp.asarray(x), jnp.asarray(lengths))


def _assert_close(a, b, tol=3e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=tol, atol=tol)


def test_rnn_classifier_parity():
    x, lengths = _inputs(1)
    tm = refm.nnetRNN(D, 2, H, C, dropout=0.0)
    ref = _torch_fwd(tm, x, lengths).numpy()

    variables, cfg = convert_state_dict(tm.state_dict(), {"dropout": 0.0})
    assert cfg["arch"] == "rnn" and cfg["num_classes"] == C
    assert cfg["feature_dim"] == D and cfg["num_layers"] == 2
    out = _apply_native(cfg, variables, x, lengths)
    _assert_close(_valid(out, lengths), _valid(ref, lengths))


def test_feedforward_single_linear_parity():
    """num_layers=0 checkpoints (one Linear in `layers`) have no dense_0;
    the converter must fall back to the output head for the geometry
    fields instead of crashing (mirrors _convert_linear's guard)."""
    x, lengths = _inputs(7)
    tm = refm.nnetFeedforward(D, 0, H, C)
    tm.eval()
    with torch.no_grad():
        ref_embeds, ref_logits = tm(torch.from_numpy(x))

    variables, cfg = convert_state_dict(tm.state_dict(), {})
    assert cfg["arch"] == "feedforward" and cfg["num_layers"] == 0
    assert cfg["feature_dim"] == D and cfg["num_classes"] == C
    embeds, logits = _apply_native(cfg, variables, x, lengths)
    _assert_close(logits, ref_logits.numpy())
    assert len(embeds) == len(ref_embeds) == 0


def test_feedforward_parity():
    x, lengths = _inputs(2)
    tm = refm.nnetFeedforward(D, 3, H, C)
    tm.eval()
    with torch.no_grad():
        ref_embeds, ref_logits = tm(torch.from_numpy(x))

    variables, cfg = convert_state_dict(tm.state_dict(), {})
    assert cfg["arch"] == "feedforward" and cfg["num_layers"] == 3
    embeds, logits = _apply_native(cfg, variables, x, lengths)
    _assert_close(logits, ref_logits.numpy())
    assert len(embeds) == len(ref_embeds) == 3
    for ours, theirs in zip(embeds, ref_embeds):
        _assert_close(ours, theirs.numpy())


def test_linear_conv_parity():
    x, lengths = _inputs(3)
    tm = refm.nnetLinearWithConv(D, 2, H, C)
    ref = _torch_fwd(tm, x, lengths).numpy()

    variables, cfg = convert_state_dict(tm.state_dict(), {})
    assert cfg["arch"] == "linear" and cfg["num_layers"] == 2
    out = _apply_native(cfg, variables, x, lengths)
    _assert_close(out, ref)


def test_multitask_ae_parity():
    x, lengths = _inputs(4)
    tm = refm.nnetAEClassifierMultitask(D, C, 2, 1, 1, H, BN, dropout=0.0)
    tm.eval()
    with torch.no_grad():
        ref_logits, ref_recon = tm(
            torch.from_numpy(x), torch.from_numpy(lengths)
        )

    variables, cfg = convert_state_dict(tm.state_dict(), {"dropout": 0.0})
    assert cfg["arch"] == "multitask_ae"
    assert cfg["bn_dim"] == BN and cfg["num_layers_dec"] == 1
    logits, recon = _apply_native(cfg, variables, x, lengths)
    _assert_close(_valid(logits, lengths), _valid(ref_logits.numpy(), lengths))
    _assert_close(_valid(recon, lengths), _valid(ref_recon.numpy(), lengths))


def test_multitask_aear_parity():
    # The reference nnetAEClassifierMultitaskAEAR cannot be *constructed*
    # (it calls encoderRNN without the required dropout arg,
    # nnet_models.py:250) — one of the survey's documented dead spots. The
    # state_dict layout is still well-defined, so compose it from the
    # submodules and check against the composed torch forward.
    x, lengths = _inputs(5)
    shift = 2
    enc = refm.encoderRNN(D, 2, H, BN, dropout=0.0)
    cls = refm.decoderRNN(BN, 1, H, C)
    ae = refm.decoderRNN(BN, 1, H, D)
    ar = refm.decoderRNN(BN, 1, H, D)
    for m in (enc, cls, ae, ar):
        m.eval()
    with torch.no_grad():
        tl = torch.from_numpy(lengths)
        z = enc(torch.from_numpy(x), tl)
        ref_logits = cls(z, tl).numpy()
        ref_recon = ae(z, tl).numpy()
        z_ar = enc(torch.from_numpy(x[:, :-shift]), tl - shift)
        ref_ar = ar(z_ar, tl - shift).numpy()

    sd = {}
    for prefix, mod in (("encoder", enc), ("classifier", cls), ("ae", ae),
                        ("ar", ar)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    assert detect_family(sd) == "multitask_aear"
    variables, cfg = convert_state_dict(sd, {"time_shift": shift})
    assert cfg["time_shift"] == shift
    logits, recon, recon_ar = _apply_native(cfg, variables, x, lengths)
    _assert_close(_valid(logits, lengths), _valid(ref_logits, lengths))
    _assert_close(_valid(recon, lengths), _valid(ref_recon, lengths))
    ar_lengths = lengths - shift
    _assert_close(_valid(recon_ar, ar_lengths), _valid(ref_ar, ar_lengths))


def test_vae_only_ae_parity():
    x, lengths = _inputs(6)
    tm = refm.nnetVAE(D, 2, 1, H, BN, 0.0, use_gpu=False, only_AE=True)
    tm.eval()
    with torch.no_grad():
        ref_recon, ref_latent = tm(
            torch.from_numpy(x), torch.from_numpy(lengths)
        )

    variables, cfg = convert_state_dict(tm.state_dict(), {"only_AE": True})
    assert cfg["arch"] == "vae" and cfg["only_ae"] is True
    recon, (means, logvars) = _apply_native(cfg, variables, x, lengths)
    _assert_close(_valid(recon, lengths), _valid(ref_recon.numpy(), lengths))
    _assert_close(_valid(means, lengths), _valid(ref_latent[0].numpy(), lengths))
    _assert_close(
        _valid(logvars, lengths), _valid(ref_latent[1].numpy(), lengths)
    )


def test_vae_classifier_parity():
    # The sampler is stochastic, so check the deterministic pieces: encoder
    # latents via the full model, classifier + decoder by driving the
    # converted subtrees directly on a fixed z.
    x, lengths = _inputs(7)
    tm = refm.nnetVAEClassifier(D, C, 2, 1, 1, H, BN, 0.0, use_gpu=False)
    tm.eval()
    with torch.no_grad():
        tl = torch.from_numpy(lengths)
        latent = tm.vae_encoder(torch.from_numpy(x), tl)
        rng = np.random.default_rng(8)
        z_np = rng.standard_normal((B, T, BN)).astype(np.float32)
        ref_logits = tm.classifier(torch.from_numpy(z_np), tl).numpy()
        ref_recon = tm.vae_decoder(torch.from_numpy(z_np), tl).numpy()

    variables, cfg = convert_state_dict(tm.state_dict(), {})
    assert cfg["arch"] == "vae_classifier" and cfg["num_classes"] == C

    from speech_recognition_tools_tpu.models.recurrent import DecoderRNN
    from speech_recognition_tools_tpu.models.vae import VAEDecoder, VAEEncoder

    p = variables["params"]
    means, logvars, _ = VAEEncoder(2, H, BN).apply(
        {"params": p["vae_encoder"]}, jnp.asarray(x), jnp.asarray(lengths)
    )
    _assert_close(_valid(means, lengths), _valid(latent[0].numpy(), lengths))
    _assert_close(_valid(logvars, lengths), _valid(latent[1].numpy(), lengths))

    logits = DecoderRNN(1, H, C).apply(
        {"params": p["classifier"]}, jnp.asarray(z_np), jnp.asarray(lengths)
    )
    _assert_close(_valid(logits, lengths), _valid(ref_logits, lengths))
    recon = VAEDecoder(1, H, D).apply(
        {"params": p["vae_decoder"]}, jnp.asarray(z_np), jnp.asarray(lengths)
    )
    _assert_close(_valid(recon, lengths), _valid(ref_recon, lengths))


def test_arvae_parity():
    x, lengths = _inputs(9)
    num_outs = 2
    tm = refm.nnetARVAE(D, 2, 1, H, BN, 0.0, num_outs, use_gpu=False)
    tm.eval()
    with torch.no_grad():
        tl = torch.from_numpy(lengths)
        latent = tm.vae_encoder(torch.from_numpy(x), tl)
        rng = np.random.default_rng(10)
        z_np = rng.standard_normal((B, T, BN)).astype(np.float32)
        ref_decs = [
            tm.vae_decoder[i](torch.from_numpy(z_np), tl).numpy()
            for i in range(num_outs)
        ]

    variables, cfg = convert_state_dict(tm.state_dict(), {})
    assert cfg["arch"] == "arvae" and cfg["time_shift"] == num_outs

    from speech_recognition_tools_tpu.models.vae import VAEDecoder, VAEEncoder

    p = variables["params"]
    means, logvars, _ = VAEEncoder(2, H, BN).apply(
        {"params": p["vae_encoder"]}, jnp.asarray(x), jnp.asarray(lengths)
    )
    _assert_close(_valid(means, lengths), _valid(latent[0].numpy(), lengths))
    _assert_close(_valid(logvars, lengths), _valid(latent[1].numpy(), lengths))
    for i in range(num_outs):
        out = VAEDecoder(1, H, D).apply(
            {"params": p[f"decoder_{i}"]}, jnp.asarray(z_np),
            jnp.asarray(lengths),
        )
        _assert_close(_valid(out, lengths), _valid(ref_decs[i], lengths))


def test_curl_multistream_parity():
    x, lengths = _inputs(12)
    K = 2
    tm = refm.nnetCurlMultistreamClassifier(
        D, 1, 1, 1, H, H, BN, K, C, use_gpu=False
    )
    tm.eval()
    with torch.no_grad():
        tl = torch.from_numpy(lengths)
        cat_ref, means_ref, vars_ref = tm.curl_encoder(torch.from_numpy(x), tl)
        rng = np.random.default_rng(13)
        z_np = rng.standard_normal((K, B, T, BN)).astype(np.float32)
        z_t = torch.from_numpy(z_np)
        ref_cls = [tm.classifier[k](z_t[k], tl).numpy() for k in range(K)]
        ref_rec = tm.curl_decoder(z_t, tl).numpy()

    variables, cfg = convert_state_dict(tm.state_dict(), {})
    assert cfg["arch"] == "curl" and cfg["comp_num"] == K
    assert cfg["num_classes"] == C and cfg["bn_dim"] == BN

    from speech_recognition_tools_tpu.models.curl import (
        CurlDecoderMultistream,
        CurlEncoder,
    )
    from speech_recognition_tools_tpu.models.recurrent import DecoderRNN

    p = variables["params"]
    cat, means, logvars = CurlEncoder(1, H, BN, K).apply(
        {"params": p["curl_encoder"]}, jnp.asarray(x), jnp.asarray(lengths)
    )
    _assert_close(_valid(cat, lengths), _valid(cat_ref.numpy(), lengths))
    for k in range(K):
        _assert_close(
            _valid(means[k], lengths), _valid(means_ref[k].numpy(), lengths)
        )
        _assert_close(
            _valid(logvars[k], lengths), _valid(vars_ref[k].numpy(), lengths)
        )
        cls = DecoderRNN(1, H, C).apply(
            {"params": p[f"classifier_{k}"]}, jnp.asarray(z_np[k]),
            jnp.asarray(lengths),
        )
        _assert_close(_valid(cls, lengths), _valid(ref_cls[k], lengths))
    rec = CurlDecoderMultistream(K, 1, H, D).apply(
        {"params": p["curl_decoder"]}, jnp.asarray(z_np), jnp.asarray(lengths)
    )
    for k in range(K):
        _assert_close(_valid(rec[k], lengths), _valid(ref_rec[k], lengths))


def test_curl_supervised_parity():
    x, lengths = _inputs(14)
    K = 3
    tm = refm.nnetCurlSupervised(D, 1, 1, H, BN, K, use_gpu=False)
    tm.eval()
    with torch.no_grad():
        tl = torch.from_numpy(lengths)
        cat_ref, means_ref, vars_ref = tm.curl_encoder(torch.from_numpy(x), tl)
        rng = np.random.default_rng(15)
        z_np = rng.standard_normal((K, B, T, BN)).astype(np.float32)
        ref_rec = tm.curl_decoder(torch.from_numpy(z_np), tl).numpy()

    variables, cfg = convert_state_dict(tm.state_dict(), {})
    assert cfg["arch"] == "curl_unsup" and cfg["comp_num"] == K

    from speech_recognition_tools_tpu.models.curl import CurlDecoder, CurlEncoder

    p = variables["params"]
    cat, means, logvars = CurlEncoder(1, H, BN, K).apply(
        {"params": p["curl_encoder"]}, jnp.asarray(x), jnp.asarray(lengths)
    )
    _assert_close(_valid(cat, lengths), _valid(cat_ref.numpy(), lengths))
    _assert_close(
        np.stack([_valid(means[k], lengths) for k in range(K)]),
        np.stack([_valid(means_ref[k].numpy(), lengths) for k in range(K)]),
    )
    rec = CurlDecoder(1, H, D).apply(
        {"params": p["curl_decoder"]}, jnp.asarray(z_np), jnp.asarray(lengths)
    )
    for k in range(K):
        _assert_close(_valid(rec[k], lengths), _valid(ref_rec[k], lengths))


def _frozen_encoder_forward(dest, arch, x, lengths):
    """Drive the imported head exactly the way dump_outputs does: rebuild
    from config, wire the frozen base via cfg['base_model']."""
    from speech_recognition_tools_tpu.cli.dump_outputs import (
        arch_init,
        load_frozen_encoder,
        load_model_from_checkpoint,
    )
    from speech_recognition_tools_tpu.train import load_checkpoint

    model, path, cfg = load_model_from_checkpoint(dest)
    assert cfg["arch"] == arch and cfg["base_model"]
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    f, l = jnp.asarray(x), jnp.asarray(lengths)
    encode_fn = load_frozen_encoder(cfg["base_model"], arch, rngs, f, l)
    template = arch_init(model, cfg, rngs, f, l, encode_fn=encode_fn)
    payload, _ = load_checkpoint(path, template={"params": template})
    return np.asarray(model.apply(payload["params"], encode_fn(f, l), l))


def test_vae_encoded_classifier_import(tmp_path):
    x, lengths = _inputs(16)
    vae = refm.nnetVAE(D, 2, 1, H, BN, 0.0, use_gpu=False, only_AE=False)
    tm = refm.VAEEncodedClassifier(vae, BN, 2, H, C)
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(lengths)).numpy()

    src = os.path.join(tmp_path, "venc.model")
    torch.save({"model_state_dict": tm.state_dict(), "dropout": 0.0}, src)
    dest = os.path.join(tmp_path, "imported_venc")
    import_torch_checkpoint(src, dest)
    out = _frozen_encoder_forward(dest, "vae_encoded", x, lengths)
    _assert_close(_valid(out, lengths), _valid(ref, lengths))


def test_curl_encoded_classifier_import(tmp_path):
    x, lengths = _inputs(17)
    K = 2
    curl = refm.nnetCurlSupervised(D, 1, 1, H, BN, K, use_gpu=False)
    tm = refm.curlEncodedClassifier(curl, BN, 2, H, C)
    tm.eval()
    with torch.no_grad():
        # reference curlEncodedClassifier.forward calls
        # compute_latent_features with its use_gpu default True (.cuda()),
        # so it cannot run on CPU — compose the same math manually
        tl = torch.from_numpy(lengths)
        _, latent = curl(torch.from_numpy(x), tl)
        lf = refm.compute_latent_features(latent, use_gpu=False)
        h = torch.transpose(lf, 1, 2)
        for layer in tm.layers[:-1]:
            h = tm.relu(layer(h))
        ref = torch.transpose(tm.layers[-1](h), 1, 2).numpy()

    src = os.path.join(tmp_path, "cenc.model")
    torch.save({"model_state_dict": tm.state_dict()}, src)
    dest = os.path.join(tmp_path, "imported_cenc")
    import_torch_checkpoint(src, dest)
    out = _frozen_encoder_forward(dest, "curl_encoded", x, lengths)
    _assert_close(_valid(out, lengths), _valid(ref, lengths))


def test_multimod_parity():
    x, lengths = _inputs(20)
    K, sub = 2, 6
    tm = refm.nnetRNNMultimod(D, 1, 1, sub, C, K)
    tm.eval()
    streams = [x, x[..., ::-1].copy()]
    with torch.no_grad():
        ref = tm([torch.from_numpy(s) for s in streams],
                 torch.from_numpy(lengths)).numpy()

    variables, cfg = convert_state_dict(tm.state_dict(), {})
    assert cfg["arch"] == "multimod" and cfg["comp_num"] == K
    assert cfg["hidden_dim"] == K * sub and cfg["feature_dim"] == K * D

    import argparse

    from speech_recognition_tools_tpu.cli.train_am import build_model

    model = build_model(argparse.Namespace(**cfg), cfg["feature_dim"], C)
    out = model.apply(variables, [jnp.asarray(s) for s in streams],
                      jnp.asarray(lengths))
    _assert_close(_valid(out, lengths), _valid(ref, lengths))


def _apply_cnn_native(cfg, variables, x_nchw, lengths=None):
    import argparse

    from speech_recognition_tools_tpu.cli.train_am import build_model

    model = build_model(
        argparse.Namespace(**cfg), cfg["feature_dim"], cfg.get("num_classes")
    )
    if cfg["arch"] == "cnn":
        return model, model.apply(variables, jnp.asarray(x_nchw))
    if cfg["arch"] == "cldnn":
        return model, model.apply(
            variables, jnp.asarray(x_nchw), jnp.asarray(lengths)
        )
    return model, None


def test_cnn_classifier_parity():
    H, W = 9, 12
    rng = np.random.default_rng(21)
    x = rng.standard_normal((B, 1, H, W)).astype(np.float32)
    tm = refm_cnn.nnetCNNClassifier(H, W, (1, 4), (4, 6), (3, 5), C)
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()  # (B, W, C)

    variables, cfg = convert_state_dict(tm.state_dict(), {})
    assert cfg["arch"] == "cnn" and cfg["cnn_out_channels"] == [4, 6]
    assert cfg["cnn_kernel"] == [3, 5] and cfg["feature_dim"] == H
    _, out = _apply_cnn_native(cfg, variables, x)
    _assert_close(out, ref, tol=1e-4)


def test_cldnn_parity():
    H, W = 8, 12
    rng = np.random.default_rng(22)
    x = rng.standard_normal((B, 1, H, W)).astype(np.float32)
    lengths = np.asarray(LENGTHS, np.int64)
    tm = refm_cnn.nnetCLDNN(H, W, (1,), (4,), (3, 3), 10, 2, 2, C)
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(lengths)).numpy()

    variables, cfg = convert_state_dict(tm.state_dict(), {})
    assert cfg["arch"] == "cldnn" and cfg["hidden_dim"] == 10
    assert cfg["num_layers"] == 2 and cfg["num_layers_dec"] == 2
    _, out = _apply_cnn_native(cfg, variables, x, lengths)
    _assert_close(_valid(out, lengths), _valid(ref, lengths), tol=1e-4)


@pytest.mark.parametrize("rs", [False, True])
def test_conv_vae_nopool_parity(rs):
    from speech_recognition_tools_tpu.models.vae import sample_latent

    H, W = 8, 12
    rng = np.random.default_rng(23 + rs)
    x = rng.standard_normal((B, 1, H, W)).astype(np.float32)
    if rs:
        tm = refm_cnn.nnetVaeRsModulation(
            H, W, (1, 3), (3, 5), (3, 3), BN, use_gpu=False
        )
    else:
        tm = refm_cnn.nnetVAECNNNopool(
            H, W, (1, 3), (3, 5), (3, 3), BN, use_gpu=False
        )
    tm.eval()
    with torch.no_grad():
        means_t, vars_t, w_change = [
            v for v in tm.vae_encoder(torch.from_numpy(x))
        ][:3]

    variables, cfg = convert_state_dict(tm.state_dict(), {})
    assert cfg["arch"] == ("rs_vae" if rs else "vae_cnn")
    assert cfg["cnn_in_channels"] == [1, 3]
    assert cfg["cnn_out_channels"] == [3, 5] and cfg["bn_dim"] == BN

    import argparse

    from speech_recognition_tools_tpu.cli.train_am import build_model

    model = build_model(argparse.Namespace(**cfg), cfg["feature_dim"], None)
    key = jax.random.key(4)
    recon, (means, logvars) = model.apply(
        variables, jnp.asarray(x), rng=key
    )
    # encoder parity: torch heads emit (B, bn, W); ours (B, W, bn)
    _assert_close(np.swapaxes(np.asarray(means), 1, 2), means_t.numpy(),
                  tol=1e-4)
    _assert_close(np.swapaxes(np.asarray(logvars), 1, 2), vars_t.numpy(),
                  tol=1e-4)
    # decoder parity on the SAME latent sample our model drew
    z = np.asarray(sample_latent(key, means, logvars))  # (B, W, bn)
    with torch.no_grad():
        ref_recon = tm.vae_decoder(
            torch.from_numpy(np.swapaxes(z, 1, 2).copy()), W
        ).numpy()
    _assert_close(recon, ref_recon, tol=2e-4)


def test_conv_vae_pooled_parity():
    """The pooled nnetVAECNN imports as pure weight mapping — the unpool
    indices are runtime argmax values on both sides — but needs the
    training geometry (--input_hw) to unflatten its Linear heads."""
    import argparse

    from speech_recognition_tools_tpu.cli.train_am import build_model
    from speech_recognition_tools_tpu.io.torch_import import (
        UnsupportedTorchModel,
    )
    from speech_recognition_tools_tpu.models.vae import sample_latent

    H, W = 12, 16
    rng = np.random.default_rng(29)
    x = rng.standard_normal((B, 1, H, W)).astype(np.float32)
    tm = refm_cnn.nnetVAECNN(H, W, (1, 3), (3, 5), (3, 3), BN,
                             use_gpu=False)
    tm.eval()
    with torch.no_grad():
        means_t, vars_t, indices_t, sizes_t = tm.vae_encoder(
            torch.from_numpy(x)
        )

    # geometry is required (the .model dict doesn't store it) and the
    # claimed geometry is validated against the heads' in_features
    with pytest.raises(UnsupportedTorchModel, match="input_hw"):
        convert_state_dict(tm.state_dict(), {})
    with pytest.raises(UnsupportedTorchModel, match="bottleneck"):
        convert_state_dict(tm.state_dict(), {"input_hw": (H, W + 4)})

    variables, cfg = convert_state_dict(
        tm.state_dict(), {"input_hw": (H, W)}
    )
    assert cfg["arch"] == "vae_cnn_pool"
    assert cfg["model_class"] == "VAECNN"
    assert cfg["feature_dim"] == H and cfg["num_frames"] == W

    model = build_model(argparse.Namespace(**cfg), cfg["feature_dim"], None)
    key = jax.random.key(6)
    recon, (means, logvars) = model.apply(variables, jnp.asarray(x), rng=key)
    _assert_close(means, means_t.numpy(), tol=1e-4)
    _assert_close(logvars, vars_t.numpy(), tol=1e-4)
    # decoder parity on the SAME latent sample our model drew, through the
    # reference's own unpool-index plumbing
    z = np.asarray(sample_latent(key, jnp.asarray(means),
                                 jnp.asarray(logvars)))
    with torch.no_grad():
        ref_recon = tm.vae_decoder(
            torch.from_numpy(z.copy()), list(indices_t)[::-1],
            list(sizes_t)[::-1]
        ).numpy()
    _assert_close(recon, ref_recon, tol=2e-4)


def test_modnet_parity_deterministic_pieces(tmp_path):
    """modulationNet's gumbel sampler hardcodes .cuda() (nnet_models.py
    :870), so the reference forward cannot run on CPU; verify the
    deterministic pieces — conv stack + permuted regressor logits and the
    classifier head — against manual torch compositions."""
    from flax import linen as fnn

    H, W, k = 9, 11, 3
    rng = np.random.default_rng(30)
    x = rng.standard_normal((B, 1, H, W)).astype(np.float32)
    tm = refm.modulationNet(H, W, (1,), (4,), k, 5, freq_num=6,
                            wind_size=W / 100.0, head_num=3,
                            num_layers_dec=2, hidden_size=16, out_size=C,
                            init_mod=False, use_gpu=False)
    tm.eval()
    with torch.no_grad():
        h = torch.from_numpy(x)
        for layer in tm.encoder.layers:
            h = tm.encoder.relu(layer(h))
        flat = h.view(-1, tm.encoder.cnn_out_dim)
        ref_logits = [r(flat).numpy() for r in tm.encoder.regressors]
        mods = torch.from_numpy(
            rng.standard_normal((B, H * 3)).astype(np.float32)
        )
        ref_cls = tm.classifier(mods).numpy()

    variables, cfg = convert_state_dict(tm.state_dict(), {})
    assert cfg["arch"] == "modnet" and cfg["head_num"] == 3
    assert cfg["feature_dim"] == H and cfg["patch_width"] == W
    assert cfg["freq_num"] == 6 and cfg["cnn_kernel"] == [k]

    p = variables["params"]
    xi = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    for i, out_ch in enumerate(cfg["cnn_out_channels"]):
        xi = fnn.relu(
            fnn.Conv(out_ch, (k, k), padding="VALID").apply(
                {"params": p["encoder"][f"conv_{i}"]}, xi
            )
        )
    flat_ours = xi.reshape(B, -1)
    for hh in range(3):
        r = p["encoder"][f"regressor_{hh}"]
        ours_logits = flat_ours @ r["kernel"] + r["bias"]
        _assert_close(ours_logits, ref_logits[hh], tol=1e-4)

    from speech_recognition_tools_tpu.models.modnet import ModnetClassifier

    cls_out = ModnetClassifier(2, 16, C).apply(
        {"params": p["classifier"]}, jnp.asarray(np.asarray(mods))
    )
    _assert_close(cls_out, ref_cls)


def test_modnet_sigmoid_full_parity():
    """The sigmoid variant is fully deterministic on CPU — whole-forward
    parity through build_model."""
    import argparse

    from speech_recognition_tools_tpu.cli.train_am import build_model

    H, W, k = 8, 11, 3
    rng = np.random.default_rng(31)
    x = rng.standard_normal((B, 1, H, W)).astype(np.float32)
    tm = refm.modulationSigmoidNet(H, W, (1,), (4,), k, 5, freq_num=5,
                                   wind_size=W / 100.0, num_layers_dec=2,
                                   hidden_size=16, out_size=C,
                                   use_gpu=False)
    tm.eval()
    with torch.no_grad():
        ref_logits, ref_mean = tm(torch.from_numpy(x))

    variables, cfg = convert_state_dict(tm.state_dict(), {})
    assert cfg["arch"] == "modnet_sigmoid" and cfg["freq_num"] == 5
    assert cfg["input_filter_kernel"] == 5 and cfg["patch_width"] == W
    model = build_model(argparse.Namespace(**cfg), cfg["feature_dim"], C)
    logits, mean_mod = model.apply(variables, jnp.asarray(x))
    _assert_close(logits, ref_logits.numpy(), tol=1e-4)
    _assert_close(float(mean_mod), float(ref_mean), tol=1e-4)


def test_import_egs_dir(tmp_path):
    """Data migration: a reference-style egs dir (padded per-utt .pt +
    lengths.pkl + labels.pkl) converts to a native egs dir with padding
    stripped, loadable by the bucketing loader and the train CLI path."""
    import pickle

    from speech_recognition_tools_tpu.cli.import_torch_ckpt import (
        main as cli_main,
    )
    from speech_recognition_tools_tpu.io import iter_egs_batches, load_egs

    src = tmp_path / "ref_egs"
    src.mkdir()
    rng = np.random.default_rng(40)
    max_len, D_ = 16, 5
    true = {}
    lengths = {}
    labels_raw = {}
    for i, n in enumerate((16, 9, 12)):
        utt = f"utt{i}"
        f = rng.standard_normal((n, D_)).astype(np.float32)
        true[utt] = f
        padded = np.zeros((max_len, D_), np.float32)
        padded[:n] = f
        torch.save(torch.from_numpy(padded), src / f"{utt}.pt")
        lengths[f"{utt}.pt"] = n
        lab = rng.integers(0, 7, size=n)
        true[utt + "_lab"] = lab
        labels_raw[f"{utt}.pt"] = torch.from_numpy(
            np.pad(lab, (0, max_len - n))
        ).long()
    with open(src / "lengths.pkl", "wb") as f:
        pickle.dump(lengths, f)
    torch.save(labels_raw, src / "labels.pkl")

    out = tmp_path / "native_egs"
    cli_main([str(src), str(out), "--egs"])

    cfg, utts = load_egs(str(out))
    assert cfg.num_targets == 7 and cfg.feat_dim == D_
    assert len(utts) == 3
    for utt, feats, labs in utts:
        np.testing.assert_allclose(feats, true[utt], rtol=1e-6)
        np.testing.assert_array_equal(labs, true[utt + "_lab"])
    batches = list(iter_egs_batches(str(out), 2))
    assert sum(b["feats"].shape[0] for b in batches) == 3


def test_import_checkpoint_roundtrip(tmp_path):
    """Full flow: torch.save trainer dict -> import CLI path -> native
    checkpoint consumed by dump_outputs' rebuild contract."""
    x, lengths = _inputs(11)
    tm = refm.nnetRNN(D, 2, H, C, dropout=0.1)
    ref = _torch_fwd(tm, x, lengths).numpy()

    src = os.path.join(tmp_path, "ref__epoch_5.model")
    torch.save(
        {
            "epoch": 5,
            "feature_dim": D,
            "num_classes": C,
            "num_layers": 2,
            "hidden_dim": H,
            "dropout": 0.1,
            "lr": 1e-3,
            "ep_loss_tr": [1.0],
            "ep_loss_dev": [1.2],
            "err_p": 1.2,
            "model_state_dict": tm.state_dict(),
            "optimizer_state_dict": {},
        },
        src,
    )

    dest = os.path.join(tmp_path, "imported")
    from speech_recognition_tools_tpu.cli.import_torch_ckpt import main as cli_main

    cli_main([src, dest, "--tag", "final"])
    ckpt_path = os.path.join(dest, "final")
    assert os.path.isdir(ckpt_path)
    assert import_torch_checkpoint is not None  # library API re-exported

    from speech_recognition_tools_tpu.cli.dump_outputs import (
        arch_init,
        load_model_from_checkpoint,
    )
    from speech_recognition_tools_tpu.train import load_checkpoint

    model, path, cfg = load_model_from_checkpoint(dest)
    assert cfg["dropout"] == 0.1 and cfg["torch_epoch"] == 5
    template = arch_init(
        model, cfg, {"params": jax.random.key(0)}, jnp.asarray(x),
        jnp.asarray(lengths),
    )
    payload, _ = load_checkpoint(path, template={"params": template})
    out = model.apply(payload["params"], jnp.asarray(x), jnp.asarray(lengths))
    _assert_close(_valid(out, lengths), _valid(ref, lengths))
