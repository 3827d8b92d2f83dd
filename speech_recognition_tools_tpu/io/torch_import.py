"""Import reference PyTorch checkpoints into native flax checkpoints.

The reference saves self-describing torch dicts — constructor hyperparams +
``model_state_dict`` (train_rnn_nnet_classifier.py:273-288) — and its
inference scripts rebuild models from the file alone
(extract_posterior.py:30-36). This module gives users of the reference a
migration path: it maps those trained tensors onto the flax param trees of
the equivalent models here (models/recurrent.py, models/vae.py) and emits a
native self-describing checkpoint (train/checkpoint.py) that every CLI
(dump_outputs, adapt_am, pm_score, lifelong_decode) can consume.

Exactness notes:
  * torch ``nn.GRU`` and ``flax.linen.GRUCell`` share the same gate algebra
    (r, z, n with h' = (1-z)*n + z*h). torch stacks the gates as (r|z|n)
    blocks in ``weight_ih_l0`` [3H, D] / ``weight_hh_l0`` [3H, H] and keeps
    two bias vectors; flax keeps per-gate Dense kernels [D, H] and folds the
    r/z biases (they add *outside* the nonlinearity, so
    ``b = b_ih + b_hh`` is exact) while the n-gate keeps ``b_in`` on the
    input path and ``b_hn`` inside the ``r *`` term — exactly torch's
    placement. The mapping is bit-exact up to float association.
  * The reference's 1x1 ``Conv1d`` output/regression/bottleneck layers
    [out, in, 1] map to Dense kernels ``w[:, :, 0].T``; ``nn.Linear``
    [out, in] maps to ``w.T``.
  * Padded-frame semantics differ benignly: torch's pack/pad machinery
    zero-fills past each length, our masked scans freeze the carry and zero
    the outputs — identical on valid frames (golden-tested in
    tests/test_torch_import.py).

Dropped tensors: the reference ``VAEDecoder`` registers a ``vars`` conv it
never uses in ``forward`` (nnet_models.py:357, only ``means`` is applied);
it is discarded with a note.

Model family is *detected from the state_dict key structure* (the reference
checkpoint does not record the class name — each of its 23 trainers implies
one), so one importer covers every family below:

  nnetFeedforward              -> FeedforwardClassifier   (arch=feedforward)
  nnetLinearWithConv           -> LinearConvStack         (arch=linear)
  nnetRNN                      -> RNNClassifier           (arch=rnn)
  nnetAEClassifierMultitask    -> AEClassifierMultitask   (arch=multitask_ae)
  nnetAEClassifierMultitaskAEAR-> AEClassifierMultitaskAEAR (multitask_aear)
  nnetVAE (recurrent)          -> VAE                     (arch=vae)
  nnetVAEClassifier            -> VAEClassifier           (arch=vae_classifier)
  nnetARVAE                    -> ARVAE                   (arch=arvae)
  nnetCurlMultistreamClassifier-> CurlMultistreamClassifier (arch=curl)
  nnetCurlSupervised           -> CurlSupervised          (arch=curl_unsup)
"""

from __future__ import annotations

import re

import numpy as np


class UnsupportedTorchModel(ValueError):
    pass


def _np(t) -> np.ndarray:
    arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
    return arr.astype(np.float32)


# ---------------------------------------------------------------- low level


def gru_cell_from_torch(sd: dict, prefix: str) -> dict:
    """torch nn.GRU (single layer) -> flax GRUCell param dict.

    torch gate stacking order is (reset | update | new) per the torch docs;
    flax GRUCell submodules are ir/iz/in (input path, with bias) and
    hr/hz/hn (hidden path, bias only on hn).
    """
    w_ih = _np(sd[prefix + "weight_ih_l0"])  # (3H, D)
    w_hh = _np(sd[prefix + "weight_hh_l0"])  # (3H, H)
    b_ih = _np(sd[prefix + "bias_ih_l0"])  # (3H,)
    b_hh = _np(sd[prefix + "bias_hh_l0"])  # (3H,)
    H = w_hh.shape[1]
    wr, wz, wn = w_ih[:H], w_ih[H : 2 * H], w_ih[2 * H :]
    ur, uz, un = w_hh[:H], w_hh[H : 2 * H], w_hh[2 * H :]
    return {
        "ir": {"kernel": wr.T, "bias": b_ih[:H] + b_hh[:H]},
        "iz": {"kernel": wz.T, "bias": b_ih[H : 2 * H] + b_hh[H : 2 * H]},
        "in": {"kernel": wn.T, "bias": b_ih[2 * H :]},
        "hr": {"kernel": ur.T},
        "hz": {"kernel": uz.T},
        "hn": {"kernel": un.T, "bias": b_hh[2 * H :]},
    }


def _count_layers(sd: dict, prefix: str, pattern: str) -> int:
    rx = re.compile(re.escape(prefix) + pattern)
    idx = {int(m.group(1)) for k in sd if (m := rx.fullmatch(k))}
    if not idx or idx != set(range(len(idx))):
        raise UnsupportedTorchModel(
            f"non-contiguous or empty layer list under {prefix!r}"
        )
    return len(idx)


def gru_stack_from_torch(sd: dict, prefix: str) -> tuple[dict, int, int]:
    """torch ModuleList-of-GRUs (`<prefix>layers.N.*`) -> GRUStack params.

    Returns (params, num_layers, hidden_size).
    """
    n = _count_layers(sd, prefix, r"layers\.(\d+)\.weight_ih_l0")
    params = {
        f"gru_{i}": {"cell": gru_cell_from_torch(sd, f"{prefix}layers.{i}.")}
        for i in range(n)
    }
    hidden = _np(sd[f"{prefix}layers.0.weight_hh_l0"]).shape[1]
    return params, n, hidden


def dense_from_linear(sd: dict, prefix: str) -> dict:
    w = _np(sd[prefix + "weight"])  # (out, in)
    return {"kernel": w.T, "bias": _np(sd[prefix + "bias"])}


def dense_from_conv1x1(sd: dict, prefix: str) -> dict:
    w = _np(sd[prefix + "weight"])  # (out, in, 1)
    if w.ndim != 3 or w.shape[-1] != 1:
        raise UnsupportedTorchModel(
            f"{prefix}weight has shape {w.shape}, expected (out, in, 1)"
        )
    return {"kernel": w[:, :, 0].T, "bias": _np(sd[prefix + "bias"])}


# ------------------------------------------------------- composite modules


def _encoder_rnn(sd: dict, prefix: str) -> tuple[dict, dict]:
    """reference encoderRNN -> our EncoderRNN tree. Returns (params, dims)."""
    stack, n, hidden = gru_stack_from_torch(sd, prefix)
    bottleneck = dense_from_conv1x1(sd, prefix + "bottleneck.")
    dims = {
        "num_layers": n,
        "hidden": hidden,
        "bn": bottleneck["bias"].shape[0],
        "input": _np(sd[prefix + "layers.0.weight_ih_l0"]).shape[1],
    }
    return {"GRUStack_0": stack, "bottleneck": bottleneck}, dims


def _decoder_rnn(sd: dict, prefix: str) -> tuple[dict, dict]:
    """reference decoderRNN -> our DecoderRNN tree."""
    stack, n, hidden = gru_stack_from_torch(sd, prefix)
    regression = dense_from_conv1x1(sd, prefix + "regression.")
    dims = {
        "num_layers": n,
        "hidden": hidden,
        "out": regression["bias"].shape[0],
    }
    return {"GRUStack_0": stack, "regression": regression}, dims


def _vae_encoder(sd: dict, prefix: str) -> tuple[dict, dict]:
    stack, n, hidden = gru_stack_from_torch(sd, prefix)
    means = dense_from_conv1x1(sd, prefix + "means.")
    logvars = dense_from_conv1x1(sd, prefix + "vars.")
    dims = {
        "num_layers": n,
        "hidden": hidden,
        "bn": means["bias"].shape[0],
        "input": _np(sd[prefix + "layers.0.weight_ih_l0"]).shape[1],
    }
    return {"GRUStack_0": stack, "means": means, "vars": logvars}, dims


def _vae_decoder(sd: dict, prefix: str) -> tuple[dict, dict]:
    # the reference VAEDecoder's `vars` conv is dead (never applied in
    # forward, nnet_models.py:357-369) — dropped here.
    stack, n, hidden = gru_stack_from_torch(sd, prefix)
    means = dense_from_conv1x1(sd, prefix + "means.")
    dims = {"num_layers": n, "hidden": hidden, "out": means["bias"].shape[0]}
    return {"GRUStack_0": stack, "means": means}, dims


# ----------------------------------------------------- family detect + map


def detect_family(sd: dict) -> str:
    keys = set(sd)
    tops = {k.split(".", 1)[0] for k in keys}
    if "vae_model" in tops:
        return "vae_encoded"
    if "curl_model" in tops:
        return "curl_encoded"
    if {"curl_encoder", "classifier"} <= tops:
        return "curl"
    if {"curl_encoder", "curl_decoder"} <= tops:
        return "curl_unsup"
    if {"encoder", "classifier", "ae", "ar"} <= tops:
        return "multitask_aear"
    if {"encoder", "classifier", "ae"} <= tops:
        return "multitask_ae"
    if {"vae_encoder", "vae_decoder", "classifier"} <= tops:
        return "vae_classifier"
    if {"vae_encoder", "vae_decoder"} <= tops:
        # nnetARVAE stores a ModuleList: vae_decoder.0.layers...
        if any(re.match(r"vae_decoder\.\d+\.", k) for k in keys):
            return "arvae"
        return "vae"
    if "regression.weight" in keys and any(
        re.match(r"layers\.\d+\.weight_ih_l0", k) for k in keys
    ):
        return "rnn"
    if any(re.match(r"layers\.\d+\.weight", k) for k in keys):
        w0 = _np(sd["layers.0.weight"])
        return "feedforward" if w0.ndim == 2 else "linear"
    raise UnsupportedTorchModel(
        f"unrecognised state_dict structure (top-level modules: {sorted(tops)})"
    )


def _convert_rnn(sd: dict, hyper: dict) -> tuple[dict, dict]:
    stack, n, hidden = gru_stack_from_torch(sd, "")
    regression = dense_from_conv1x1(sd, "regression.")
    params = {"GRUStack_0": stack, "regression": regression}
    cfg = {
        "arch": "rnn",
        "model_class": "RNNClassifier",
        "num_layers": n,
        "hidden_dim": hidden,
        "num_classes": regression["bias"].shape[0],
        "feature_dim": _np(sd["layers.0.weight_ih_l0"]).shape[1],
        "dropout": float(hyper.get("dropout", 0.0)),
    }
    return params, cfg


def _convert_feedforward(sd: dict, hyper: dict) -> tuple[dict, dict]:
    n_total = _count_layers(sd, "", r"layers\.(\d+)\.weight")
    hidden_n = n_total - 1
    params = {
        f"dense_{i}": dense_from_linear(sd, f"layers.{i}.")
        for i in range(hidden_n)
    }
    params["out"] = dense_from_linear(sd, f"layers.{hidden_n}.")
    cfg = {
        "arch": "feedforward",
        "model_class": "FeedforwardClassifier",
        "num_layers": hidden_n,
        "hidden_dim": params["dense_0"]["bias"].shape[0],
        "num_classes": params["out"]["bias"].shape[0],
        "feature_dim": params["dense_0"]["kernel"].shape[0],
    }
    return params, cfg


def _convert_linear(sd: dict, hyper: dict) -> tuple[dict, dict]:
    n_total = _count_layers(sd, "", r"layers\.(\d+)\.weight")
    params = {
        f"dense_{i}": dense_from_conv1x1(sd, f"layers.{i}.")
        for i in range(n_total - 1)
    }
    params["out"] = dense_from_conv1x1(sd, f"layers.{n_total - 1}.")
    first = params.get("dense_0", params["out"])
    cfg = {
        "arch": "linear",
        "model_class": "LinearConvStack",
        "num_layers": n_total,
        "hidden_dim": first["bias"].shape[0],
        "num_classes": params["out"]["bias"].shape[0],
        "feature_dim": first["kernel"].shape[0],
    }
    return params, cfg


def _convert_multitask(sd: dict, hyper: dict, with_ar: bool) -> tuple[dict, dict]:
    enc, enc_d = _encoder_rnn(sd, "encoder.")
    cls, cls_d = _decoder_rnn(sd, "classifier.")
    ae, ae_d = _decoder_rnn(sd, "ae.")
    if cls_d["num_layers"] != ae_d["num_layers"]:
        raise UnsupportedTorchModel(
            "classifier and AE decoder depths differ "
            f"({cls_d['num_layers']} vs {ae_d['num_layers']}); the native "
            "CLI config ties them (--num_layers_dec). Build the model "
            "directly from models.recurrent if you need asymmetric depths."
        )
    params = {"encoder": enc, "classifier": cls, "ae": ae}
    cfg = {
        "arch": "multitask_aear" if with_ar else "multitask_ae",
        "model_class": (
            "AEClassifierMultitaskAEAR" if with_ar else "AEClassifierMultitask"
        ),
        "num_layers": enc_d["num_layers"],
        "num_layers_dec": cls_d["num_layers"],
        "hidden_dim": enc_d["hidden"],
        "bn_dim": enc_d["bn"],
        "num_classes": cls_d["out"],
        "feature_dim": enc_d["input"],
        "dropout": float(hyper.get("dropout", 0.0)),
    }
    if with_ar:
        ar, _ = _decoder_rnn(sd, "ar.")
        params["ar"] = ar
        cfg["time_shift"] = int(hyper.get("time_shift", 1))
    return params, cfg


def _convert_vae(sd: dict, hyper: dict) -> tuple[dict, dict]:
    enc, enc_d = _vae_encoder(sd, "vae_encoder.")
    dec, dec_d = _vae_decoder(sd, "vae_decoder.")
    params = {"encoder": enc, "decoder": dec}
    cfg = {
        "arch": "vae",
        "model_class": "VAE",
        "num_layers": enc_d["num_layers"],
        "num_layers_dec": dec_d["num_layers"],
        "hidden_dim": enc_d["hidden"],
        "bn_dim": enc_d["bn"],
        "feature_dim": enc_d["input"],
        "num_classes": None,
        "dropout": float(hyper.get("dropout", 0.0)),
        "only_ae": bool(hyper.get("only_AE", hyper.get("only_ae", False))),
        "use_transformer": False,
    }
    return params, cfg


def _convert_vae_classifier(sd: dict, hyper: dict) -> tuple[dict, dict]:
    enc, enc_d = _vae_encoder(sd, "vae_encoder.")
    dec, dec_d = _vae_decoder(sd, "vae_decoder.")
    cls, cls_d = _decoder_rnn(sd, "classifier.")
    params = {"vae_encoder": enc, "vae_decoder": dec, "classifier": cls}
    if cls_d["num_layers"] != dec_d["num_layers"]:
        raise UnsupportedTorchModel(
            "classifier and VAE decoder depths differ; the native CLI "
            "config ties them (--num_layers_dec)."
        )
    cfg = {
        "arch": "vae_classifier",
        "model_class": "VAEClassifier",
        "num_layers": enc_d["num_layers"],
        "num_layers_dec": cls_d["num_layers"],
        "hidden_dim": enc_d["hidden"],
        "bn_dim": enc_d["bn"],
        "num_classes": cls_d["out"],
        "feature_dim": enc_d["input"],
        "dropout": float(hyper.get("dropout", 0.0)),
    }
    return params, cfg


def _convert_arvae(sd: dict, hyper: dict) -> tuple[dict, dict]:
    enc, enc_d = _vae_encoder(sd, "vae_encoder.")
    num_outs = _count_layers(sd, "", r"vae_decoder\.(\d+)\.layers\.0\.weight_ih_l0")
    params: dict = {"vae_encoder": enc}
    dec_d = None
    for i in range(num_outs):
        dec, dec_d = _vae_decoder(sd, f"vae_decoder.{i}.")
        params[f"decoder_{i}"] = dec
    cfg = {
        "arch": "arvae",
        "model_class": "ARVAE",
        "num_layers": enc_d["num_layers"],
        "num_layers_dec": dec_d["num_layers"],
        "hidden_dim": enc_d["hidden"],
        "bn_dim": enc_d["bn"],
        "num_classes": None,
        "feature_dim": enc_d["input"],
        # build_model maps time_shift -> num_outs (cli/train_am.py arvae)
        "time_shift": num_outs,
        "dropout": float(hyper.get("dropout", 0.0)),
    }
    return params, cfg


def _curl_encoder(sd: dict, prefix: str) -> tuple[dict, dict]:
    """reference curlEncoder -> our CurlEncoder tree. The reference keeps
    comp_num separate mean/var Linears (nnet_models.py:548-556); ours is one
    Dense with K*bn outputs reshaped to (K, bn) — concatenate the per-
    component weights along the output axis (identical math, one matmul)."""
    stack, n, hidden = gru_stack_from_torch(sd, prefix)
    comp_num = _count_layers(sd, prefix, r"means\.(\d+)\.weight")
    mean_heads = [
        dense_from_linear(sd, f"{prefix}means.{k}.") for k in range(comp_num)
    ]
    var_heads = [
        dense_from_linear(sd, f"{prefix}var.{k}.") for k in range(comp_num)
    ]
    means = {
        "kernel": np.concatenate([h["kernel"] for h in mean_heads], axis=1),
        "bias": np.concatenate([h["bias"] for h in mean_heads]),
    }
    logvars = {
        "kernel": np.concatenate([h["kernel"] for h in var_heads], axis=1),
        "bias": np.concatenate([h["bias"] for h in var_heads]),
    }
    cat = dense_from_linear(sd, prefix + "categorical.")
    dims = {
        "num_layers": n,
        "hidden": hidden,
        "bn": mean_heads[0]["bias"].shape[0],
        "comp_num": comp_num,
        "input": _np(sd[prefix + "layers.0.weight_ih_l0"]).shape[1],
    }
    params = {
        "GRUStack_0": stack,
        "means": means,
        "vars": logvars,
        "categorical": cat,
    }
    return params, dims


def _convert_curl(sd: dict, hyper: dict) -> tuple[dict, dict]:
    """nnetCurlMultistreamClassifier -> CurlMultistreamClassifier."""
    enc, enc_d = _curl_encoder(sd, "curl_encoder.")
    K = enc_d["comp_num"]
    params: dict = {"curl_encoder": enc}
    cls_d = dec_d = None
    streams = {}
    for k in range(K):
        cls, cls_d = _decoder_rnn(sd, f"classifier.{k}.")
        params[f"classifier_{k}"] = cls
        # curlDecoderMultistream: double-indexed ModuleList layers.{k}.{i}
        # + means.{k} (nnet_models.py:602-630); our stream_k is a DecoderRNN
        n_dec = _count_layers(
            sd, f"curl_decoder.layers.{k}.", r"(\d+)\.weight_ih_l0"
        )
        stack = {
            f"gru_{i}": {
                "cell": gru_cell_from_torch(sd, f"curl_decoder.layers.{k}.{i}.")
            }
            for i in range(n_dec)
        }
        streams[f"stream_{k}"] = {
            "GRUStack_0": stack,
            "regression": dense_from_linear(sd, f"curl_decoder.means.{k}."),
        }
        dec_d = {"num_layers": n_dec}
    params["curl_decoder"] = streams
    if cls_d["num_layers"] != dec_d["num_layers"]:
        raise UnsupportedTorchModel(
            "classifier and decoder-stream depths differ; the native CLI "
            "config ties them (--num_layers_dec)."
        )
    cls_hidden = _np(sd["classifier.0.layers.0.weight_hh_l0"]).shape[1]
    if cls_hidden != enc_d["hidden"]:
        raise UnsupportedTorchModel(
            f"hidden_size_classifier ({cls_hidden}) != hidden_size "
            f"({enc_d['hidden']}); the native CLI config ties them "
            "(--hidden_dim). Build CurlMultistreamClassifier directly for "
            "asymmetric widths."
        )
    cfg = {
        "arch": "curl",
        "model_class": "CurlMultistreamClassifier",
        "num_layers": enc_d["num_layers"],
        "num_layers_dec": dec_d["num_layers"],
        "hidden_dim": enc_d["hidden"],
        "bn_dim": enc_d["bn"],
        "comp_num": K,
        "num_classes": cls_d["out"],
        "feature_dim": enc_d["input"],
        "dropout": float(hyper.get("dropout", 0.0)),
    }
    return params, cfg


def _convert_curl_unsup(sd: dict, hyper: dict) -> tuple[dict, dict]:
    """nnetCurlSupervised (CURL AE; one shared decoder) -> CurlSupervised."""
    enc, enc_d = _curl_encoder(sd, "curl_encoder.")
    stack, n_dec, _ = gru_stack_from_torch(sd, "curl_decoder.")
    decoder = {
        "DecoderRNN_0": {
            "GRUStack_0": stack,
            "regression": dense_from_linear(sd, "curl_decoder.means."),
        }
    }
    params = {"curl_encoder": enc, "curl_decoder": decoder}
    cfg = {
        "arch": "curl_unsup",
        "model_class": "CurlSupervised",
        "num_layers": enc_d["num_layers"],
        "num_layers_dec": n_dec,
        "hidden_dim": enc_d["hidden"],
        "bn_dim": enc_d["bn"],
        "comp_num": enc_d["comp_num"],
        "num_classes": None,
        "feature_dim": enc_d["input"],
        "dropout": float(hyper.get("dropout", 0.0)),
    }
    return params, cfg


_CONVERTERS = {
    "curl": _convert_curl,
    "curl_unsup": _convert_curl_unsup,
    "rnn": _convert_rnn,
    "feedforward": _convert_feedforward,
    "linear": _convert_linear,
    "multitask_ae": lambda sd, h: _convert_multitask(sd, h, with_ar=False),
    "multitask_aear": lambda sd, h: _convert_multitask(sd, h, with_ar=True),
    "vae": _convert_vae,
    "vae_classifier": _convert_vae_classifier,
    "arvae": _convert_arvae,
}


def convert_encoded_classifier(
    sd: dict, hyper: dict | None = None
) -> tuple[dict, dict, dict, dict]:
    """reference {VAE,curl}EncodedClassifier -> (head_vars, head_cfg,
    base_vars, base_cfg).

    The reference embeds the frozen generative model inside the classifier
    checkpoint (nnet_models.py:488-534 `self.vae_model` / `self.curl_model`);
    the native design keeps them as two checkpoints wired by the head
    config's `base_model` path (cli/train_am.py --base_model,
    cli/dump_outputs.py load_frozen_encoder). import_torch_checkpoint
    writes both and fills `base_model` in.
    """
    hyper = dict(hyper or {})
    family = detect_family(sd)
    if family not in ("vae_encoded", "curl_encoded"):
        raise UnsupportedTorchModel(f"not an encoded classifier: {family}")
    base_prefix = "vae_model." if family == "vae_encoded" else "curl_model."
    base_sd = {
        k[len(base_prefix):]: v for k, v in sd.items()
        if k.startswith(base_prefix)
    }
    head_sd = {k: v for k, v in sd.items() if not k.startswith(base_prefix)}
    base_vars, base_cfg = convert_state_dict(base_sd, hyper)
    if family == "curl_encoded" and base_cfg["arch"] != "curl_unsup":
        raise UnsupportedTorchModel(
            "curlEncodedClassifier expects an nnetCurlSupervised base "
            f"(forward unpacks a 2-tuple); found {base_cfg['arch']}"
        )
    lin_params, lin_cfg = _convert_linear(head_sd, hyper)
    head_vars = {"params": {"head": lin_params}}
    head_cfg = _finalize_cfg(
        {
            "arch": family,
            "model_class": (
                "VAEEncodedClassifier" if family == "vae_encoded"
                else "CurlEncodedClassifier"
            ),
            "num_layers": lin_cfg["num_layers"],
            "hidden_dim": lin_cfg["hidden_dim"],
            "num_classes": lin_cfg["num_classes"],
            # the pipeline feature dim is the *base* model's input dim (the
            # head sees latents; build_model takes no feat dim for these)
            "feature_dim": base_cfg["feature_dim"],
        },
        hyper,
    )
    return head_vars, head_cfg, base_vars, base_cfg


def convert_state_dict(sd: dict, hyper: dict | None = None) -> tuple[dict, dict]:
    """Map a reference state_dict -> (variables, config) where `variables`
    is the flax `{'params': tree}` dict `model.apply` takes (and the exact
    pytree the native checkpoints store — train_am saves `model.init(...)`
    output wholesale).

    `hyper` is the rest of the reference checkpoint dict (dropout,
    time_shift, only_AE, ... — anything not derivable from tensor shapes).
    """
    hyper = dict(hyper or {})
    family = detect_family(sd)
    if family in ("vae_encoded", "curl_encoded"):
        raise UnsupportedTorchModel(
            f"{family} embeds a frozen generative model; use "
            "convert_encoded_classifier / import_torch_checkpoint (which "
            "writes base + head checkpoints)"
        )
    params, cfg = _CONVERTERS[family](sd, hyper)
    _finalize_cfg(cfg, hyper)
    return {"params": params}, cfg


def _finalize_cfg(cfg: dict, hyper: dict) -> dict:
    """Defaults every native CLI expects to find in a checkpoint config."""
    cfg.setdefault("num_layers_dec", 1)
    cfg.setdefault("bn_dim", 0)
    cfg.setdefault("dropout", float(hyper.get("dropout", 0.0)))
    cfg.setdefault("comp_num", 2)
    cfg.setdefault("time_shift", 0)
    cfg.setdefault("only_ae", False)
    cfg.setdefault("use_transformer", False)
    cfg.setdefault("expert_parallel", 1)
    cfg["imported_from"] = "torch"
    for key in ("epoch", "lr", "err_p", "num_frames"):
        if key in hyper:
            cfg[f"torch_{key}"] = _scalar(hyper[key])
    return cfg


def _scalar(v):
    try:
        return v.item() if hasattr(v, "item") else v
    except Exception:
        return str(v)


def load_torch_checkpoint(path: str) -> tuple[dict, dict]:
    """torch.load a reference .model file -> (state_dict, hyperparams)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        sd = blob["model_state_dict"]
        hyper = {k: v for k, v in blob.items() if k != "model_state_dict"}
        hyper.pop("optimizer_state_dict", None)
    elif isinstance(blob, dict):
        sd, hyper = blob, {}
    else:  # a pickled nn.Module
        sd, hyper = blob.state_dict(), {}
    return sd, hyper


def import_torch_checkpoint(src: str, dest_dir: str, tag: str = "final") -> str:
    """Convert a reference .model file into a native checkpoint directory.

    The result is loadable by every native CLI that rebuilds models from
    checkpoints (cli/dump_outputs.py load_model_from_checkpoint).
    """
    sd, hyper = load_torch_checkpoint(src)
    return import_state_dict(sd, hyper, dest_dir, tag=tag, src=src)


def import_state_dict(
    sd: dict, hyper: dict, dest_dir: str, tag: str = "final",
    src: str = "<state_dict>",
) -> str:
    """Convert an already-loaded reference state_dict (see
    load_torch_checkpoint) into a native checkpoint directory."""
    import os

    from speech_recognition_tools_tpu.train.checkpoint import save_checkpoint

    family = detect_family(sd)
    if family in ("vae_encoded", "curl_encoded"):
        # two checkpoints: the frozen generative base + the classifier head
        # wired to it via the head config's base_model path
        head_vars, head_cfg, base_vars, base_cfg = convert_encoded_classifier(
            sd, hyper
        )
        base_dir = os.path.join(dest_dir, "base")
        save_checkpoint(
            base_dir, tag, base_vars, base_cfg, extra={"imported_from": src}
        )
        head_cfg["base_model"] = base_dir
        return save_checkpoint(
            dest_dir, tag, head_vars, head_cfg, extra={"imported_from": src}
        )
    variables, cfg = convert_state_dict(sd, hyper)
    # native checkpoints store the full flax variables dict (train_am saves
    # model.init(...) output wholesale), so save `variables`, not the inner
    # param tree
    return save_checkpoint(
        dest_dir, tag, variables, cfg,
        extra={"imported_from": src},
    )
