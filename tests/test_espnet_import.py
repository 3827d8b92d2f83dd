"""ESPnet e2e transformer checkpoint import (io/torch_import.py
convert_espnet_e2e / import_espnet_model).

ESPnet itself is not installed here (the reference treats it as an
external tool: /root/reference/e2e/wsj/path.sh:10), so the golden oracle
is a torch RECONSTRUCTION of espnet.nets.pytorch_backend.transformer's
conv2d-input E2E forward, with state_dict key names matching ESPnet's
exactly (encoder.embed.conv.{0,2}, encoder.encoders.N.self_attn.
linear_{q,k,v,out}, feed_forward.w_{1,2}, norm{1,2,3}, after_norm,
ctc.ctc_lo, decoder.embed.0, decoder.output_layer). This validates the
WEIGHT MAPPING — head packing, conv NCHW->HWIO transposes, the
channel-major vs freq-major embed-Linear permutation — which is where
import bugs live; the architectural equivalence of TransformerASR itself
(pre-norm blocks, VALID subsampling, xscale posenc) is pinned by
tests/test_transformer_asr.py.
"""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
tnn = torch.nn

from speech_recognition_tools_tpu.io.torch_import import (  # noqa: E402
    convert_espnet_e2e,
    detect_family,
    espnet_vocab_from_units,
)
from speech_recognition_tools_tpu.models.transformer_asr import (  # noqa: E402
    TransformerASR,
    TransformerASRConfig,
)

ADIM, AHEADS, EU, DU, ELAYERS, DLAYERS, ODIM, D_FEAT = 16, 2, 24, 20, 2, 2, 11, 19
RS = np.random.RandomState(0)


# ---------------------------------------------------------------- oracle
# (reconstruction of espnet/nets/pytorch_backend/transformer modules)


class _MHA(tnn.Module):
    def __init__(self, h, adim):
        super().__init__()
        self.h, self.dk = h, adim // h
        self.linear_q = tnn.Linear(adim, adim)
        self.linear_k = tnn.Linear(adim, adim)
        self.linear_v = tnn.Linear(adim, adim)
        self.linear_out = tnn.Linear(adim, adim)

    def forward(self, q, k, v, mask=None):
        B = q.size(0)
        q = self.linear_q(q).view(B, -1, self.h, self.dk).transpose(1, 2)
        k = self.linear_k(k).view(B, -1, self.h, self.dk).transpose(1, 2)
        v = self.linear_v(v).view(B, -1, self.h, self.dk).transpose(1, 2)
        scores = q @ k.transpose(-2, -1) / math.sqrt(self.dk)
        if mask is not None:
            scores = scores.masked_fill(~mask, float("-inf"))
        att = torch.softmax(scores, dim=-1)
        x = (att @ v).transpose(1, 2).reshape(B, -1, self.h * self.dk)
        return self.linear_out(x)


class _FF(tnn.Module):
    def __init__(self, adim, units):
        super().__init__()
        self.w_1 = tnn.Linear(adim, units)
        self.w_2 = tnn.Linear(units, adim)

    def forward(self, x):
        return self.w_2(torch.relu(self.w_1(x)))


class _EncLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = _MHA(AHEADS, ADIM)
        self.feed_forward = _FF(ADIM, EU)
        self.norm1 = tnn.LayerNorm(ADIM)
        self.norm2 = tnn.LayerNorm(ADIM)

    def forward(self, x):
        h = self.norm1(x)
        x = x + self.self_attn(h, h, h)
        return x + self.feed_forward(self.norm2(x))


class _DecLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = _MHA(AHEADS, ADIM)
        self.src_attn = _MHA(AHEADS, ADIM)
        self.feed_forward = _FF(ADIM, DU)
        self.norm1 = tnn.LayerNorm(ADIM)
        self.norm2 = tnn.LayerNorm(ADIM)
        self.norm3 = tnn.LayerNorm(ADIM)

    def forward(self, x, mem, causal):
        h = self.norm1(x)
        x = x + self.self_attn(h, h, h, mask=causal)
        h = self.norm2(x)
        x = x + self.src_attn(h, mem, mem)
        return x + self.feed_forward(self.norm3(x))


def _pe(n):
    pos = np.arange(n)[:, None]
    div = np.exp(np.arange(0, ADIM, 2) * (-np.log(10000.0) / ADIM))
    pe = np.zeros((n, ADIM), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return torch.from_numpy(pe)


class _Embed(tnn.Module):
    """espnet Conv2dSubsampling: NCHW convs then .view(b, t, c*f)."""

    def __init__(self):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv2d(1, ADIM, 3, 2), tnn.ReLU(),
            tnn.Conv2d(ADIM, ADIM, 3, 2), tnn.ReLU(),
        )
        fprime = (((D_FEAT - 1) // 2 - 1) // 2)
        self.out = tnn.Sequential(tnn.Linear(ADIM * fprime, ADIM))

    def forward(self, x):
        x = self.conv(x.unsqueeze(1))
        b, c, t, f = x.size()
        x = self.out(x.transpose(1, 2).contiguous().view(b, t, c * f))
        return x * math.sqrt(ADIM) + _pe(t)[None]


class _Encoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.embed = _Embed()
        self.encoders = tnn.ModuleList([_EncLayer() for _ in range(ELAYERS)])
        self.after_norm = tnn.LayerNorm(ADIM)

    def forward(self, x):
        x = self.embed(x)
        for lyr in self.encoders:
            x = lyr(x)
        return self.after_norm(x)


class _Decoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.embed = tnn.Sequential(tnn.Embedding(ODIM, ADIM))
        self.decoders = tnn.ModuleList([_DecLayer() for _ in range(DLAYERS)])
        self.after_norm = tnn.LayerNorm(ADIM)
        self.output_layer = tnn.Linear(ADIM, ODIM)

    def forward(self, tokens, mem):
        x = self.embed(tokens) * math.sqrt(ADIM) + _pe(tokens.size(1))[None]
        U = tokens.size(1)
        causal = torch.tril(torch.ones(U, U, dtype=torch.bool))[None, None]
        for lyr in self.decoders:
            x = lyr(x, mem, causal)
        return self.output_layer(self.after_norm(x))


class _CTC(tnn.Module):
    def __init__(self):
        super().__init__()
        self.ctc_lo = tnn.Linear(ADIM, ODIM)


class _E2E(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = _Encoder()
        self.decoder = _Decoder()
        self.ctc = _CTC()


def _build_native(sd):
    variables, cfg_d = convert_espnet_e2e(sd, AHEADS)
    cfg = TransformerASRConfig(
        vocab_size=cfg_d["vocab_size"], adim=cfg_d["adim"],
        aheads=cfg_d["aheads"], elayers=cfg_d["elayers"],
        eunits=cfg_d["eunits"], dlayers=cfg_d["dlayers"],
        dunits=cfg_d["dunits"], dropout=0.0,
    )
    model = TransformerASR(cfg)
    # structural check: the converted tree must match model.init exactly
    template = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 16, D_FEAT), jnp.float32), jnp.asarray([16]),
        jnp.zeros((1, 4), jnp.int32),
    )
    t_paths = {"/".join(str(k.key) for k in p)
               for p, _ in jax.tree_util.tree_flatten_with_path(template)[0]}
    v_paths = {"/".join(str(k.key) for k in p)
               for p, _ in jax.tree_util.tree_flatten_with_path(
                   jax.tree.map(jnp.asarray, variables))[0]}
    assert t_paths == v_paths, (t_paths ^ v_paths)
    for p, leaf in jax.tree_util.tree_flatten_with_path(template)[0]:
        got = variables
        for k in p:
            got = got[k.key]
        assert np.shape(got) == leaf.shape, (p, np.shape(got), leaf.shape)
    return model, jax.tree.map(jnp.asarray, variables), cfg_d


def test_espnet_e2e_forward_parity():
    torch.manual_seed(3)
    e2e = _E2E().eval()
    sd = e2e.state_dict()
    assert detect_family(sd) == "espnet_e2e"
    model, variables, cfg_d = _build_native(sd)
    assert (cfg_d["elayers"], cfg_d["dlayers"]) == (ELAYERS, DLAYERS)
    assert (cfg_d["eunits"], cfg_d["dunits"]) == (EU, DU)

    B, T, U = 2, 29, 7
    x = RS.randn(B, T, D_FEAT).astype(np.float32)
    tokens = RS.randint(0, ODIM, (B, U))
    with torch.no_grad():
        mem_t = e2e.encoder(torch.from_numpy(x)).numpy()
        ctc_t = e2e.ctc.ctc_lo(torch.from_numpy(mem_t)).numpy()
        dec_t = e2e.decoder(torch.from_numpy(tokens),
                            torch.from_numpy(mem_t)).numpy()

    lengths = jnp.full((B,), T, jnp.int32)
    mem_j, enc_len, ctc_j = model.apply(
        variables, jnp.asarray(x), lengths, method=TransformerASR.encode
    )
    assert int(enc_len[0]) == mem_t.shape[1]
    np.testing.assert_allclose(np.asarray(mem_j), mem_t, rtol=1e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ctc_j), ctc_t, rtol=1e-4,
                               atol=2e-5)
    ctc_full, dec_j, _ = model.apply(
        variables, jnp.asarray(x), lengths, jnp.asarray(tokens),
        rngs={"dropout": jax.random.key(0)},
    )
    np.testing.assert_allclose(np.asarray(dec_j), dec_t, rtol=1e-4,
                               atol=3e-5)


def test_espnet_import_cli_roundtrip(tmp_path):
    """model.acc.best + units dict -> native model dir loadable by the
    recog CLI's _load, encoder-parity vs the torch oracle; snapshots
    (dict with 'model') and DataParallel 'module.' prefixes unwrap."""
    from speech_recognition_tools_tpu.cli.import_torch_ckpt import main
    from speech_recognition_tools_tpu.cli.recog_e2e import _load

    torch.manual_seed(5)
    e2e = _E2E().eval()
    src = str(tmp_path / "model.acc.best")
    torch.save(e2e.state_dict(), src)
    units = tmp_path / "train_units.txt"
    toks = ["<unk>", "<space>"] + [chr(ord("a") + i) for i in range(ODIM - 4)]
    units.write_text(
        "".join(f"{t} {i + 1}\n" for i, t in enumerate(toks))
    )
    dest = str(tmp_path / "imported")
    main([src, dest, "--espnet_units", str(units), "--aheads", str(AHEADS)])

    model, params, cfg, vocab = _load(dest, "final_avg")
    assert vocab["<blank>"] == 0 and vocab["<sos/eos>"] == ODIM - 1
    assert cfg.aheads == AHEADS and cfg.vocab_size == ODIM
    x = RS.randn(1, 23, D_FEAT).astype(np.float32)
    with torch.no_grad():
        mem_t = e2e.encoder(torch.from_numpy(x)).numpy()
    mem_j, enc_len, _ = model.apply(
        params, jnp.asarray(x), jnp.asarray([23]),
        method=TransformerASR.encode,
    )
    np.testing.assert_allclose(np.asarray(mem_j), mem_t, rtol=1e-4,
                               atol=6e-5)

    # snapshot form + DataParallel prefixes
    snap = str(tmp_path / "snapshot.ep.3")
    torch.save({"model": {f"module.{k}": v
                          for k, v in e2e.state_dict().items()},
                "epoch": 3}, snap)
    dest2 = str(tmp_path / "imported2")
    main([snap, dest2, "--espnet_units", str(units),
          "--aheads", str(AHEADS)])
    _, params2, _, _ = _load(dest2, "final_avg")
    mem_2, _, _ = model.apply(
        params2, jnp.asarray(x), jnp.asarray([23]),
        method=TransformerASR.encode,
    )
    np.testing.assert_allclose(np.asarray(mem_2), np.asarray(mem_j))


def test_espnet_units_validation(tmp_path):
    units = tmp_path / "units.txt"
    units.write_text("a 1\nb 2\n")
    with pytest.raises(Exception, match="odim"):
        espnet_vocab_from_units(str(units), 11)
    # exact cover works
    toks = "".join(f"t{i} {i}\n" for i in range(1, 10))
    units.write_text(toks)
    v = espnet_vocab_from_units(str(units), 11)
    assert v["<blank>"] == 0 and v["<sos/eos>"] == 10 and len(v) == 11


def test_plain_import_points_to_espnet_flag(tmp_path):
    from speech_recognition_tools_tpu.cli.import_torch_ckpt import main

    torch.manual_seed(1)
    src = str(tmp_path / "model.acc.best")
    torch.save(_E2E().state_dict(), src)
    with pytest.raises(SystemExit):
        main([src, str(tmp_path / "out")])


# ------------------------------------------------------------- espnet LM
# (reconstruction of espnet/nets/pytorch_backend/lm/default.py RNNLM —
# ClassifierWithState prefixes everything with 'predictor.')


class _EspnetLM(tnn.Module):
    def __init__(self, n_vocab, n_embed, n_units, n_layers, typ="lstm"):
        super().__init__()
        self.typ = typ
        self.embed = tnn.Embedding(n_vocab, n_embed)
        mk = tnn.LSTMCell if typ == "lstm" else tnn.GRUCell
        self.rnn = tnn.ModuleList(
            [mk(n_embed, n_units)]
            + [mk(n_units, n_units) for _ in range(n_layers - 1)]
        )
        self.lo = tnn.Linear(n_units, n_vocab)

    def forward(self, tokens):
        B, U = tokens.shape
        emb = self.embed(tokens)
        hs = [torch.zeros(B, c.hidden_size) for c in self.rnn]
        cs = [torch.zeros(B, c.hidden_size) for c in self.rnn]
        outs = []
        for t in range(U):
            x = emb[:, t]
            for i, cell in enumerate(self.rnn):
                if self.typ == "lstm":
                    hs[i], cs[i] = cell(x, (hs[i], cs[i]))
                else:
                    hs[i] = cell(x, hs[i])
                x = hs[i]
            outs.append(self.lo(x))
        return torch.stack(outs, dim=1)


class _Classifier(tnn.Module):
    def __init__(self, predictor):
        super().__init__()
        self.predictor = predictor


@pytest.mark.parametrize("typ", ["lstm", "gru"])
def test_espnet_lm_forward_parity(typ):
    from speech_recognition_tools_tpu.io.torch_import import (
        convert_espnet_lm,
    )
    from speech_recognition_tools_tpu.models.rnnlm import RNNLM

    torch.manual_seed(7)
    lm_t = _Classifier(_EspnetLM(13, 6, 10, 2, typ=typ)).eval()
    sd = lm_t.state_dict()
    assert detect_family(sd) == "espnet_lm"
    variables, cfg = convert_espnet_lm(sd)
    assert cfg["cell"] == typ and cfg["layers"] == 2
    assert (cfg["vocab_size"], cfg["embed_dim"], cfg["hidden"]) == (13, 6, 10)
    model = RNNLM(vocab_size=13, embed_dim=6, hidden=10, layers=2, cell=typ)
    tokens = RS.randint(0, 13, (3, 9))
    with torch.no_grad():
        want = lm_t.predictor(torch.from_numpy(tokens)).numpy()
    got = model.apply(jax.tree.map(jnp.asarray, variables),
                      jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_espnet_lm_import_cli(tmp_path):
    from speech_recognition_tools_tpu.cli.import_torch_ckpt import main
    from speech_recognition_tools_tpu.cli.recog_e2e import _load_lm
    from speech_recognition_tools_tpu.models.rnnlm import make_fusion_scorer

    torch.manual_seed(9)
    lm_t = _Classifier(_EspnetLM(13, 6, 10, 1)).eval()
    src = str(tmp_path / "rnnlm.model.best")
    torch.save(lm_t.state_dict(), src)
    dest = str(tmp_path / "lm")
    main([src, dest])
    model, params = _load_lm(dest)
    score = make_fusion_scorer(model, params)
    prefix = jnp.asarray(RS.randint(0, 13, (2, 5)))
    lp = np.asarray(score(prefix))
    with torch.no_grad():
        want = torch.log_softmax(
            lm_t.predictor(torch.from_numpy(np.array(prefix)))[:, -1], -1
        ).numpy()
    np.testing.assert_allclose(lp, want, rtol=1e-4, atol=1e-5)


def test_espnet_lm_snapshot_and_units_vocab(tmp_path):
    """Regression: LM snapshots ({'model': sd, ...}) import with NO
    flags (the CLI detects through the wrapper), and passing
    --espnet_units also writes vocab.json so the dir is a full train_lm
    drop-in."""
    from speech_recognition_tools_tpu.cli.import_torch_ckpt import main

    torch.manual_seed(4)
    lm_t = _Classifier(_EspnetLM(11, 6, 10, 1)).eval()
    snap = str(tmp_path / "snapshot.ep.7")
    torch.save({"model": lm_t.state_dict(), "epoch": 7}, snap)
    dest = str(tmp_path / "lm")
    main([snap, dest])  # no flags: family detected through the wrapper
    assert os.path.exists(os.path.join(dest, "final"))
    assert not os.path.exists(os.path.join(dest, "vocab.json"))

    units = tmp_path / "units.txt"
    toks = ["<unk>", "<space>"] + [chr(ord("a") + i) for i in range(7)]
    units.write_text("".join(f"{t} {i + 1}\n" for i, t in enumerate(toks)))
    dest2 = str(tmp_path / "lm2")
    main([snap, dest2, "--espnet_units", str(units)])
    import json
    v = json.load(open(os.path.join(dest2, "vocab.json")))
    assert v["<blank>"] == 0 and v["<sos/eos>"] == 10


def test_espnet_e2e_attn_chunk_and_tag(tmp_path):
    """--attn_chunk records a decode-time chunk geometry (so the
    imported model constructs a StreamingRecognizer) and an explicit
    --tag is honored verbatim."""
    from speech_recognition_tools_tpu.cli.import_torch_ckpt import main
    from speech_recognition_tools_tpu.cli.recog_e2e import _load
    from speech_recognition_tools_tpu.infer.streaming_asr import (
        StreamingRecognizer,
    )

    torch.manual_seed(6)
    e2e = _E2E().eval()
    src = str(tmp_path / "model.acc.best")
    torch.save(e2e.state_dict(), src)
    units = tmp_path / "units.txt"
    toks = ["<unk>", "<space>"] + [chr(ord("a") + i) for i in range(ODIM - 4)]
    units.write_text("".join(f"{t} {i + 1}\n" for i, t in enumerate(toks)))
    dest = str(tmp_path / "imported")
    main([src, dest, "--espnet_units", str(units), "--aheads", str(AHEADS),
          "--attn_chunk", "4", "--attn_left_chunks", "2",
          "--tag", "final"])
    assert os.path.exists(os.path.join(dest, "final"))  # verbatim tag
    model, params, cfg, _ = _load(dest, "final")
    assert cfg.attn_chunk == 4 and cfg.attn_left_chunks == 2
    sr = StreamingRecognizer(model, params)  # constructs: chunked cfg
    sr.push(RS.randn(40, D_FEAT).astype(np.float32))
    assert sr.finish() is not None


def test_espnet_finetune_exact_streaming_recipe(tmp_path, capsys):
    """The exact-streaming migration recipe (recipes/README.md): import
    an offline ESPnet model, then `srt-train-e2e --init_from IMPORTED
    --attn_chunk N` fine-tunes it under the chunk mask it will be served
    with. Pins that --init_from (a) takes the architecture geometry +
    vocab from the imported checkpoint (the CLI geometry defaults would
    not even load the params), (b) actually warm-starts from the
    imported weights (zero-LR epoch leaves them bit-identical), and
    (c) records the CLI's chunk geometry so the result streams."""
    from speech_recognition_tools_tpu.cli import train_e2e
    from speech_recognition_tools_tpu.cli.import_torch_ckpt import main
    from speech_recognition_tools_tpu.cli.recog_e2e import _load
    from speech_recognition_tools_tpu.io import build_egs
    from speech_recognition_tools_tpu.io.text import load_vocab

    torch.manual_seed(7)
    e2e = _E2E().eval()
    src = str(tmp_path / "model.acc.best")
    torch.save(e2e.state_dict(), src)
    units = tmp_path / "units.txt"
    toks = ["<unk>", "<space>"] + [chr(ord("a") + i) for i in range(ODIM - 4)]
    units.write_text("".join(f"{t} {i + 1}\n" for i, t in enumerate(toks)))
    imported = str(tmp_path / "imported")
    main([src, imported, "--espnet_units", str(units),
          "--aheads", str(AHEADS)])

    feats = {f"u{i}": RS.randn(36, D_FEAT).astype(np.float32)
             for i in range(2)}
    egs = str(tmp_path / "egs")
    build_egs(iter(feats.items()), egs)
    text = tmp_path / "text"
    text.write_text("u0 ab c\nu1 ba\n")

    out = str(tmp_path / "finetuned")
    train_e2e.main(
        [egs, str(text), out, "--init_from", imported,
         "--attn_chunk", "4", "--attn_left_chunks", "1",
         "--epochs", "1", "--batch_size", "2", "--warmup_steps", "5",
         "--average_last", "1", "--transformer_lr", "0"]
    )
    assert "initialized from" in capsys.readouterr().out

    model, params, cfg, vocab = _load(out, "final_avg")
    # geometry inherited from the checkpoint, chunk mask from the CLI
    assert (cfg.adim, cfg.aheads, cfg.elayers) == (ADIM, AHEADS, ELAYERS)
    assert cfg.attn_chunk == 4 and cfg.attn_left_chunks == 1
    assert vocab == load_vocab(os.path.join(imported, "vocab.json"))
    # zero-LR epoch: final_avg params == imported params, bit-exact
    _, src_params, _, _ = _load(imported, "final_avg")
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(src_params)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resolve_init_checkpoint(tmp_path):
    """--init_from accepts a checkpoint dir, a model dir (final_avg >
    final > newest epoch), and fails loud on an empty dir."""
    from speech_recognition_tools_tpu.cli.train_e2e import (
        resolve_init_checkpoint,
    )

    mdir = tmp_path / "model"
    for tag in ("epoch_1", "epoch_2", "final", "final_avg"):
        d = mdir / tag
        d.mkdir(parents=True)
        (d / "state.msgpack").write_bytes(b"")
        (d / "config.json").write_text("{}")
    # direct checkpoint path
    ckpt, root = resolve_init_checkpoint(str(mdir / "epoch_1"))
    assert ckpt == str(mdir / "epoch_1") and root == str(mdir)
    # model dir: final_avg preferred
    ckpt, root = resolve_init_checkpoint(str(mdir))
    assert ckpt == os.path.join(str(mdir), "final_avg") and root == str(mdir)
    # without final_avg: final; without both: newest epoch
    import shutil

    shutil.rmtree(mdir / "final_avg")
    assert resolve_init_checkpoint(str(mdir))[0].endswith("final")
    shutil.rmtree(mdir / "final")
    assert resolve_init_checkpoint(str(mdir))[0].endswith("epoch_2")
    with pytest.raises(FileNotFoundError):
        resolve_init_checkpoint(str(tmp_path / "nope"))


def test_init_from_requires_source_vocab(tmp_path):
    """--init_from with no vocab.json in the source dir and no --vocab
    must fail loud: a text-built vocab of the same SIZE would pass the
    vocab_size check while permuting which char each embedding row
    means."""
    from speech_recognition_tools_tpu.cli.train_e2e import main

    mdir = tmp_path / "model" / "final"
    mdir.mkdir(parents=True)
    (mdir / "state.msgpack").write_bytes(b"")
    (mdir / "config.json").write_text('{"vocab_size": 5}')
    text = tmp_path / "text"
    text.write_text("utt1 ab\n")
    with pytest.raises(SystemExit, match="vocab.json"):
        main([str(tmp_path / "egs"), str(text), str(tmp_path / "out"),
              "--init_from", str(tmp_path / "model")])
