"""Tests for deltas/PCA, delay-and-sum, APC, extra train_am archs, semisup."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_recognition_tools_tpu.enhance.delay_sum import delay_and_sum, gcc_phat
from speech_recognition_tools_tpu.io import build_egs, load_egs
from speech_recognition_tools_tpu.models.apc import APC, apc_loss
from speech_recognition_tools_tpu.utils.transforms import (
    add_deltas,
    apply_pca,
    estimate_pca,
)

RS = np.random.RandomState(17)


class TestTransforms:
    def test_deltas_shape_and_constant(self):
        x = jnp.asarray(RS.randn(2, 20, 5), jnp.float32)
        out = add_deltas(x, order=2)
        assert out.shape == (2, 20, 15)
        # deltas of a constant signal are zero
        c = jnp.ones((1, 10, 3))
        out = add_deltas(c, order=1)
        np.testing.assert_allclose(np.asarray(out[..., 3:]), 0.0, atol=1e-7)

    def test_delta_linear_ramp(self):
        # x_t = t: delta = sum k*2k/(2*sum k^2) = 1 in the interior
        T = 12
        x = jnp.asarray(np.arange(T, dtype=np.float32))[None, :, None]
        d = add_deltas(x, order=1)[0, :, 1]
        np.testing.assert_allclose(np.asarray(d[2:-2]), 1.0, atol=1e-6)

    def test_pca_roundtrip(self):
        # low-rank data: PCA to 2 dims reconstructs the signal subspace
        z = RS.randn(500, 2)
        A = RS.randn(2, 6)
        x = z @ A + 5.0
        T, mean = estimate_pca(x, dim=2)
        y = apply_pca(x, T, mean)
        assert y.shape == (500, 2)
        # projecting back recovers x up to numerical noise
        x_rec = y @ np.asarray(T) + mean
        np.testing.assert_allclose(x_rec, x, atol=1e-8)

    def test_pca_whitening(self):
        x = RS.randn(2000, 4) * np.asarray([10, 5, 1, 0.1])
        T, mean = estimate_pca(x, normalize_variance=True)
        y = apply_pca(x, T, mean)
        np.testing.assert_allclose(np.var(y, axis=0), 1.0, rtol=0.1)


class TestDelaySum:
    def test_gcc_phat_finds_delay(self):
        x = RS.randn(8000)
        for true in (-37, 0, 55):
            if true >= 0:
                y = np.concatenate([np.zeros(true), x[: len(x) - true]])
            else:
                y = np.concatenate([x[-true:], np.zeros(-true)])
            assert gcc_phat(y, x, 100) == true

    def test_delay_and_sum_improves_snr(self):
        n = 16000
        clean = RS.randn(n)
        D = 4
        sigs = np.zeros((D, n))
        for d in range(D):
            td = d * 9
            sigs[d, td:] = clean[: n - td]
            sigs[d] += 0.8 * RS.randn(n)
        out, delays, w = delay_and_sum(sigs, fs=16000)
        # aligned sum should correlate better with clean than any channel
        def corr(a, b):
            return abs(np.dot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b))

        best_ch = max(corr(sigs[d], clean) for d in range(D))
        assert corr(out, clean) > best_ch


class TestAPC:
    def test_apc_trains(self):
        m = APC(num_layers=1, hidden_size=16)
        x = jnp.asarray(RS.randn(2, 20, 6), jnp.float32)
        lengths = jnp.asarray([20, 15])
        params = m.init({"params": jax.random.key(0)}, x, lengths)
        pred, h = m.apply(params, x, lengths)
        assert pred.shape == x.shape and h.shape == (2, 20, 16)
        loss = apc_loss(pred, x, lengths, time_shift=3)
        assert np.isfinite(float(loss))


class TestSemisupEgs:
    def test_semisup_fills_zero(self, tmp_path):
        feats = {"a": RS.randn(10, 4).astype(np.float32),
                 "b": RS.randn(8, 4).astype(np.float32)}
        labels = {"a": np.ones(10, np.int32)}
        out = build_egs(iter(feats.items()), str(tmp_path / "egs"),
                        labels=labels, semisup=True)
        _, utts = load_egs(out)
        got = {k: l for k, _, l in utts}
        assert set(got) == {"a", "b"}
        np.testing.assert_array_equal(got["b"], np.zeros(8, np.int32))


@pytest.mark.parametrize("arch,extra", [
    ("cnn", ["--num_layers_dec", "1"]),
    ("cldnn", ["--num_layers", "1", "--num_layers_dec", "1"]),
    ("multimod", ["--comp_num", "2", "--num_layers", "1",
                  "--num_layers_dec", "1"]),
    pytest.param("arvae", ["--num_layers", "1", "--num_layers_dec", "1",
               "--time_shift", "2"], marks=pytest.mark.slow),
    ("apc", ["--num_layers", "1", "--time_shift", "2"]),
])
def test_train_am_archs(tmp_path, arch, extra):
    from speech_recognition_tools_tpu.cli import train_am

    feats = {f"u{i}": RS.randn(24, 8).astype(np.float32) for i in range(4)}
    labels = {k: RS.randint(0, 3, 24).astype(np.int32) for k in feats}
    egs = str(tmp_path / "egs")
    build_egs(iter(feats.items()), egs, labels=labels, num_targets=3)
    out = str(tmp_path / arch)
    train_am.main(
        [egs, out, "--arch", arch, "--hidden_dim", "16", "--bn_dim", "4",
         "--epochs", "1", "--batch_size", "2"] + extra
    )
    import os

    assert os.path.exists(os.path.join(out, "final", "state.msgpack"))


@pytest.mark.parametrize("arch,extra", [
    pytest.param("multitask_aear", ["--num_layers", "1",
               "--num_layers_dec", "1", "--bn_dim", "4",
               "--time_shift", "2"], marks=pytest.mark.slow),
    pytest.param("vae_cnn", ["--bn_dim", "4", "--loss", "mse"],
                 marks=pytest.mark.slow),
    ("rs_vae", ["--bn_dim", "4", "--loss", "mse"]),
    ("vae_cnn_pool", ["--bn_dim", "4", "--loss", "mse",
                      "--patch_width", "8"]),
])
def test_train_am_conv_vae_archs(tmp_path, arch, extra):
    from speech_recognition_tools_tpu.cli import train_am
    from speech_recognition_tools_tpu.io import build_egs

    feats = {f"u{i}": RS.randn(24, 8).astype(np.float32) for i in range(4)}
    labels = {k: RS.randint(0, 3, 24).astype(np.int32) for k in feats}
    egs = str(tmp_path / "egs")
    build_egs(iter(feats.items()), egs, labels=labels, num_targets=3)
    out = str(tmp_path / arch)
    train_am.main(
        [egs, out, "--arch", arch, "--hidden_dim", "32", "--epochs", "1",
         "--batch_size", "4"] + extra
    )
    import os
    assert os.path.exists(os.path.join(out, "final", "state.msgpack"))
    if arch == "vae_cnn_pool":
        # the checkpoint is consumable downstream: dump per-frame
        # bottleneck means through the generic CLI (template restore
        # must honour the trained --patch_width, not a default)
        from speech_recognition_tools_tpu.cli import dump_outputs
        from speech_recognition_tools_tpu.io import read_mat_scp

        dumped = str(tmp_path / "pool_embeds")
        dump_outputs.main([out, egs, dumped])
        got = dict(read_mat_scp(dumped + ".scp"))
        assert set(got) == set(feats)
        assert all(v.shape == (24, 4) for v in got.values())


@pytest.mark.slow
def test_dump_outputs_multimod_and_curl(tmp_path):
    from speech_recognition_tools_tpu.cli import dump_outputs, train_am
    from speech_recognition_tools_tpu.io import build_egs, read_mat_scp

    feats = {f"u{i}": RS.randn(20, 8).astype(np.float32) for i in range(3)}
    labels = {k: RS.randint(0, 3, 20).astype(np.int32) for k in feats}
    egs = str(tmp_path / "egs")
    build_egs(iter(feats.items()), egs, labels=labels, num_targets=3)
    for arch, extra in (
        ("multimod", ["--comp_num", "2", "--num_layers", "1",
                      "--num_layers_dec", "1"]),
        ("curl", ["--comp_num", "2", "--num_layers", "1",
                  "--num_layers_dec", "1", "--bn_dim", "4"]),
    ):
        out = str(tmp_path / arch)
        train_am.main(
            [egs, out, "--arch", arch, "--hidden_dim", "16", "--epochs", "1",
             "--batch_size", "3"] + extra
        )
        dumped = str(tmp_path / f"{arch}_post")
        dump_outputs.main([out, egs, dumped, "--add_softmax"])
        got = dict(read_mat_scp(dumped + ".scp"))
        assert set(got) == set(feats)
        for k, v in got.items():
            assert v.shape == (20, 3) and np.all(np.isfinite(v))


def test_vae_generate():
    import jax
    import jax.numpy as jnp

    from speech_recognition_tools_tpu import models as M
    from speech_recognition_tools_tpu.models.vae import vae_generate

    m = M.VAE(num_layers_enc=1, num_layers_dec=1, hidden_size=8, bn_size=3,
              input_size=6)
    x = jnp.asarray(RS.randn(2, 10, 6), jnp.float32)
    lengths = jnp.asarray([10, 10])
    params = m.init({"params": jax.random.key(0),
                     "sample": jax.random.key(1)}, x, lengths)
    gen = vae_generate(m, params, jax.random.key(2), size=16)
    assert gen.shape == (1, 16, 6)


@pytest.mark.slow
def test_train_am_expand_component_lifelong(tmp_path):
    """Lifelong flow: train 2-component CURL on task A, grow to 3 with
    --expand_from, train on task B; grown config records comp_num=3."""
    import json
    import os

    from speech_recognition_tools_tpu.cli import train_am
    from speech_recognition_tools_tpu.io import build_egs

    def make_egs(path, seed):
        rs = np.random.RandomState(seed)
        feats = {f"u{i}": rs.randn(16, 6).astype(np.float32) for i in range(4)}
        labels = {k: rs.randint(0, 3, 16).astype(np.int32) for k in feats}
        build_egs(iter(feats.items()), path, labels=labels, num_targets=3)

    egs_a, egs_b = str(tmp_path / "a"), str(tmp_path / "b")
    make_egs(egs_a, 0)
    make_egs(egs_b, 1)
    base = str(tmp_path / "curl_base")
    common = ["--arch", "curl", "--num_layers", "1", "--num_layers_dec", "1",
              "--hidden_dim", "8", "--bn_dim", "4", "--epochs", "1",
              "--batch_size", "4"]
    train_am.main([egs_a, base, "--comp_num", "2"] + common)
    grown = str(tmp_path / "curl_grown")
    train_am.main([egs_b, grown, "--expand_from", base] + common)
    cfg = json.load(open(os.path.join(grown, "final", "config.json")))
    assert cfg["comp_num"] == 3


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["modnet", "modnet_sigmoid"])
def test_train_am_modnet(tmp_path, arch):
    from speech_recognition_tools_tpu.cli import train_am
    from speech_recognition_tools_tpu.io import build_egs

    feats = {f"u{i}": RS.randn(40, 8).astype(np.float32) for i in range(3)}
    labels = {k: RS.randint(0, 3, 40).astype(np.int32) for k in feats}
    egs = str(tmp_path / "egs")
    build_egs(iter(feats.items()), egs, labels=labels, num_targets=3)
    out = str(tmp_path / arch)
    train_am.main(
        [egs, out, "--arch", arch, "--hidden_dim", "16", "--epochs", "1",
         "--batch_size", "3", "--patch_width", "11", "--freq_num", "4",
         "--head_num", "2", "--num_layers_dec", "2"]
    )
    import os
    assert os.path.exists(os.path.join(out, "final", "state.msgpack"))


def test_tandem_feats_cli(tmp_path):
    """get_Tandem_feats.sh equivalent: AM posterior features + PCA."""
    import pickle as pkl

    from speech_recognition_tools_tpu.cli import tandem_feats, train_am
    from speech_recognition_tools_tpu.io import build_egs, read_mat_scp

    rs = np.random.RandomState(21)
    feats = {f"u{i}": rs.randn(20, 8).astype(np.float32) for i in range(4)}
    labels = {k: rs.randint(0, 5, 20).astype(np.int32) for k in feats}
    egs = str(tmp_path / "egs")
    build_egs(iter(feats.items()), egs, labels=labels, num_targets=5)
    am = str(tmp_path / "am")
    train_am.main([egs, am, "--arch", "rnn", "--num_layers", "1",
                   "--hidden_dim", "8", "--epochs", "1",
                   "--batch_size", "2"])
    out = str(tmp_path / "post")
    tandem_feats.main([am, egs, out, "--tandem_type", "softmax",
                       "--get_pca", "--pca_dim", "3"])
    post = dict(read_mat_scp(out + ".scp"))
    assert len(post) == 4
    for k, v in post.items():
        assert v.shape == (20, 5)
        np.testing.assert_allclose(v.sum(axis=1), 1.0, atol=1e-4)
    proj = dict(read_mat_scp(out + "_pca.scp"))
    assert proj["u0"].shape == (20, 3)
    with open(out + "_pca.pkl", "rb") as f:
        pca = pkl.load(f)
    assert pca["transform"].shape == (3, 5)


def test_babysit_restarts_until_success(tmp_path):
    """Supervisor restarts crashed training; resumable trainer makes
    progress monotone (train_rnn_hybrid.sh:118-160 contract)."""
    from speech_recognition_tools_tpu.cli.babysit import babysit

    calls = []

    class FakeRc:
        def __init__(self, rc):
            self.returncode = rc

    rcs = iter([1, 1, 0])

    def fake_run(cmd):
        calls.append(list(cmd))
        return FakeRc(next(rcs))

    clock = [0.0]

    import speech_recognition_tools_tpu.cli.babysit as bb

    real_time = bb.time.time
    bb.time.time = lambda: clock.__setitem__(0, clock[0] + 100) or clock[0]
    try:
        rc = babysit(["train"], max_restarts=5, min_uptime=30,
                     backoff=0, _run=fake_run, _sleep=lambda s: None)
    finally:
        bb.time.time = real_time
    assert rc == 0
    assert len(calls) == 3


def test_babysit_fast_crash_is_fatal():
    from speech_recognition_tools_tpu.cli.babysit import babysit

    class FakeRc:
        returncode = 2

    rc = babysit(["boom"], max_restarts=5, min_uptime=30, backoff=0,
                 _run=lambda c: FakeRc(), _sleep=lambda s: None)
    assert rc == 2


def test_babysit_end_to_end(tmp_path):
    """Real subprocess: a script that crashes once (flag file) then
    succeeds."""
    import subprocess
    import sys as _sys

    from speech_recognition_tools_tpu.cli.babysit import babysit

    flag = tmp_path / "crashed_once"
    script = tmp_path / "job.py"
    script.write_text(
        "import os, sys\n"
        f"flag = {str(flag)!r}\n"
        "if not os.path.exists(flag):\n"
        "    open(flag, 'w').close()\n"
        "    sys.exit(3)\n"
        "print('done')\n"
    )
    rc = babysit([_sys.executable, str(script)], max_restarts=3,
                 min_uptime=0.0, backoff=0.0)
    assert rc == 0


class TestAliUtils:
    """Native equivalents of the reference's Kaldi-glue scripts
    (convert_ali.sh / combine_alidirs_blindly.sh /
    simplify_dictionary.sh)."""

    def test_cli_roundtrip(self, tmp_path):
        import pickle

        import numpy as np

        from speech_recognition_tools_tpu.cli import ali_utils

        a = {"u1": np.array([0, 0, 1, 2], np.int32)}
        b = {"u1": np.array([2, 2], np.int32),
             "u2": np.array([1], np.int32)}
        pa, pb = tmp_path / "a" / "ali.pkl", tmp_path / "b" / "ali.pkl"
        pa.parent.mkdir()
        pb.parent.mkdir()
        pa.write_bytes(pickle.dumps(a))
        pb.write_bytes(pickle.dumps(b))

        (tmp_path / "map.txt").write_text("0 5\n1 6\n2 7\n")
        ali_utils.main(["convert", str(pa), str(tmp_path / "conv.pkl"),
                        "--label_map", str(tmp_path / "map.txt")])
        conv = pickle.loads((tmp_path / "conv.pkl").read_bytes())
        assert conv["u1"].tolist() == [5, 5, 6, 7]

        ali_utils.main(["combine", str(tmp_path / "comb.pkl"),
                        str(pa), str(pb)])
        comb = pickle.loads((tmp_path / "comb.pkl").read_bytes())
        assert set(comb) == {"u1", "b_u1", "u2"}
        assert comb["b_u1"].tolist() == [2, 2]

        (tmp_path / "lex.txt").write_text(
            "go g_1 ow\nstop s t_2 aa p\ngo g_2 ow\n"
        )
        (tmp_path / "pmap.txt").write_text("g g_1 g_2\nt t_2\n")
        ali_utils.main(["simplify-lexicon", str(tmp_path / "lex.txt"),
                        str(tmp_path / "out.txt"),
                        str(tmp_path / "pmap.txt")])
        lines = (tmp_path / "out.txt").read_text().splitlines()
        assert lines == ["go g ow", "stop s t aa p"]

    def test_combine_lexicon(self, tmp_path):
        """combine_dict.sh analogue: merge lexicons, uppercasing only the
        named sources (the reference uppercases the Fisher lexicon
        alone), dedup (word, phones) keeping the first occurrence."""
        from speech_recognition_tools_tpu.cli import ali_utils

        # first source deliberately mixed-case: must pass through as-is
        (tmp_path / "wsj.txt").write_text(
            "GO g ow\nSTOP s t aa p\nMcDonald's m ax k\n"
        )
        (tmp_path / "fish.txt").write_text("go g ow\nyes y eh s\n")
        ali_utils.main([
            "combine-lexicon", str(tmp_path / "uni.txt"),
            str(tmp_path / "wsj.txt"), str(tmp_path / "fish.txt"),
            "--uppercase", "1",
        ])
        lines = (tmp_path / "uni.txt").read_text().splitlines()
        assert lines == ["GO g ow", "STOP s t aa p", "McDonald's m ax k",
                         "YES y eh s"]

    def test_convert_rejects_unmapped(self, tmp_path):
        import pickle

        import numpy as np
        import pytest

        from speech_recognition_tools_tpu.cli import ali_utils

        p = tmp_path / "ali.pkl"
        p.write_bytes(pickle.dumps({"u": np.array([0, 9], np.int32)}))
        (tmp_path / "map.txt").write_text("0 1\n")
        with pytest.raises(ValueError, match="not in map"):
            ali_utils.main(["convert", str(p), str(tmp_path / "o.pkl"),
                            "--label_map", str(tmp_path / "map.txt")])
