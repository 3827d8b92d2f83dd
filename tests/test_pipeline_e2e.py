"""Full-pipeline integration test through the CLIs: wav scp -> FDLP ark ->
egs -> train (rnn + pm_ae + vae) -> prior -> dump loglikes -> lifelong
fusion -> adaptation. The TPU-world equivalent of a reference recipe run
on run.pl (SURVEY.md §4)."""

import os
import pickle

import numpy as np
import pytest
from scipy.io.wavfile import write as wav_write

from speech_recognition_tools_tpu.cli import (
    adapt_am,
    compute_fdlp_spectrogram,
    compute_prior,
    dump_outputs,
    lifelong_decode,
    pm_score_cli,
    train_am,
)
from speech_recognition_tools_tpu.io import (
    build_egs,
    read_mat_scp,
    write_ark_scp,
)

RS = np.random.RandomState(5)
SRATE = 16000
NUM_CLASSES = 4


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    # 1. wavs + scp
    entries = []
    for i in range(6):
        n = SRATE + (i % 3) * 4000
        sig = (RS.randn(n) * 2000).astype(np.int16)
        p = str(root / f"utt{i}.wav")
        wav_write(p, SRATE, sig)
        entries.append(f"utt{i} {p}")
    scp = root / "wav.scp"
    scp.write_text("\n".join(entries) + "\n")

    # 2. FDLP featgen CLI -> ark
    feat_base = str(root / "fdlp")
    compute_fdlp_spectrogram.main(
        [str(scp), feat_base, "--nfilters", "8", "--batch_size", "3"]
    )

    # 3. egs with synthetic labels
    feats = dict(read_mat_scp(feat_base + ".scp"))
    labels = {
        k: RS.randint(0, NUM_CLASSES, v.shape[0]).astype(np.int32)
        for k, v in feats.items()
    }
    egs = str(root / "egs")
    build_egs(iter(feats.items()), egs, labels=labels, num_targets=NUM_CLASSES)
    return dict(root=root, egs=egs, feats=feats, labels=labels)


@pytest.mark.slow
def test_full_hybrid_pipeline(pipeline):
    root, egs = pipeline["root"], pipeline["egs"]

    # 4. train a small GRU AM
    am_dir = str(root / "am")
    train_am.main(
        [egs, am_dir, "--arch", "rnn", "--num_layers", "1", "--hidden_dim",
         "16", "--epochs", "2", "--batch_size", "3"]
    )
    assert os.path.exists(os.path.join(am_dir, "final", "state.msgpack"))

    # 5. prior from egs labels
    prior_file = str(root / "prior.pkl")
    compute_prior.main([egs, prior_file, "--num_classes", str(NUM_CLASSES)])
    prior = pickle.load(open(prior_file, "rb"))
    np.testing.assert_allclose(np.exp(prior).sum(), 1.0, rtol=1e-6)

    # 6. dump prior-normalised loglikes
    ll_base = str(root / "loglikes")
    dump_outputs.main([am_dir, egs, ll_base, "--prior", prior_file])
    lls = dict(read_mat_scp(ll_base + ".scp"))
    assert set(lls) == set(pipeline["feats"])
    for k, v in lls.items():
        assert v.shape == (pipeline["feats"][k].shape[0], NUM_CLASSES)

    # 7. train PM autoencoder on the AM's output space (use posteriors as
    # feats): quick stand-in — train pm_ae on the loglikes as features
    pm_egs = str(root / "pm_egs")
    build_egs(iter(lls.items()), pm_egs)
    pm_dir = str(root / "pm")
    train_am.main(
        [pm_egs, pm_dir, "--arch", "pm_ae", "--num_layers", "1",
         "--num_layers_dec", "1", "--hidden_dim", "8", "--bn_dim", "4",
         "--epochs", "1", "--batch_size", "3", "--loss", "mse"]
    )

    # 8. adaptation: AM adapts against frozen PM
    adapted_dir = str(root / "adapted")
    adapt_am.main(
        [am_dir, pm_dir, egs, adapted_dir, "--epochs", "1",
         "--batch_size", "3", "--dev_egs_dir", egs]
    )
    assert os.path.exists(os.path.join(adapted_dir, "adapted", "state.msgpack"))

    # 9. PM scores + m-measure
    score_file = str(root / "pm.score")
    pm_score_cli.main(
        ["pm", am_dir, pm_dir, egs, score_file, "--contrastive"]
    )
    scores = pickle.load(open(score_file, "rb"))
    assert set(scores) == set(pipeline["feats"])

    post_base = str(root / "posts")
    dump_outputs.main([am_dir, egs, post_base, "--add_softmax"])
    mm_file = str(root / "mm.score")
    pm_score_cli.main(
        ["mmeasure", post_base + ".scp", mm_file, "--delta_list", "2,4"]
    )
    mm = pickle.load(open(mm_file, "rb"))
    assert all(np.isfinite(v) for v in mm.values())


@pytest.mark.slow
def test_lifelong_decode_cli(pipeline):
    root, egs = pipeline["root"], pipeline["egs"]
    # two task classifiers + two VAEs
    dirs = {}
    for t in range(2):
        am_dir = str(root / f"am_t{t}")
        train_am.main(
            [egs, am_dir, "--arch", "rnn", "--num_layers", "1",
             "--hidden_dim", "12", "--epochs", "1", "--batch_size", "3",
             "--seed", str(t)]
        )
        vae_dir = str(root / f"vae_t{t}")
        train_am.main(
            [egs, vae_dir, "--arch", "vae", "--num_layers", "1",
             "--num_layers_dec", "1", "--hidden_dim", "12", "--bn_dim", "4",
             "--epochs", "1", "--batch_size", "3", "--loss", "vae_gauss",
             "--seed", str(10 + t)]
        )
        dirs[t] = (am_dir, vae_dir)
    prior_file = str(root / "prior.pkl")
    if not os.path.exists(prior_file):
        compute_prior.main([egs, prior_file, "--num_classes", str(NUM_CLASSES)])

    fused_base = str(root / "fused")
    lifelong_decode.main(
        [f"{dirs[0][0]},{dirs[1][0]}", f"{dirs[0][1]},{dirs[1][1]}", egs,
         f"{prior_file},{prior_file}", "dp", fused_base, "--batch_size", "3"]
    )
    fused = dict(read_mat_scp(fused_base + ".scp"))
    assert set(fused) == set(pipeline["feats"])
    for k, v in fused.items():
        assert v.shape == (pipeline["feats"][k].shape[0], NUM_CLASSES)
        assert np.all(np.isfinite(v))

    # postpm variant: p(x) VAEs trained on the classifiers' *outputs*
    # (num_classes inputs) + tp-weighted geometric fusion — the
    # compute_advanced_likelihood_postpm.py flow
    post_vaes = []
    for t in range(2):
        post_base = str(root / f"postdump_t{t}")
        dump_outputs.main([dirs[t][0], egs, post_base])
        post_egs = str(root / f"egs_post_t{t}")
        build_egs(read_mat_scp(post_base + ".scp"), post_egs)
        vdir = str(root / f"vae_post_t{t}")
        train_am.main(
            [post_egs, vdir, "--arch", "vae", "--num_layers", "1",
             "--num_layers_dec", "1", "--hidden_dim", "12", "--bn_dim", "4",
             "--epochs", "1", "--batch_size", "3", "--loss", "vae_gauss",
             "--seed", str(20 + t)]
        )
        post_vaes.append(vdir)
    fused_pp = str(root / "fused_postpm")
    lifelong_decode.main(
        [f"{dirs[0][0]},{dirs[1][0]}", ",".join(post_vaes), egs,
         f"{prior_file},{prior_file}", "dp", fused_pp, "--batch_size", "3",
         "--fusion", "postpm", "--pm_on", "posteriors", "--beta", "500"]
    )
    fused2 = dict(read_mat_scp(fused_pp + ".scp"))
    assert set(fused2) == set(pipeline["feats"])
    for k, v in fused2.items():
        assert np.all(np.isfinite(v))
        # the weighted-power fusion must differ from the plain powerset
        assert np.max(np.abs(v - fused[k])) > 1e-8
