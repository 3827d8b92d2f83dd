"""e2e ASR CLI integration: tiny transformer trains on 4 utts and recog
produces hypotheses (incl. cl two-model mode)."""

import os

import numpy as np
import pytest

from speech_recognition_tools_tpu.cli import recog_e2e, train_e2e
from speech_recognition_tools_tpu.io import build_egs
from speech_recognition_tools_tpu.io.text import (
    build_char_vocab,
    decode_tokens,
    encode_text,
)

RS = np.random.RandomState(13)


def test_vocab_roundtrip():
    v = build_char_vocab(["abc ab", "cad"])
    assert v["<blank>"] == 0 and v["<sos/eos>"] == len(v) - 1
    ids = encode_text("ab c", v)
    assert decode_tokens(ids, v) == "ab c"


@pytest.mark.slow
def test_train_and_recog(tmp_path):
    feats = {f"u{i}": RS.randn(40, 8).astype(np.float32) for i in range(4)}
    egs = str(tmp_path / "egs")
    build_egs(iter(feats.items()), egs)
    text = tmp_path / "text"
    text.write_text("".join(f"u{i} ab cab\n" for i in range(4)))

    out = str(tmp_path / "e2e")
    train_e2e.main(
        [egs, str(text), out, "--adim", "16", "--aheads", "2",
         "--elayers", "1", "--eunits", "32", "--dlayers", "1",
         "--dunits", "32", "--epochs", "2", "--batch_size", "2",
         "--warmup_steps", "10", "--average_last", "2"]
    )
    assert os.path.exists(os.path.join(out, "final_avg", "state.msgpack"))

    hyp = str(tmp_path / "hyp.txt")
    recog_e2e.main(
        [out, egs, hyp, "--beam_size", "2", "--max_len", "10",
         "--ref_text", str(text)]
    )
    lines = open(hyp).read().splitlines()
    assert len(lines) == 4

    hyp2 = str(tmp_path / "hyp_cl.txt")
    recog_e2e.main(
        [f"{out},{out}", egs, hyp2, "--api", "cl",
         "--pm_scores", "0.02,0.01", "--beam_size", "2", "--max_len", "8"]
    )
    assert len(open(hyp2).read().splitlines()) == 4


def test_ctc_feasibility_filter():
    """filtering_samples.py parity: samples whose subsampled encoder
    length can't cover the labels are pruned."""
    from speech_recognition_tools_tpu.cli.train_e2e import ctc_feasible

    # 41 frames -> enc_len 9 (VALID convs): 9 tokens ok, 10 not
    assert ctc_feasible(41, 9)
    assert not ctc_feasible(41, 10)
    assert not ctc_feasible(41, 8, min_io_delta=2)
    assert ctc_feasible(41, 4, min_io_ratio=2.0)
    assert not ctc_feasible(41, 5, min_io_ratio=2.0)


@pytest.mark.slow
def test_train_e2e_resumes_from_crash(tmp_path, capsys):
    """Babysitter contract: after a 'crash' (no final_avg), rerunning
    resumes from the newest epoch checkpoint instead of re-training."""
    import shutil

    from speech_recognition_tools_tpu.cli import train_e2e

    feats = {f"u{i}": RS.randn(30, 8).astype(np.float32) for i in range(3)}
    egs = str(tmp_path / "egs")
    build_egs(iter(feats.items()), egs)
    text = tmp_path / "text"
    text.write_text("".join(f"u{i} ab\n" for i in range(3)))
    out = str(tmp_path / "e2e")
    common = [egs, str(text), out, "--adim", "16", "--aheads", "2",
              "--elayers", "1", "--eunits", "16", "--dlayers", "1",
              "--dunits", "16", "--batch_size", "3", "--warmup_steps",
              "5", "--average_last", "2"]
    train_e2e.main(common + ["--epochs", "2"])
    shutil.rmtree(os.path.join(out, "final_avg"))  # simulate crash
    capsys.readouterr()
    train_e2e.main(common + ["--epochs", "3"])
    printed = capsys.readouterr().out
    assert "resumed from" in printed and "at epoch 2" in printed
    assert "epoch 3:" in printed and "epoch 2:" not in printed
    assert os.path.exists(os.path.join(out, "final_avg", "state.msgpack"))

    # completed run: rerun is a no-op
    capsys.readouterr()
    train_e2e.main(common + ["--epochs", "3"])
    assert "training complete" in capsys.readouterr().out
