"""The demo recipe's staged-resume contract (stages 0-2; the full pipeline
is covered by tests/test_pipeline_e2e.py)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_demo_recipe_stages(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # a JAX_PLATFORMS=cpu child can still hang on the axon plugin's
    # tunnel initialisation when the tunnel is wedged (observed
    # 2026-08-17); drop the plugin env entirely like
    # __graft_entry__._reexec_virtual does
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "recipes", "demo", "run.py"),
         "--expdir", str(tmp_path), "--stage", "0", "--stop_stage", "2",
         "--num_utts", "3"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(tmp_path / "fdlp.ark")
    assert os.path.exists(tmp_path / "egs" / "egs.config")
    # resume from stage 2 only (reference --stage contract)
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "recipes", "demo", "run.py"),
         "--expdir", str(tmp_path), "--stage", "2", "--stop_stage", "2",
         "--num_utts", "3"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "stage 1" not in r2.stdout
