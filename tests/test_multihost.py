"""Real two-process jax.distributed integration test on localhost CPU.

Upgrades parallel/launcher.py beyond unit coverage: two OS processes
join one global mesh via initialize_runtime, assemble a global batch
with global_batch_from_local, and run a psum'd data-parallel step —
the multi-host training shape (SURVEY §2.8 communication backend row)
executed for real, scheduler-free (the run.pl-mode of the duality).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
os.environ.pop("XLA_FLAGS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from speech_recognition_tools_tpu.parallel.launcher import (
    initialize_runtime, global_batch_from_local)

pid = int(os.environ["PROC_ID"])
devices, multihost = initialize_runtime(
    multihost=True,
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=pid,
)
assert multihost and jax.process_count() == 2, jax.process_count()

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), ("data",))
local = {"x": np.full((3, 4), float(pid + 1), np.float32)}
batch = global_batch_from_local(local, mesh)
assert batch["x"].shape == (6, 4), batch["x"].shape

@jax.jit
def step(b):
    return jnp.sum(b["x"])  # global reduction over the sharded axis

total = float(step(batch))
# global sum = 3*4*1 + 3*4*2 = 36
assert abs(total - 36.0) < 1e-5, total
print(f"proc {pid} ok total={total}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    procs = []
    for pid in range(2):
        env = dict(
            os.environ, REPO=REPO, COORD=coord, PROC_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid} ok" in out, out[-500:]
