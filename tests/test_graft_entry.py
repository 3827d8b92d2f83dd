"""Driver-contract tests for __graft_entry__.py.

Round-1 failure mode (MULTICHIP_r01.json rc=1): the driver calls
dryrun_multichip(8) in an environment whose backend exposes ONE real TPU
chip and that never loads tests/conftest.py. These tests reproduce that
invocation path in a clean subprocess, plus verify the TP sharding is
numerically a no-op vs replicated execution.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(n_visible_devices=1):
    """Env mimicking the driver: jax sees a 1-device backend, no conftest."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    if n_visible_devices != 1:
        flags.append(
            f"--xla_force_host_platform_device_count={n_visible_devices}"
        )
    env["XLA_FLAGS"] = " ".join(flags)
    return env


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation():
    """Exactly what the driver runs: dryrun_multichip(8) with a 1-device
    backend. Must self-provision a virtual 8-device mesh and pass."""
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_clean_env(1),
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun ok" in proc.stdout, proc.stdout


def test_tp_step_matches_replicated():
    """One DP x TP=2 train step must match the fully-replicated step."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from speech_recognition_tools_tpu import models as M
    from speech_recognition_tools_tpu.parallel.tp import (
        gru_tp_spec,
        shard_like_params,
        shard_params,
    )
    from speech_recognition_tools_tpu.train import masked_cross_entropy

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (conftest)")

    model = M.RNNClassifier(num_layers=1, hidden_size=16, out_size=10)
    rs = np.random.RandomState(0)
    B, T, D = 8, 12, 6
    feats = jnp.asarray(rs.randn(B, T, D), jnp.float32)
    lengths = jnp.asarray([T] * B, jnp.int32)
    labels = jnp.asarray(rs.randint(0, 10, (B, T)), jnp.int32)
    params0 = model.init({"params": jax.random.key(0)}, feats, lengths)
    tx = optax.adam(1e-2)

    def run(mesh, spec):
        params = shard_params(params0, mesh, spec)
        opt_state = shard_like_params(tx.init(params0), mesh, spec)
        bsh = NamedSharding(mesh, P("data"))
        f = jax.device_put(feats, bsh)
        ln = jax.device_put(lengths, bsh)
        lb = jax.device_put(labels, bsh)

        @jax.jit
        def step(params, opt_state, f, ln, lb):
            def loss_fn(p):
                return masked_cross_entropy(model.apply(p, f, ln), lb, ln)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), loss

        with mesh:
            new_params, loss = step(params, opt_state, f, ln, lb)
            jax.block_until_ready(loss)
        return jax.device_get(new_params), float(loss)

    devs = np.asarray(jax.devices()[:8])
    mesh_tp = Mesh(devs.reshape(4, 2), ("data", "model"))
    mesh_rep = Mesh(devs.reshape(8, 1), ("data", "model"))
    p_tp, l_tp = run(mesh_tp, gru_tp_spec(mesh_tp))
    p_rep, l_rep = run(mesh_rep, gru_tp_spec(mesh_rep))

    assert abs(l_tp - l_rep) < 1e-5, (l_tp, l_rep)
    flat_tp = jax.tree_util.tree_leaves(p_tp)
    flat_rep = jax.tree_util.tree_leaves(p_rep)
    for a, b in zip(flat_tp, flat_rep):
        np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-5)
