"""Trainer tests: learning works, LR-revert schedule fires, checkpoints
roundtrip, and the data-parallel step runs on the 8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tools_tpu import models as M
from speech_recognition_tools_tpu.train import (
    TrainConfig,
    Trainer,
    latest_checkpoint,
    load_checkpoint,
    masked_cross_entropy,
    masked_frame_error,
    save_checkpoint,
)
from speech_recognition_tools_tpu.parallel import (
    data_parallel_step,
    make_mesh,
    shard_batch,
)

B, T, D, C = 8, 16, 6, 4


def _data(n_batches, seed=0):
    """Labels depend linearly on inputs -> learnable."""
    rs = np.random.RandomState(seed)
    w = rs.randn(D, C)
    batches = []
    for _ in range(n_batches):
        x = rs.randn(B, T, D).astype(np.float32)
        y = np.argmax(x @ w, axis=-1).astype(np.int32)
        lengths = np.full(B, T, np.int32)
        lengths[-1] = T - 3
        batches.append(
            dict(feats=jnp.asarray(x), labels=jnp.asarray(y),
                 lengths=jnp.asarray(lengths))
        )
    return batches


def _make_model_and_loss():
    model = M.RNNClassifier(num_layers=1, hidden_size=16, out_size=C)

    def loss_fn(params, batch, rng, train):
        logits = model.apply(params, batch["feats"], batch["lengths"])
        loss = masked_cross_entropy(logits, batch["labels"], batch["lengths"])
        fer = masked_frame_error(logits, batch["labels"], batch["lengths"])
        return loss, {"fer": fer}

    return model, loss_fn


class TestTrainer:
    def test_learns(self):
        model, loss_fn = _make_model_and_loss()
        data = _data(6)
        trainer = Trainer(loss_fn, TrainConfig(epochs=8, learning_rate=5e-3))
        x0 = data[0]
        params = model.init(
            {"params": jax.random.key(0)}, x0["feats"], x0["lengths"]
        )
        state = trainer.init_state(params)
        logs = []
        state = trainer.fit(
            state, lambda: iter(data[:5]), lambda: iter(data[5:]),
            log_fn=logs.append,
        )
        first = state.history[0]["train_loss"]
        last = state.history[-1]["train_loss"]
        assert last < first * 0.8, (first, last)

    def test_lr_revert_fires(self):
        model, loss_fn = _make_model_and_loss()
        data = _data(3)
        # absurd LR so dev regresses -> schedule must cut LR and revert
        trainer = Trainer(loss_fn, TrainConfig(epochs=5, learning_rate=5.0, lrr=0.5))
        x0 = data[0]
        params = model.init({"params": jax.random.key(0)}, x0["feats"], x0["lengths"])
        state = trainer.init_state(params)
        state = trainer.fit(
            state, lambda: iter(data[:2]), lambda: iter(data[2:]),
            log_fn=lambda s: None,
        )
        assert state.lr < 5.0

    def test_checkpoint_roundtrip(self, tmp_path):
        model, loss_fn = _make_model_and_loss()
        data = _data(1)
        x0 = data[0]
        params = model.init({"params": jax.random.key(0)}, x0["feats"], x0["lengths"])
        cfg = {"model": "RNNClassifier", "num_layers": 1, "hidden_size": 16,
               "out_size": C}
        save_checkpoint(str(tmp_path), "epoch_1", params, cfg)
        save_checkpoint(str(tmp_path), "epoch_2", params, cfg)
        newest = latest_checkpoint(str(tmp_path))
        assert newest.endswith("epoch_2")
        payload, config = load_checkpoint(newest, template={"params": params})
        assert config["model"] == "RNNClassifier"
        restored = payload["params"]
        out1 = model.apply(params, x0["feats"], x0["lengths"])
        out2 = model.apply(restored, x0["feats"], x0["lengths"])
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


class TestDataParallel:
    def test_dp_step_8_devices(self):
        assert jax.device_count() >= 8, "conftest must provide 8 cpu devices"
        mesh = make_mesh(data=8, model=1)
        model, loss_fn = _make_model_and_loss()
        trainer = Trainer(loss_fn, TrainConfig())
        data = _data(2)
        x0 = data[0]
        params = model.init({"params": jax.random.key(0)}, x0["feats"], x0["lengths"])
        state = trainer.init_state(params)

        def step(params, opt_state, batch, rng):
            (loss, aux), grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch, rng, True), has_aux=True
            )(params)
            updates, opt_state = trainer._tx.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        dp_step = data_parallel_step(step, mesh)
        batch = shard_batch(data[0], mesh)
        params2, opt2, loss = dp_step(state.params, state.opt_state, batch,
                                      jax.random.key(1))
        assert np.isfinite(float(loss))
        # parity with single-device step on the same batch
        p_ref, _, loss_ref = jax.jit(step)(state.params, state.opt_state,
                                           data[0], jax.random.key(1))
        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)
        a = jax.tree.leaves(params2)[0]
        b = jax.tree.leaves(p_ref)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
