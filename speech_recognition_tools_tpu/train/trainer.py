"""Generic trainer with the reference's LR-halve-and-revert schedule.

One trainer + a task loss function replaces the reference's 23 cloned
train_*.py scripts. The schedule replicates
train_rnn_nnet_classifier.py:248-262: after each epoch, if the dev loss
regresses by more than `lr_tol` (relative), multiply the learning rate by
`lrr` and *revert the weights* to the best epoch so far. Like the
reference (which only calls model.load_state_dict and keeps the torch
optimizer's momentum buffers), the optimizer moments are deliberately NOT
reverted — only the learning rate changes.

TPU design: the epoch body is a single jitted train_step (donated state,
mesh-shardable by the caller via parallel.apply_data_parallel); the
LR-revert decision is host-side control flow between epochs, exactly where
the reference makes it.
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from speech_recognition_tools_tpu.train.optim import make_optimizer


@dataclass
class TrainConfig:
    optimizer: str = "adam"
    learning_rate: float = 1e-3
    epochs: int = 20
    lrr: float = 0.5  # LR reduction rate on dev regression
    lr_tol: float = 0.0  # relative tolerance before reducing
    clip_threshold: float | None = 1.0
    min_lr: float = 1e-8
    seed: int = 0


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    lr: float
    epoch: int = 0
    best_params: Any = None
    best_dev_loss: float = float("inf")
    history: list = field(default_factory=list)
    # per-leaf Sharding tree captured with best_params, so a revert can
    # re-place the host snapshot exactly where the live params were
    # (e.g. expert-parallel NamedShardings) instead of the default device
    best_shardings: Any = None


class Trainer:
    """Drives (train_iter, dev_iter) through a jitted step with the
    LR-revert schedule.

    Args:
      loss_fn: (params, batch, rng, train: bool) -> (loss, aux_dict).
        Must be jit-compatible; `batch` is whatever the iterators yield.
      config: TrainConfig.
    """

    def __init__(self, loss_fn: Callable, config: TrainConfig = TrainConfig()):
        self.loss_fn = loss_fn
        self.config = config
        self._tx = optax.inject_hyperparams(
            lambda learning_rate: make_optimizer(
                config.optimizer, learning_rate, config.clip_threshold
            )
        )(learning_rate=config.learning_rate)

        # donated: XLA reuses the param/moment buffers for the outputs,
        # so the step keeps one live copy of the training state. The
        # revert snapshot (best_params) is a HOST copy (fit()), never an
        # alias of the donated device buffers.
        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng):
            (loss, aux), grads = jax.value_and_grad(
                lambda p: self.loss_fn(p, batch, rng, True), has_aux=True
            )(params)
            updates, opt_state = self._tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        @jax.jit
        def eval_step(params, batch, rng):
            return self.loss_fn(params, batch, rng, False)

        self._train_step = train_step
        self._eval_step = eval_step

    def init_state(self, params) -> TrainState:
        opt_state = self._tx.init(params)
        return TrainState(
            params=params,
            opt_state=opt_state,
            lr=self.config.learning_rate,
            best_params=params,
        )

    def _set_lr(self, opt_state, lr):
        return optax.tree_utils.tree_set(opt_state, learning_rate=lr)

    def run_epoch(self, state: TrainState, train_iter, rng):
        losses, auxes = [], []
        params, opt_state = state.params, state.opt_state
        for batch in train_iter:
            rng, sub = jax.random.split(rng)
            params, opt_state, loss, aux = self._train_step(
                params, opt_state, batch, sub
            )
            losses.append(loss)
            auxes.append(aux)
        state.params, state.opt_state = params, opt_state
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        return mean_loss, auxes, rng

    def evaluate(self, state: TrainState, dev_iter, rng):
        losses, auxes = [], []
        for batch in dev_iter:
            rng, sub = jax.random.split(rng)
            loss, aux = self._eval_step(state.params, batch, sub)
            losses.append(loss)
            auxes.append(aux)
        return (
            float(jnp.mean(jnp.stack(losses))) if losses else 0.0,
            auxes,
            rng,
        )

    def fit(
        self,
        state: TrainState,
        make_train_iter: Callable[[], Any],
        make_dev_iter: Callable[[], Any],
        *,
        log_fn: Callable[[str], None] = print,
        checkpoint_fn: Callable[[TrainState], None] | None = None,
    ) -> TrainState:
        rng = jax.random.key(self.config.seed)
        cfg = self.config
        while state.epoch < cfg.epochs:
            tr_loss, _, rng = self.run_epoch(state, make_train_iter(), rng)
            dev_loss, _, rng = self.evaluate(state, make_dev_iter(), rng)
            state.epoch += 1
            state.history.append(
                {"epoch": state.epoch, "train_loss": tr_loss,
                 "dev_loss": dev_loss, "lr": state.lr}
            )
            # LR-halve-and-revert (reference :248-262)
            if dev_loss > state.best_dev_loss * (1.0 + cfg.lr_tol):
                state.lr = max(state.lr * cfg.lrr, cfg.min_lr)
                # best_params is a host snapshot (the device buffers were
                # donated away); re-place it on device with the shardings
                # it had when snapshotted
                state.params = (
                    jax.device_put(state.best_params, state.best_shardings)
                    if state.best_shardings is not None
                    else jax.device_put(state.best_params)
                )
                state.opt_state = self._set_lr(state.opt_state, state.lr)
                log_fn(
                    f"epoch {state.epoch}: dev regressed "
                    f"({dev_loss:.5f} > {state.best_dev_loss:.5f}); "
                    f"lr -> {state.lr:.2e}, weights reverted"
                )
            else:
                state.best_dev_loss = dev_loss
                state.best_params = jax.device_get(state.params)
                # step outputs are jax.Arrays; params can still be host
                # numpy if no step ran (resume + empty epoch)
                state.best_shardings = (
                    jax.tree.map(lambda x: x.sharding, state.params)
                    if all(hasattr(leaf, "sharding")
                           for leaf in jax.tree.leaves(state.params))
                    else None
                )
                log_fn(
                    f"epoch {state.epoch}: train {tr_loss:.5f} "
                    f"dev {dev_loss:.5f} lr {state.lr:.2e}"
                )
            if checkpoint_fn is not None:
                checkpoint_fn(state)
        return state
