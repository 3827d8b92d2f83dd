"""Unsupervised test-time adaptation driven by a frozen PM autoencoder.

Parity target: the nnet_adapt_*.py family (14 scripts, SURVEY.md §2.3;
core loop nnet_adapt_ae.py:224-318): run the acoustic model on unlabeled
test utterances, mean-normalise its outputs (logits or layer taps) with the
PM training CMVN, feed them through a *frozen* RNN autoencoder, and
fine-tune the AM so the PM reconstruction loss (optionally of the
time-shifted sequence) is minimised.

JAX re-design: the reference freezes the PM with requires_grad=False; here
it is structural — the adaptation step takes grad only w.r.t. the AM
params while the PM params are a closed-over constant. One `AdaptConfig`
covers the script variants:
  time_shift        nnet_adapt_ae.py (AR prediction shift)
  time_shifts list  nnet_adapt_multishift_*.py (sum over shifts)
  layers            nnet_adapt_*multilayer*.py (multiple embedding taps,
                    one PM per tap)
  l2_source weight  nnet_adapt_*_regularized.py (L2 pull to source params)
  contrastive       nnet_adapt_contrastive_*.py (pos/neg ratio loss)
  supervised_weight lightly-supervised variants (CE on provided labels)
  mm_weight         nnet_adapt_feedforward_AEPC.py (:275-277: loss =
                    AE recon - mm_weight * M-measure of the posteriors,
                    del_list [5,25,45,65] — adaptation also *maximises*
                    posterior self-dissimilarity across frame deltas)
"""

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from speech_recognition_tools_tpu.train.losses import masked_cross_entropy
from speech_recognition_tools_tpu.train.optim import make_optimizer


@dataclass(frozen=True)
class AdaptConfig:
    optimizer: str = "adam"
    learning_rate: float = 1e-4
    time_shift: int = 0
    time_shifts: tuple = ()  # multishift variant; () = use time_shift only
    loss: str = "mse"  # 'mse' | 'l1'
    l2_source: float = 0.0  # pull-to-source regulariser
    contrastive: bool = False
    neg_weight: float = 1.0
    supervised_weight: float = 0.0  # CE weight for lightly-supervised
    mm_weight: float = 0.0  # M-measure weight (AEPC variant)
    mm_deltas: tuple = (5, 25, 45, 65)


def _recon_loss(kind, pred, target):
    if kind == "l1":
        return jnp.mean(jnp.abs(pred - target))
    return jnp.mean((pred - target) ** 2)


def _framewise(kind, pred, target):
    if kind == "l1":
        return jnp.mean(jnp.abs(pred - target), axis=-1)
    return jnp.mean((pred - target) ** 2, axis=-1)


def make_adapt_step(
    am_apply: Callable,
    pm_apply: Callable,
    pm_params: Any,
    pm_mean,
    cfg: AdaptConfig = AdaptConfig(),
    source_params: Any = None,
):
    """Build the jitted adaptation step.

    Args:
      am_apply: (params, feats, lengths) -> logits or (embeds, logits).
      pm_apply: (pm_params, seq, lengths) -> reconstruction (extra outputs
        such as AutoencoderRNN's bottleneck are ignored).
      pm_mean: (D,) CMVN mean of the PM's training inputs.
      source_params: AM params snapshot for the L2 regulariser.

    Returns step(params, opt_state, batch) -> (params, opt_state, loss);
    batch = dict(feats, lengths[, labels]).
    """
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    shifts = tuple(cfg.time_shifts) or ((cfg.time_shift,) if cfg.time_shift else ())
    pm_mean = jnp.asarray(pm_mean)

    def pm_recon(seq, lengths):
        out = pm_apply(pm_params, seq, lengths)
        return out[0] if isinstance(out, tuple) else out

    def loss_fn(params, batch):
        feats, lengths = batch["feats"], batch["lengths"]
        out = am_apply(params, feats, lengths)
        logits = out[1] if isinstance(out, tuple) else out
        post = logits - pm_mean

        def shifted_loss(ts):
            if ts == 0:
                recon = pm_recon(post, lengths)
                return _recon_loss(cfg.loss, recon, post)
            recon = pm_recon(post[:, :-ts, :], lengths - ts)
            return _recon_loss(cfg.loss, recon, post[:, ts:, :])

        if cfg.contrastive:
            max_ts = max(shifts) if shifts else 1
            recon = pm_recon(post, lengths)
            sl = slice(max_ts, -max_ts - 1)
            pos = _framewise(cfg.loss, recon[:, sl], post[:, sl])
            neg = jnp.zeros_like(pos)
            for t in shifts or (1,):
                neg += _framewise(
                    cfg.loss, recon[:, sl], post[:, max_ts + t : post.shape[1] - max_ts - 1 + t]
                )
                neg += _framewise(
                    cfg.loss, recon[:, sl], post[:, max_ts - t : post.shape[1] - max_ts - 1 - t]
                )
            neg = neg * cfg.neg_weight / (2 * max(len(shifts), 1))
            loss = jnp.mean(pos / jnp.maximum(neg, 1e-8))
        elif shifts:
            loss = sum(shifted_loss(t) for t in shifts) / len(shifts)
        else:
            loss = shifted_loss(0)

        if cfg.mm_weight:
            # AEPC variant: subtract the differentiable M-measure of the
            # AM posteriors so adaptation also pushes posteriors apart
            # across time deltas. Formula per delta follows the
            # reference's mmeasure_loss (nnet_adapt_feedforward_AEPC.py
            # :39-56) exactly: frame-mean symmetric KL *plus* its
            # element-mean KLDivLoss(X[:-d], X[d:]) term — torch's
            # KLDivLoss(input, target) = mean(target*(log target -
            # input)) with the reference (quirkily) passing raw probs as
            # input. Deliberate deviation: deltas are taken per
            # utterance under the length mask, where the reference
            # concatenates batch frames and lets deltas cross utterance
            # boundaries.
            p = jnp.maximum(jax.nn.softmax(logits, axis=-1), 1e-8)
            T, C = p.shape[1], p.shape[2]
            mm = 0.0
            for d in cfg.mm_deltas:
                if d >= T:
                    continue
                x, y = p[:, d:], p[:, :-d]
                valid = (
                    jnp.arange(T - d)[None, :] + d < lengths[:, None]
                ).astype(p.dtype)
                nvalid = jnp.maximum(jnp.sum(valid), 1.0)
                sym = jnp.sum(
                    x * (jnp.log(x) - jnp.log(y))
                    + y * (jnp.log(y) - jnp.log(x)),
                    axis=-1,
                )
                kld = jnp.sum(x * (jnp.log(x) - y), axis=-1)
                mm += (jnp.sum(sym * valid) / nvalid
                       + jnp.sum(kld * valid) / (nvalid * C))
            loss = loss - cfg.mm_weight * mm / len(cfg.mm_deltas)
        if cfg.l2_source and source_params is not None:
            sq = jax.tree.map(lambda a, b: jnp.sum((a - b) ** 2), params, source_params)
            loss = loss + cfg.l2_source * sum(jax.tree.leaves(sq))
        if cfg.supervised_weight and "labels" in batch:
            loss = loss + cfg.supervised_weight * masked_cross_entropy(
                logits, batch["labels"], lengths
            )
        return loss

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, tx


def adapt_model(
    am_apply,
    am_params,
    pm_apply,
    pm_params,
    pm_mean,
    batches,
    cfg: AdaptConfig = AdaptConfig(),
    epochs: int = 1,
    eval_fn: Callable | None = None,
    log_fn: Callable[[str], None] = print,
):
    """Run the adaptation loop (reference epochs loop :224-318).

    batches: callable returning an iterator of dict(feats, lengths, ...).
    eval_fn(params) -> dict of dev metrics, evaluated per epoch like the
    reference's labeled-dev FER tracking.
    Returns adapted params.
    """
    step, tx = make_adapt_step(
        am_apply, pm_apply, pm_params, pm_mean, cfg, source_params=am_params
    )
    params = am_params
    opt_state = tx.init(params)
    if eval_fn is not None:
        log_fn(f"epoch -1: {eval_fn(params)}")
    for epoch in range(epochs):
        losses = []
        for batch in batches():
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        msg = f"epoch {epoch}: pm loss {sum(losses)/max(len(losses),1):.5f}"
        if eval_fn is not None:
            msg += f" dev {eval_fn(params)}"
        log_fn(msg)
    return params
