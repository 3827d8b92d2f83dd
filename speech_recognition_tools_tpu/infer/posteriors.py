"""Posterior / log-likelihood extraction and class priors.

Parity targets: extract_posterior.py (:39-68 — embeddings from any layer
counted from the end, or softmax posteriors), dump_genclassifier_outputs.py
(:100-106 — log-softmax minus prior_weight * log-prior for hybrid decode),
compute_log_prior.py (:20-40 — log class frequencies from alignments).
"""

import jax
import numpy as np


def extract_posteriors(apply_fn, feats, lengths, *, layer: int = 0,
                       add_softmax: bool = True):
    """Run an AM and return per-frame outputs.

    Args:
      apply_fn: feats, lengths -> (embeds_list, logits) or logits.
      layer: 0 = final logits; k>0 = k-th embedding layer from the end
        (reference extract_posterior.py counts from the end).
      add_softmax: apply softmax when layer == 0.
    """
    out = apply_fn(feats, lengths)
    if isinstance(out, tuple):
        embeds, logits = out
    else:
        embeds, logits = [], out
    if layer == 0:
        return jax.nn.softmax(logits, axis=-1) if add_softmax else logits
    return embeds[-layer]


def genclassifier_outputs(logits, log_prior=None, prior_weight: float = 0.8,
                          add_softmax: bool = False):
    """Hybrid-decode outputs: log p(c|x) - prior_weight * log p(c)
    (dump_genclassifier_outputs.py :100-106)."""
    if log_prior is not None:
        return jax.nn.log_softmax(logits, axis=-1) - prior_weight * log_prior
    if add_softmax:
        return jax.nn.softmax(logits, axis=-1)
    return logits


def compute_log_prior_from_counts(counts):
    counts = np.asarray(counts, np.float64)
    return np.log(counts / counts.sum())


def compute_log_prior_from_alignments(ali_iter, num_classes: int,
                                      ali_type: str = "pdf"):
    """Class log-priors from (utt, int-vector) alignments. ali_type='phone'
    shifts labels by -1 like the reference (ali-to-phones is 1-based)."""
    p = np.zeros(num_classes, np.float64)
    for _, ali in ali_iter:
        ali = np.asarray(ali)
        if ali_type == "phone":
            ali = ali - 1
        np.add.at(p, ali[(ali >= 0) & (ali < num_classes)], 1)
    return np.log(p / p.sum())
