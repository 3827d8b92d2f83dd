"""Log-likelihood export for external FST decoders.

Parity with decode_dnn.sh stage 0 (:104-116): dump per-utterance
log p(c|x) - prior_weight * log p(c) matrices to a Kaldi ark/scp pair that
`latgen-faster-mapped` consumes. This is the explicit external-decoder
integration point (SURVEY.md §2.5)."""

import numpy as np

from speech_recognition_tools_tpu.infer.posteriors import genclassifier_outputs
from speech_recognition_tools_tpu.io import write_ark_scp


def export_loglikes_ark(
    apply_fn,
    batches,
    out_base: str,
    log_prior=None,
    prior_weight: float = 0.8,
):
    """Run the AM over batches and write loglikes to ark/scp.

    batches: iterator of dict(feats, lengths, keys).
    apply_fn: (feats, lengths) -> logits (B, T, C).
    """
    feats_out = {}
    for batch in batches:
        logits = apply_fn(batch["feats"], batch["lengths"])
        ll = np.asarray(
            genclassifier_outputs(logits, log_prior, prior_weight)
        )
        for i, key in enumerate(batch["keys"]):
            n = int(batch["lengths"][i])
            feats_out[key] = ll[i, :n]
    return write_ark_scp(feats_out, out_base)
