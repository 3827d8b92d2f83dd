"""Inference, performance monitoring, adaptation, lifelong decoding.

Covers the reference's L5 scripts (SURVEY.md §2.3): posterior/likelihood
dumping, class priors, powerset likelihood fusion for lifelong decoding
(+ per-frame / incremental / autoT variants), unsupervised test-time
adaptation driven by a frozen PM autoencoder, PM confidence scoring and
the decoder-free m-measure.
"""

from speech_recognition_tools_tpu.infer.posteriors import (
    extract_posteriors,
    genclassifier_outputs,
    compute_log_prior_from_counts,
    compute_log_prior_from_alignments,
)
from speech_recognition_tools_tpu.infer.lifelong import (
    framewise_vae_score,
    task_priors,
    lifelong_fusion_powerset,
    lifelong_fusion_incremental,
    lifelong_fusion_perframe,
    autoT_fusion,
    mmeasure_loss,
)
from speech_recognition_tools_tpu.infer.adapt import (
    AdaptConfig,
    make_adapt_step,
    adapt_model,
)
from speech_recognition_tools_tpu.infer.pm_score import (
    pm_score_reconstruction,
    pm_score_contrastive,
)
from speech_recognition_tools_tpu.infer.mmeasure import (
    compute_mmeasure,
    mmeasure_scores,
)
