"""Shared utilities: CMVN, splicing, config, logging."""

from speech_recognition_tools_tpu.utils.splice import splice_feats
from speech_recognition_tools_tpu.utils.cmvn import (
    cmvn_stats,
    apply_cmvn,
    cmvn_stats_masked,
)
from speech_recognition_tools_tpu.utils.transforms import (
    add_deltas,
    estimate_pca,
    apply_pca,
)
from speech_recognition_tools_tpu.utils.profiling import (
    trace,
    annotate,
    ThroughputMeter,
)
