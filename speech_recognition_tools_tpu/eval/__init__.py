"""Evaluation: WER/FER scoring and enhancement metrics."""

from speech_recognition_tools_tpu.eval.wer import (
    edit_distance_csid,
    wer_from_csid,
    score_hypotheses,
    parse_kaldi_per_utt,
    per_utt_fer,
)
from speech_recognition_tools_tpu.eval.enhancement_metrics import (
    cepsdist,
    lpcllr,
    fwsegsnr,
    stoi,
    sdr,
)
from speech_recognition_tools_tpu.eval.srmr import srmr
from speech_recognition_tools_tpu.eval.info_theory import (
    feats_minmax,
    signal_label_histogram,
    mark_transitions,
    combine_histograms,
    mutual_information,
)
