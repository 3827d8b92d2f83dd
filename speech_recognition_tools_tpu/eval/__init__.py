"""Evaluation: WER/FER scoring and enhancement metrics."""

from speech_recognition_tools_tpu.eval.wer import (
    edit_distance_csid,
    wer_from_csid,
    score_hypotheses,
    parse_kaldi_per_utt,
    per_utt_fer,
)
