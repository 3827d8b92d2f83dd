"""Native forced alignment (flat-start + Viterbi realignment) — the
in-framework replacement for the reference's external Kaldi GMM
alignment pipeline (recipes/timit/run_get_hq_ali.sh -> ali-to-pdf,
consumed by src/nnet/data_prep_for_seq.py:66-88)."""

from speech_recognition_tools_tpu.align.forced import (
    HmmTopology,
    equal_align,
    read_lexicon,
    realign_corpus,
    trailing_optional,
    utterance_states,
    viterbi_align_batch,
)
