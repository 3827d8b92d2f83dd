"""Decoding: native greedy / Viterbi paths + the ark export bridge.

The reference's decode is Kaldi `latgen-faster-mapped` over exported
log-likelihood arks (decode_dnn.sh:121-143). Here the export edge is kept
(io.write_ark_scp of infer.genclassifier_outputs) for external FST decoding
while native greedy and batched Viterbi decoders cover lattice-free use.
"""

from speech_recognition_tools_tpu.decode.viterbi import (
    viterbi_decode,
    greedy_decode,
    collapse_repeats,
)
from speech_recognition_tools_tpu.decode.export import export_loglikes_ark
