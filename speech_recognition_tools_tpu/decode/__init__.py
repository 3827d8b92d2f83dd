"""Decoding: native WFST stack + greedy / Viterbi paths + ark bridge.

The reference's decode is Kaldi `latgen-faster-mapped` over exported
log-likelihood arks after `mkgraph.sh` (decode_dnn.sh:121-143). The
native stack replaces both stages: decode/graph.py statically expands
HMM x lexicon x n-gram into one WFST and native/fst_decode.cpp runs the
beam-Viterbi search (decode/wfst.py). The export edge is kept
(io.write_ark_scp of infer.genclassifier_outputs) for interop with an
external Kaldi decode, and batched greedy/dense-Viterbi decoders cover
lattice-free use on-device.
"""

from speech_recognition_tools_tpu.decode.viterbi import (
    viterbi_decode,
    greedy_decode,
    collapse_repeats,
)
from speech_recognition_tools_tpu.decode.export import export_loglikes_ark
from speech_recognition_tools_tpu.decode.graph import (
    DecodingGraph,
    GraphConfig,
    build_decoding_graph,
)
from speech_recognition_tools_tpu.decode.wfst import WfstDecoder
from speech_recognition_tools_tpu.decode.wordlm import (
    LookaheadWordLM,
    make_lexical_tree,
    word_vocab_from_dict,
)
