"""Kaldi-format interop and data ingestion.

The reference round-trips every artifact through Kaldi binaries
(copy-feats text->binary ark, kaldi_io piped reads — SURVEY.md §2 L2);
here ark/scp are read and written natively so the featgen -> egs -> train
pipeline has no subprocess edge, while staying byte-compatible with Kaldi
for interop with external decoders.
"""

from speech_recognition_tools_tpu.io.kaldi_ark import (
    read_ark,
    read_scp_entry,
    write_ark_scp,
    read_mat_scp,
    read_vec_int_ark,
    write_vec_int_ark,
)
from speech_recognition_tools_tpu.io.scp import read_scp, write_scp, read_segments
from speech_recognition_tools_tpu.io.wav import read_wav_scp_entry, load_wav_batch
from speech_recognition_tools_tpu.io.torch_import import (
    convert_state_dict,
    import_torch_checkpoint,
)
from speech_recognition_tools_tpu.io.egs import (
    EgsConfig,
    build_egs,
    build_frame_egs,
    iter_egs_batches,
    iter_egs_batches_multi,
    iter_frame_batches,
    load_egs,
    load_egs_multi,
)
