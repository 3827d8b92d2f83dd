"""Feature-extraction core: batched XLA programs for the FDLP family.

Public surface mirrors the reference featgen capabilities
(`/root/reference/src/featgen/`): FDLP spectrogram, mel spectrum, MFCC,
FDLP modulation spectra, plus augmentation (noise/reverb) and filterbank
construction — all redesigned as static-shape batched JAX programs.
"""

from speech_recognition_tools_tpu.dsp.filterbanks import (
    mel_filterbank,
    cochlear_filterbank,
)
from speech_recognition_tools_tpu.dsp.fdlp import (
    FdlpConfig,
    fdlp_spectrogram_batch,
    fdlp_spectrogram_input_sharded,
    fdlp_spectrogram_sharded,
)
from speech_recognition_tools_tpu.dsp.streaming import StreamingFdlp
from speech_recognition_tools_tpu.dsp.melspec import MelConfig, mel_spectrum_batch
from speech_recognition_tools_tpu.dsp.mfcc import MfccConfig, mfcc_batch
from speech_recognition_tools_tpu.dsp.modspec import (
    ModSpecConfig,
    modulation_spectrum_batch,
)
from speech_recognition_tools_tpu.dsp.simulate import (
    fft_convolve_full,
    simulate_corpus,
    simulate_utterance,
    synth_rir,
)
