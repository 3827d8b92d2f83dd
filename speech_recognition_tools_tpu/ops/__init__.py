"""Low-level numeric kernels shared by the DSP layer.

Everything here is shape-static, jit/vmap-friendly JAX. The hot FDLP chain
(autocorrelation -> Levinson-Durbin -> LPC cepstrum -> pole-model envelope ->
overlap-add) lives in these modules so `dsp/` stays a thin composition layer.
"""

from speech_recognition_tools_tpu.ops.windows import hamming, hanning, square_window
from speech_recognition_tools_tpu.ops.framing import (
    frame_count,
    frame_params,
    frame_signal,
)
from speech_recognition_tools_tpu.ops.autocorr import circular_autocorr
from speech_recognition_tools_tpu.ops.levinson import levinson_durbin, lpc_from_autocorr
from speech_recognition_tools_tpu.ops.cepstrum import lpc_to_cepstrum
from speech_recognition_tools_tpu.ops.ola import overlap_add
