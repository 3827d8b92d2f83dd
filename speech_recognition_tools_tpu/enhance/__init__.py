"""Speech enhancement front-ends: STFT, mask estimation, MVDR/GEV
beamforming, WPE dereverberation (SURVEY.md §2.6)."""

from speech_recognition_tools_tpu.enhance.stft import (
    stft,
    istft,
    biorthogonal_synthesis_window,
)
from speech_recognition_tools_tpu.enhance.masks import (
    quantile_mask,
    simple_ideal_soft_mask,
    estimate_ibm,
    voiced_unvoiced_split,
)
from speech_recognition_tools_tpu.enhance.beamforming import (
    power_spectral_density_matrix,
    pca_vector,
    mvdr_vector,
    gev_vector,
    blind_analytic_normalization,
    apply_beamforming_vector,
    gev_beamform,
    mvdr_beamform,
)
from speech_recognition_tools_tpu.enhance.wpe import wpe_dereverberate
from speech_recognition_tools_tpu.enhance.onchip import (
    gev_beamform_onchip,
    mvdr_beamform_onchip,
    wpe_onchip,
    gev_enhance_chain,
)
from speech_recognition_tools_tpu.enhance.mask_model import (
    BLSTMMaskEstimator,
    SimpleFWMaskEstimator,
    mask_estimator_loss,
    train_mask_estimator,
)
