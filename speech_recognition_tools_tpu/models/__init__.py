"""Flax model zoo.

Feature-for-feature coverage of the reference's PyTorch zoo
(/root/reference/src/nnet/nnet_models.py, nnet_models_cnn.py — ~40 classes,
SURVEY.md §2.2), re-designed for TPU: masked GRU stacks instead of
pack_padded_sequence, functional PRNG for samplers, static shapes with
length masks, and functional parameter growth for lifelong learning
(CURL expand_component) instead of in-place module mutation.

All sequence models share the convention:
    forward(inputs (B, T, D), lengths (B,)) -> outputs over padded time,
with padded positions to be masked by the loss/metric.
"""

from speech_recognition_tools_tpu.models.recurrent import (
    GRUStack,
    FeedforwardClassifier,
    LinearConvStack,
    RNNClassifier,
    RNNSubnet,
    MultistreamRNN,
    EncoderRNN,
    DecoderRNN,
    AEClassifierMultitask,
    AEClassifierMultitaskAEAR,
    AutoencoderRNN,
)
from speech_recognition_tools_tpu.models.vae import (
    VAEEncoder,
    VAEDecoder,
    VAEEncoderTransformer,
    VAEDecoderTransformer,
    sample_latent,
    VAE,
    VAEClassifier,
    ARVAE,
    VAEEncodedClassifier,
    vae_loss,
)
from speech_recognition_tools_tpu.models.curl import (
    CurlEncoder,
    CurlDecoder,
    CurlDecoderMultistream,
    sample_curl_latent,
    CurlSupervised,
    CurlMultistreamClassifier,
    CurlMultistreamClassifierEP,
    CurlEncodedClassifier,
    compute_latent_features,
    curl_params_to_ep,
    expand_component,
)
from speech_recognition_tools_tpu.models.modnet import (
    ModnetEncoder,
    ModnetClassifier,
    ModulationNet,
    ModnetSigmoidEncoder,
    ModulationSigmoidNet,
    gumbel_softmax,
)
from speech_recognition_tools_tpu.models.cnn import (
    CnnClassifier,
    CNNFrameClassifier,
    CLDNN,
    CLDNN3D,
    VAECNN,
    VAECNNNopool,
    CNNAE,
    RateScaleConv,
    RateScaleConvTranspose,
    VaeRsModulation,
)
from speech_recognition_tools_tpu.models.ngram_lm import (
    NgramLM,
    read_arpa,
    train_ngram_lm,
    write_arpa,
)
