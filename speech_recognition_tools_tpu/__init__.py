"""TPU-native speech recognition toolkit.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
sadhusamik/speech_recognition_tools: FDLP-family acoustic front-ends, an
acoustic-model zoo, generative performance monitoring, unsupervised test-time
adaptation and lifelong/continual decoding — built for TPU device meshes.

Subpackages
-----------
dsp       Feature extraction core (frames, filterbanks, FDLP, mel, MFCC,
          modulation spectra, augmentation) as batched XLA programs.
ops       Low-level numeric kernels (DCT, Levinson-Durbin scan, LPC cepstrum,
          overlap-add) shared by dsp; Pallas kernels live here.
io        Kaldi-format interop (scp/ark/segments), wav I/O, egs building.
models    Flax model zoo (feedforward/GRU/CNN/CLDNN/VAE/CURL/modnet/...).
train     Generic trainer, losses, LR-revert schedule, checkpointing.
infer     Posteriors, priors, likelihood fusion, lifelong decoding,
          PM scoring, test-time adaptation.
decode    Greedy/Viterbi decoding and ark export bridge to external FST
          decoders.
enhance   STFT, mask estimation, MVDR/GEV beamforming, WPE.
eval      WER/FER, m-measure, enhancement metrics (PESQ/STOI/SRMR/...).
parallel  Mesh construction, sharding rules, distributed launch.
utils     Config system, logging, CMVN, splicing.
"""

__version__ = "0.1.0"
