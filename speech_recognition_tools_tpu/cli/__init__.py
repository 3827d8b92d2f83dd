"""Command-line feature extractors, flag-compatible with the reference's
featgen scripts (computeFDLPSpectrogram.py, computeMelSpectrum.py,
computeMfccFeatures.py, computeModulationSpectrum.py) but running the whole
batch as one accelerator program and writing arks natively (no copy-feats
subprocess)."""
