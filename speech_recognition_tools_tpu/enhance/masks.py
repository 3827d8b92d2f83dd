"""Time-frequency mask estimation.

Parity targets in nn-gev/fgnt/mask_estimation.py: quantile (Lorenz) masks
(:115-131), simple ideal soft masks (:46-112), ideal binary masks with the
voiced/unvoiced split characteristic (:4-43, :133-185).
"""

import numpy as np


def voiced_unvoiced_split(nbins: int):
    """Voiced/unvoiced frequency weighting (reference :4-43)."""
    split_bin, transition_width = 200, 99
    fast_transition_width, low_bin, high_bin = 5, 4, 500

    a = np.pi / (transition_width - 1) * np.arange(transition_width)
    transition = 0.5 * (1 + np.cos(a))
    b = np.pi / (fast_transition_width - 1) * np.arange(fast_transition_width)
    fast_transition = (np.cos(b) + 1) / 2

    start = int(split_bin - transition_width / 2)
    voiced = np.ones(nbins)
    voiced[start - 1 : start + transition_width - 1] = transition
    voiced[start - 1 + transition_width :] = 0
    voiced[:low_bin] = 0
    voiced[low_bin - 1 : low_bin + fast_transition_width - 1] = 1 - fast_transition

    unvoiced = np.ones(nbins)
    unvoiced[start - 1 : start + transition_width - 1] = 1 - transition
    unvoiced[:start] = 0
    unvoiced[high_bin - 1 :] = 0
    unvoiced[high_bin - 1 : high_bin + fast_transition_width - 1] = fast_transition
    return voiced, unvoiced


def quantile_mask(observations, quantile_fraction=0.98, quantile_weight=0.999):
    """Lorenz-function quantile mask (reference :115-131)."""
    power = np.real(observations * np.conj(observations))
    sorted_power = np.sort(power, axis=None)[::-1]
    lorenz = np.cumsum(sorted_power) / np.sum(sorted_power)
    threshold = np.min(sorted_power[lorenz < quantile_fraction])
    mask = power > threshold
    return 0.5 + quantile_weight * (mask - 0.5)


def simple_ideal_soft_mask(*inputs, feature_dim=-2, source_dim=-1):
    """Power-ratio soft mask (reference :46-112): per-source share of the
    power summed over the feature (sensor) dimension. Pass either one
    stacked array or several same-shape source arrays (stacked here)."""
    if len(inputs) == 1:
        x = inputs[0]
    else:
        assert all(i.shape == inputs[0].shape for i in inputs)
        x = np.stack(inputs, axis=source_dim)
    power = np.sum(np.conj(x) * x, axis=feature_dim, keepdims=True)
    mask = np.real(power / np.sum(power, axis=source_dim, keepdims=True))
    return np.squeeze(mask, axis=feature_dim)


def estimate_ibm(
    X,
    N,
    threshold_unvoiced_speech=5,
    threshold_voiced_speech=0,
    threshold_unvoiced_noise=-10,
    threshold_voiced_noise=-10,
    low_cut=5,
    high_cut=500,
):
    """Ideal binary speech/noise masks (reference :133-185).

    X, N: (frames, bins) speech / noise STFTs.
    Returns (speech_mask, noise_mask) boolean arrays.
    """
    voiced, unvoiced = voiced_unvoiced_split(X.shape[-1])
    threshold = threshold_voiced_speech * voiced + threshold_unvoiced_speech * unvoiced
    threshold_new = (
        threshold_unvoiced_noise * voiced + threshold_voiced_noise * unvoiced
    )

    xpsd = np.real(X * np.conj(X))
    xpsd_t = xpsd / np.power(10, threshold / 10)
    xpsd_t_new = xpsd / np.power(10, threshold_new / 10)
    npsd = np.real(N * np.conj(N))

    speech_mask = np.logical_and(xpsd_t > npsd, xpsd_t > 0.005)
    speech_mask[..., : low_cut - 1] = 0
    speech_mask[..., high_cut:] = 0

    noise_mask = np.logical_or(xpsd_t_new < npsd, xpsd_t_new < 0.005)
    noise_mask[..., : low_cut - 1] = 1
    noise_mask[..., high_cut:] = 1
    return speech_mask, noise_mask
