"""Numpy test oracles.

These import the *reference implementation's own functions* from
/root/reference/src/featgen (read-only mount) and drive them the way its CLI
drivers do, so our JAX programs can be golden-tested against the true CPU
behaviour. Oracle driver loops mirror the reference drivers
(computeFDLPSpectrogram.py getFeats :156-229, computeMelSpectrum.py :133-162,
computeMfccFeatures.py :113-133, computeModulationSpectrum.py :142-203) with
the OLA random jitter pinned to 0.
"""

import sys

import numpy as np
import scipy.fftpack as fftpack
from scipy.fftpack import fft

sys.path.insert(0, "/root/reference/src/featgen")

import features as ref  # noqa: E402  (reference features.py)


def oracle_fdlp(
    signal,
    srate=16000,
    nfilters=20,
    coeff_num=50,
    coeff_range="1,20",
    order=50,
    fduration=0.5,
    frate=100,
    overlap_fraction=0.25,
    fbank_type="mel,1",
    odd_mod_zero=False,
    window=np.hamming,
):
    fbank_parts = fbank_type.split(",")
    if fbank_parts[0] == "mel":
        fbank = ref.createFbank(
            nfilters, int(2 * fduration * srate), srate, warp_fact=float(fbank_parts[1])
        )
    else:
        fbank = ref.createFbankCochlear(
            nfilters,
            int(2 * fduration * srate),
            srate,
            om_w=float(fbank_parts[1]),
            alp=float(fbank_parts[2]),
            fixed=int(fbank_parts[3]),
            bet=float(fbank_parts[4]),
            warp_fact=float(fbank_parts[5]),
        )

    lowpass, highpass = (int(x) for x in coeff_range.split(","))
    mask = np.asarray(
        [1 if (lowpass <= i <= highpass) else 0 for i in range(coeff_num)]
    )
    ovl = 1 - overlap_fraction

    tframes = signal.shape[0]
    lfr = 1 / (ovl * fduration)
    time_frames = np.array(
        [frame for frame in ref.getFrames(signal, srate, lfr, fduration, window)]
    )
    cos_trans = fftpack.dct(time_frames) / np.sqrt(2 * int(srate * fduration))
    frame_num = cos_trans.shape[0]

    feats = np.zeros((nfilters, int(np.ceil(tframes * frate / srate))))
    ptr = int(0)
    for i in range(frame_num):
        for j in range(nfilters):
            filt = fbank[j, 0:-1]
            band_dct = filt * cos_trans[i, :]
            xlpc, gg = ref.computeLpcFast(band_dct, order)
            ms = ref.computeModSpecFromLpc(gg, xlpc, coeff_num)
            ms = ms * mask
            if odd_mod_zero:
                ms[1::2] = 0
            ms = fft(ms, 2 * int(fduration * frate))
            ms = np.abs(np.exp(ms))
            kk = int(np.round(fduration * frate))
            kkb2 = int(np.round(fduration * frate / 2))
            ms = ms[0:kk] * np.hanning(kk) / window(kk)
            if i == 0:
                if feats.shape[1] < kkb2:
                    feats[j, :] += ms[kkb2 : kkb2 + feats.shape[1]]
                else:
                    feats[j, ptr : ptr + kkb2] += ms[kkb2:]
            elif i == frame_num - 1 or i == frame_num - 2:
                if ms.shape[0] >= feats.shape[1] - ptr:
                    feats[j, ptr:] += ms[: feats.shape[1] - ptr]
                else:
                    feats[j, ptr : ptr + kk] += ms
            else:
                feats[j, ptr : ptr + kk] += ms
        kk = int(np.round(fduration * frate * ovl))
        kkb2 = int(np.round(fduration * frate / 2))
        if i == 0:
            ptr = int(ptr + kk - kkb2)
        else:
            ptr = int(ptr + kk)  # jitter randrange(2) pinned to 0
    return np.log(np.clip(feats.T, a_max=None, a_min=1e-14))


def oracle_melspec(
    signal,
    srate=16000,
    nfilters=23,
    fduration=0.02,
    frate=100,
    nfft=1024,
    spectrum_type="log",
    fbank_type="mel,1",
    window=np.hamming,
):
    parts = fbank_type.split(",")
    fbank = ref.createFbank(nfilters, nfft, srate, warp_fact=float(parts[1]))
    time_frames = np.array(
        [frame for frame in ref.getFrames(signal, srate, frate, fduration, window)]
    )
    mag = np.abs(fft(time_frames, nfft, axis=1)[:, : int(nfft / 2 + 1)])
    mel = np.matmul(mag, fbank.T)
    return np.log10(mel) if spectrum_type == "log" else mel**2


def oracle_mfcc(
    signal,
    srate=16000,
    nfilters=30,
    fduration=0.02,
    frate=100,
    nfft=1024,
    context=None,
    window=np.hamming,
):
    fbank = ref.createFbank(nfilters, nfft, srate)
    signal = signal / np.power(2, 15)
    time_frames = np.array(
        [frame for frame in ref.getFrames(signal, srate, frate, fduration, window)]
    )
    mel = np.log10(np.matmul(np.abs(fft(time_frames, int(nfft / 2 + 1), axis=1)), fbank.T))
    mfcc = fftpack.dct(mel, axis=1)[:, 0:13]
    if context:
        mfcc = ref.spliceFeats(mfcc, context)
    return mfcc


def oracle_modspec(
    signal,
    srate=16000,
    nfilters=15,
    coeff_0=5,
    coeff_n=30,
    order=50,
    fduration=0.5,
    frate=100,
    fbank_type="mel,1",
    keep_even=False,
    complex_modulation=False,
    compensate_noise=False,
    absolute_value=False,
    no_window=False,
):
    window = (lambda n: np.ones(n)) if no_window else np.hanning
    dur = int(fduration * srate) if complex_modulation else int(2 * fduration * srate)
    parts = fbank_type.split(",")
    fbank = ref.createFbank(nfilters, dur, srate, warp_fact=float(parts[1]))
    coeff_num = coeff_n - coeff_0 + 1
    if keep_even:
        temp = np.arange(0, coeff_num)
        feat_len = temp[1::2].shape[0] if coeff_0 % 2 == 0 else temp[0::2].shape[0]
    elif complex_modulation:
        feat_len = coeff_num if absolute_value else 2 * coeff_num
    else:
        feat_len = coeff_num
    if compensate_noise:
        fmax = coeff_num / fduration if complex_modulation else coeff_num / (2 * fduration)
        faxis = np.linspace(0, fmax, coeff_n)

    time_frames = np.array(
        [frame for frame in ref.getFrames(signal, srate, frate, fduration, window)]
    )
    if complex_modulation:
        cos_trans = fftpack.ifft(time_frames)[:, : int(fduration * srate / 2)]
    else:
        cos_trans = fftpack.dct(time_frames) / np.sqrt(2 * int(srate * fduration))
    frame_num = cos_trans.shape[0]
    feats = np.zeros((frame_num, nfilters * feat_len))
    for i in range(frame_num):
        each_feat = np.zeros([nfilters, feat_len])
        for j in range(nfilters):
            filt = fbank[j, 0:-1]
            band_dct = filt * cos_trans[i, :]
            if complex_modulation:
                xlpc, gg = ref.computeLpcFast(band_dct, order, keepreal=False)
                mod_spec = ref.computeModSpecFromLpc(gg, xlpc, coeff_n)
                if compensate_noise:
                    mod_spec = mod_spec * faxis
                if absolute_value:
                    temp2 = np.abs(mod_spec[coeff_0 - 1 : coeff_n])
                else:
                    temp2 = np.append(
                        np.real(mod_spec[coeff_0 - 1 : coeff_n]),
                        np.imag(mod_spec[coeff_0 - 1 : coeff_n]),
                    )
            else:
                xlpc, gg = ref.computeLpcFast(band_dct, order)
                mod_spec = np.real(ref.computeModSpecFromLpc(gg, xlpc, coeff_n))
                if compensate_noise:
                    mod_spec = mod_spec * faxis
                if absolute_value:
                    temp2 = np.abs(mod_spec[coeff_0 - 1 : coeff_n])
                else:
                    temp2 = mod_spec[coeff_0 - 1 : coeff_n]
            if keep_even:
                each_feat[j, :] = temp2[1::2] if coeff_0 % 2 == 0 else temp2[0::2]
            else:
                each_feat[j, :] = temp2
        feats[i, :] = each_feat.reshape(1, nfilters * feat_len)
    return feats
