"""Config-driven multichannel enhancement front-end for the corpus
recipes (recipes/run_corpus.py stage 0).

The native analogue of the reference's recipe-internal enhancement chain
(/root/reference/e2e/reverb/run_fdlp_e1.sh:130-138: run_wpe.sh ->
run_beamform.sh -> compute_se_scores.sh; the GEV beamformer follows
recipes/chime4/local/nn-gev/beamform.py). The compute path is the
on-device chain (enhance/onchip.py): STFT -> WPE -> masks -> GEV/MVDR
(+BAN, +phase correction) -> iSTFT runs as one jitted program per
utterance length, so no complex array ever crosses the host boundary
(the axon backend cannot transfer complex buffers and a bare eager FFT
wedges the device — NOTES.md).

Mask estimation: quantile masks by default (in-jit); the reference's
BLSTM mask-net (nn-gev) is used instead when a trained model is
available — `maybe_mask_model` loads <expdir>/mask_model or trains one
from the train set's parallel clean/noise scps (clean_wav.scp +
noise_wav.scp, the simulated-data layout) exactly like
enhance/mask_model.train_mask_estimator's nn-gev flow.

Compile note: the jitted chain re-specialises per distinct (channels,
samples) shape. Corpora with many distinct lengths pay one compile per
length — bucket or sort your wav.scp by length if that matters; the
per-utterance Python loop mirrors the reference's own per-utterance
enhancement scripts.
"""

import functools
import json
import os

import numpy as np

from speech_recognition_tools_tpu.io.wav import read_wav_scp_entry


def read_multichannel_scp(scp_path):
    """wav.scp where each value is one or more whitespace-separated wav
    entries (one per channel); a single entry pointing at a multichannel
    wav also works (its columns become the channels).

    Returns {utt: [entry, ...]} in file order."""
    out = {}
    with open(scp_path) as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if not parts:
                continue
            utt, rest = parts[0], parts[1] if len(parts) > 1 else ""
            if rest.endswith("|"):
                entries = [rest]  # a shell pipe is one entry
            else:
                entries = rest.split()
            out[utt] = entries
    return out


def load_channels(entries, srate=None, with_scale=False):
    """Load scp entries into a (channels, samples) float64 stack.

    with_scale=True also returns whether the source samples are
    float-scale IEEE audio ([-1, 1]) — decided from the wav dtype, NOT
    from the amplitude, so a near-silent int16 utterance is never
    misclassified (and then blown up to full scale) downstream. Shell
    pipes lose the container dtype in transit; they fall back to the
    amplitude heuristic (peak <= 1)."""
    from scipy.io.wavfile import read as wav_read

    sigs, float_kinds = [], []
    for e in entries:
        if e.endswith("|"):
            _, s = read_wav_scp_entry(
                e, expected_srate=srate, keep_channels=True
            )
            sigs.append(s.T if s.ndim > 1 else s[None])
            float_kinds.append(np.max(np.abs(s)) <= 1.0 + 1e-6)
            continue
        sr, s = wav_read(e)
        if srate is not None and sr != srate:
            raise ValueError(f"{e}: sample rate {sr} != {srate}")
        float_kinds.append(s.dtype.kind == "f")
        s = np.asarray(s, np.float64)
        sigs.append(s.T if s.ndim > 1 else s[None])
    n = min(s.shape[-1] for s in sigs)
    stack = np.concatenate([s[:, :n] for s in sigs], axis=0)
    if with_scale:
        return stack, all(float_kinds)
    return stack


@functools.lru_cache(maxsize=8)
def _chain_fn(enh_key):
    """Build the jitted waveform->waveform enhancement program for a
    frozen (JSON) enhancement config. External (non-quantile) masks are
    passed as real arrays; quantile masks are computed in-jit.

    Cached per config key so the per-utterance call in
    enhance_utterance reuses ONE pair of jitted closures — jax caches
    compilations by function identity, so rebuilding the closures would
    recompile the whole STFT->WPE->masks->beamform->iSTFT program for
    every utterance instead of once per (config, shape)."""
    import jax
    import jax.numpy as jnp

    from speech_recognition_tools_tpu.enhance.onchip import (
        gev_beamform_onchip,
        mvdr_beamform_onchip,
        quantile_mask_onchip,
        wpe_onchip,
    )
    from speech_recognition_tools_tpu.enhance.stft import istft, stft

    enh = json.loads(enh_key)
    wpe = enh.get("wpe")
    bf = enh.get("beamform")

    def maybe_wpe(x):
        if not wpe:
            return x
        n = x.shape[-1]
        size = int(wpe.get("size", 512))
        shift = int(wpe.get("shift", 128))
        X = stft(x, size=size, shift=shift)  # (D, T, F)
        Xf = wpe_onchip(
            jnp.transpose(X, (2, 0, 1)),
            taps=int(wpe.get("taps", 10)),
            delay=int(wpe.get("delay", 3)),
            iterations=int(wpe.get("iterations", 5)),
        )
        return istft(
            jnp.transpose(Xf, (1, 2, 0)), size=size, shift=shift
        )[..., :n]

    @jax.jit
    def run(x, sm, nm):
        # x: (D, n) f32; sm/nm: (T, F) f32 external masks or (0, 0)
        # placeholders selecting the in-jit quantile masks
        n = x.shape[-1]
        x = maybe_wpe(x)
        if not bf:
            return x[0]
        size = int(bf.get("size", 1024))
        shift = int(bf.get("shift", 256))
        X = stft(x, size=size, shift=shift)  # (D, T, F)
        if sm.size:
            spf, nzf = sm.T, nm.T  # (F, T)
        else:
            sp = quantile_mask_onchip(X)
            spf = jnp.median(jnp.transpose(sp, (2, 0, 1)), axis=1)
            nzf = 1.0 - spf
        Xf = jnp.transpose(X, (2, 0, 1))  # (F, D, T)
        if bf.get("type", "gev") == "mvdr":
            Yf = mvdr_beamform_onchip(Xf, spf, nzf)
        else:
            Yf = gev_beamform_onchip(
                Xf, spf, nzf, ban=bool(bf.get("ban", True)),
                phase_correct=bool(bf.get("phase_correct", True)),
            )
        return istft(jnp.transpose(Yf, (1, 0)), size=size, shift=shift)[:n]

    @jax.jit
    def stft_mag(x):
        # magnitudes for the host-side BLSTM mask net (real arrays only
        # cross the boundary). WPE runs FIRST so the masks describe the
        # same dereverberated signal run() beamforms — matching the
        # documented STFT -> WPE -> masks -> GEV chain.
        x = maybe_wpe(x)
        size = int(bf.get("size", 1024))
        shift = int(bf.get("shift", 256))
        return jnp.abs(stft(x, size=size, shift=shift))

    return run, stft_mag


def enhance_utterance(signals, enh_cfg, mask_fn=None):
    """(channels, samples) -> (samples,) enhanced float32.

    mask_fn: optional callable (C, T, F) magnitudes -> (speech (T, F),
    noise (T, F)) masks (e.g. a trained BLSTM via
    enhance.mask_model.estimate_masks); None = in-jit quantile masks."""
    import jax.numpy as jnp

    run, stft_mag = _chain_fn(json.dumps(enh_cfg, sort_keys=True))
    x = jnp.asarray(np.asarray(signals, np.float32))
    if mask_fn is not None and enh_cfg.get("beamform"):
        mag = np.asarray(stft_mag(x))
        sm, nm = mask_fn(mag)
        sm = jnp.asarray(np.asarray(sm, np.float32))
        nm = jnp.asarray(np.asarray(nm, np.float32))
    else:
        sm = nm = jnp.zeros((0, 0), jnp.float32)
    return np.asarray(run(x, sm, nm), np.float32)


def maybe_mask_model(enh_cfg, exp_dir, train_dir=None, srate=16000,
                     log=print):
    """Resolve the configured mask model to a mask_fn (or None).

    beamform.mask_model == 'blstm': load <exp_dir>/mask_model if it
    exists; else train one from the train set's parallel clean/noise
    scps (clean_wav.scp + noise_wav.scp — the nn-gev simulated-data
    flow) and save it; else fall back to quantile masks with a note."""
    bf = enh_cfg.get("beamform") or {}
    if bf.get("mask_model") != "blstm":
        return None
    import jax

    from speech_recognition_tools_tpu.enhance.mask_model import (
        BLSTMMaskEstimator,
        estimate_masks,
        train_mask_estimator,
    )
    from speech_recognition_tools_tpu.train import (
        load_checkpoint,
        save_checkpoint,
    )

    size = int(bf.get("size", 1024))
    shift = int(bf.get("shift", 256))
    bins = size // 2 + 1
    hidden = int(bf.get("mask_hidden", 64))
    model = BLSTMMaskEstimator(bins=bins, hidden=hidden)
    ckpt = os.path.join(exp_dir, "mask_model")

    def _load():
        import jax.numpy as jnp

        y0 = jax.numpy.zeros((1, 4, bins), jnp.float32)
        template = model.init(
            {"params": jax.random.key(0)}, y0, jnp.asarray([4])
        )
        payload, _ = load_checkpoint(ckpt, template={"params": template})
        return payload["params"]

    if os.path.exists(os.path.join(ckpt, "state.msgpack")):
        params = _load()
        log(f"mask model: loaded {ckpt}")
    else:
        clean_scp = train_dir and os.path.join(train_dir, "clean_wav.scp")
        noise_scp = train_dir and os.path.join(train_dir, "noise_wav.scp")
        if not (clean_scp and os.path.exists(clean_scp)
                and os.path.exists(noise_scp)):
            log("mask model 'blstm' configured but no trained model and "
                "no parallel clean_wav.scp/noise_wav.scp in the train set "
                "— falling back to quantile masks")
            return None
        from speech_recognition_tools_tpu.enhance.stft import stft

        def pairs(scp):
            return read_multichannel_scp(scp)

        cl, nz = pairs(clean_scp), pairs(noise_scp)
        examples = []
        for utt in cl:
            if utt not in nz:
                continue
            c = load_channels(cl[utt], srate)[0]
            n = load_channels(nz[utt], srate)[0]
            m = min(len(c), len(n))
            examples.append((
                np.asarray(stft(c[:m], size=size, shift=shift)),
                np.asarray(stft(n[:m], size=size, shift=shift)),
            ))
        if not examples:
            log("mask model: no overlapping clean/noise utts — falling "
                "back to quantile masks")
            return None
        model, params, losses = train_mask_estimator(
            examples, bins, hidden=hidden,
            epochs=int(bf.get("mask_epochs", 8)), log_fn=log,
        )
        save_checkpoint(exp_dir, "mask_model", params,
                        {"bins": bins, "hidden": hidden})
        log(f"mask model: trained on {len(examples)} pairs "
            f"(bce {losses[0]:.4f} -> {losses[-1]:.4f}) -> {ckpt}")

    def mask_fn(mag_per_channel):
        return estimate_masks(model, params, mag_per_channel)

    return mask_fn


def run_enhancement(scp_path, out_dir, enh_cfg, srate, mask_fn=None,
                    log=print):
    """Enhance every utterance of a multichannel wav.scp.

    Writes <out_dir>/<utt>.wav (16-bit) + <out_dir>/wav.scp and returns
    the new scp path. Single-channel utterances pass through untouched
    (copied into the scp as-is) so mixed corpora work."""
    from scipy.io.wavfile import write as wav_write

    os.makedirs(out_dir, exist_ok=True)
    scp = read_multichannel_scp(scp_path)
    lines = []
    for utt, entries in scp.items():
        sigs, float_scale = load_channels(entries, srate, with_scale=True)
        if sigs.shape[0] == 1:
            lines.append(f"{utt} {entries[0]}")
            continue
        y = enhance_utterance(sigs, enh_cfg, mask_fn=mask_fn)
        peak = np.max(np.abs(y)) + 1e-9
        if float_scale:
            # float-scale input ([-1, 1] IEEE wavs): the standard
            # float -> int16 mapping, clip-guarded against beamformer
            # gain. NOT normalized to the output peak — a quiet
            # utterance must stay quiet, not become full-scale noise.
            scale = min(30000.0, 30000.0 / peak)
        else:
            scale = min(1.0, 30000.0 / peak)  # only attenuate int-scale
        path = os.path.join(out_dir, f"{utt}.wav")
        wav_write(path, srate, (y * scale).astype(np.int16))
        lines.append(f"{utt} {path}")
    out_scp = os.path.join(out_dir, "wav.scp")
    with open(out_scp, "w") as f:
        f.write("\n".join(lines) + "\n")
    log(f"enhanced {len(lines)} utts -> {out_scp}")
    return out_scp


def se_scores(enhanced_scp, clean_scp, metrics, srate, log=print):
    """Per-set speech-enhancement scores vs clean references — the
    compute_se_scores.sh analogue. Returns {metric: mean}."""
    from speech_recognition_tools_tpu.eval.enhancement_metrics import (
        cepsdist,
        fwsegsnr,
        lpcllr,
        sdr,
        stoi,
    )
    from speech_recognition_tools_tpu.eval.srmr import srmr
    from speech_recognition_tools_tpu.io.native import pesq

    enh = read_multichannel_scp(enhanced_scp)
    clean = read_multichannel_scp(clean_scp)
    acc = {m: [] for m in metrics}
    for utt, entries in enh.items():
        if utt not in clean:
            continue
        deg = load_channels(entries, srate)[0]
        ref = load_channels(clean[utt], srate)[0]
        n = min(len(ref), len(deg))
        ref, deg = ref[:n], deg[:n]
        for m in metrics:
            try:
                if m == "pesq":
                    v = pesq(ref, deg, srate)
                elif m == "stoi":
                    v = stoi(ref, deg, srate)
                elif m == "estoi":
                    v = stoi(ref, deg, srate, extended=True)
                elif m == "srmr":
                    v = srmr(deg, srate)
                elif m == "fwsegsnr":
                    v = fwsegsnr(deg, ref, srate)[0]
                elif m == "cepsdist":
                    v = cepsdist(deg, ref, srate)[0]
                elif m == "lpcllr":
                    v = lpcllr(deg, ref, srate)[0]
                elif m == "sdr":
                    v = sdr(ref, deg)
                else:
                    continue
            except Exception as e:
                log(f"se_scores: {m}({utt}) failed: {e}")
                continue
            acc[m].append(float(v))
    return {m: (float(np.mean(v)) if v else None) for m, v in acc.items()}
