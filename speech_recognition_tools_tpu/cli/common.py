"""Shared CLI machinery: scp -> padded wav batches -> featgen -> ark.

Replaces the reference's per-utterance python loop + queue.pl grid fan-out
(make_FDLPspectrum_feats.sh:89-177) with length-bucketed device batches on
one chip; multi-chip scaling shards the utterance axis over the mesh
(parallel.make_mesh) instead of splitting scp files.
"""

import sys

import numpy as np

from speech_recognition_tools_tpu.dsp.augment import (
    DIFF_FIR,
)
from speech_recognition_tools_tpu.io import (
    read_scp,
    read_segments,
    write_ark_scp,
)
from speech_recognition_tools_tpu.io.wav import read_wav_scp_entry


def load_signals(args, srate):
    """Load wavs (scp or segments mode) and apply host-side augmentation
    exactly like the reference CLIs (noise/reverb/diff before framing)."""
    from speech_recognition_tools_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    import scipy.signal

    entries = read_scp(args.scp)
    noise = None
    noise_snr = None
    if getattr(args, "add_noise", None) and args.add_noise not in ("clean", "diff"):
        noise_info = args.add_noise.strip().split(",")
        from scipy.io.wavfile import read as wav_read

        _, noise = wav_read(f"noises/{noise_info[0]}.wav")
        noise_snr = float(noise_info[1])
    rir = None
    if getattr(args, "add_reverb", None) and args.add_reverb != "clean":
        from scipy.io.wavfile import read as wav_read

        rir_files = {
            "small_room": "./RIR/RIR_SmallRoom1_near_AnglA.wav",
            "medium_room": "./RIR/RIR_MediumRoom1_far_AnglA.wav",
            "large_room": "./RIR/RIR_LargeRoom1_far_AnglA.wav",
        }
        _, rir = wav_read(rir_files[args.add_reverb])
        rir = rir[:, 1] / 2.0**15

    # segment mode: args.scp is a Kaldi segments file
    # ('utt recording start end') and --wav_scp maps recordings to wavs
    # (the reference resolves segments through `wav-copy`,
    # computeFDLPSpectrogram.py:146-149; computeModulationSpectrum_segments
    # caches the current recording — we do the same).
    segments = None
    if getattr(args, "scp_type", "wav") == "segment":
        wav_scp = getattr(args, "wav_scp", None)
        if not wav_scp:
            raise ValueError("--scp_type segment requires --wav_scp")
        recordings = dict(read_scp(wav_scp))
        segments = read_segments(args.scp)
        entries = None

    raw = []
    if segments is not None:
        cache_key, cache_sig = None, None
        for utt, rec, start, end in segments:
            if rec != cache_key:
                try:
                    _, cache_sig = read_wav_scp_entry(
                        recordings[rec], expected_srate=srate
                    )
                    cache_key = rec
                except Exception:
                    print(f"{sys.argv[0]}: skipping unreadable recording {rec}")
                    cache_key, cache_sig = None, None
                    continue
            seg = cache_sig[int(start * srate) : int(end * srate)]
            if len(seg):
                raw.append((utt, seg))
    else:
        for key, value in entries:
            try:
                _, sig = read_wav_scp_entry(value, expected_srate=srate)
            except Exception:
                print(f"{sys.argv[0]}: skipping unreadable entry {key}")
                continue
            raw.append((key, sig))

    out = []
    for key, sig in raw:
        if getattr(args, "add_noise", None):
            if args.add_noise == "diff":
                sig = scipy.signal.convolve(sig, DIFF_FIR, mode="same")
            elif args.add_noise != "clean" and noise is not None:
                off = int(np.floor(np.random.rand() * (len(noise) - len(sig))))
                ns = noise[off : off + len(sig)]
                e_s = np.mean(sig**2)
                e_n = np.mean(ns**2)
                alp = np.sqrt(e_s / (e_n * 10 ** (noise_snr / 10)))
                sig = sig + alp * ns
        if rir is not None:
            full = np.convolve(sig, rir)
            xxc = np.correlate(sig, full, "valid")
            ind = len(xxc) - np.argmax(xxc)
            sig = full[ind : ind + len(sig)]
        out.append((key, sig))
    return out


def run_batched(signals, batch_fn, batch_size=32, bucket_multiple=16000,
                data_parallel=False, meter=None, srate=None):
    """Bucket signals by length and run the jitted featgen per bucket batch.

    batch_fn(padded (B, Nmax), lens (B,)) -> (feats (B, T, D), nframes (B,)).
    Returns {utt: (T_i, D)}.

    data_parallel=True is the queue.pl replacement at CLI level: each
    bucket batch is padded to a multiple of the device count (repeating
    the last utterance; the copies' outputs are discarded) and placed
    sharded over the 'data' axis of an all-device mesh, so one program
    extracts on every chip — the reference fans the same work out as N
    grid jobs over scp shards (make_FDLPspectrum_feats.sh:89-116).
    """
    mesh = None
    if data_parallel:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from speech_recognition_tools_tpu.parallel import make_mesh

        if len(jax.devices()) > 1:
            mesh = make_mesh()
            bsh = NamedSharding(mesh, P("data"))

    order = np.argsort([len(s) for _, s in signals], kind="stable")
    signals = [signals[i] for i in order]
    feats = {}
    for i in range(0, len(signals), batch_size):
        group = signals[i : i + batch_size]
        rows = len(group)
        if mesh is not None:
            dpar = mesh.shape["data"]
            rows = ((rows + dpar - 1) // dpar) * dpar
        nmax = max(len(s) for _, s in group)
        nmax = ((nmax + bucket_multiple - 1) // bucket_multiple) * bucket_multiple
        batch = np.zeros((rows, nmax), np.float32)
        lens = np.zeros(rows, np.int32)
        for j in range(rows):
            # pad rows (discarded below) copy the bucket's SHORTEST
            # utterance — group is length-sorted, so group[0] minimises
            # the wasted frames
            _, s = group[j if j < len(group) else 0]
            batch[j, : len(s)] = s
            lens[j] = len(s)
        if mesh is not None:
            batch = jax.device_put(batch, bsh)
            lens = jax.device_put(lens, bsh)
        out, nframes = batch_fn(batch, lens)
        out = np.asarray(out)
        nframes = np.asarray(nframes)
        for j, (key, _) in enumerate(group):
            feats[key] = out[j, : int(nframes[j])]
        if meter is not None:
            meter.update(
                items=len(group),
                audio_seconds=(
                    float(np.sum(lens[: len(group)])) / srate
                    if srate else 0.0
                ),
            )
    return feats


def finish(args, feats, lens_attr="write_utt2num_frames", meter=None):
    """Write ark/scp (+ optional .len) like the reference CLIs."""
    write_ark_scp(feats, args.outfile)
    if getattr(args, lens_attr.replace("-", "_"), False):
        with open(args.outfile + ".len", "w") as f:
            for key, mat in feats.items():
                f.write(f"{key} {mat.shape[0]}\n")
    print(f"{sys.argv[0]}: wrote {len(feats)} utterances -> {args.outfile}.ark")
    if meter is not None:
        print(f"{sys.argv[0]}: {meter.summary()}")


def add_profiling_arg(parser):
    """The shared --profile_dir flag of the four featgen CLIs (kept in
    one place so help text and behavior cannot drift)."""
    parser.add_argument("--profile_dir",
                        help="capture a jax.profiler (xprof) trace of the "
                             "extraction into this dir")
    return parser


def profiled_extraction(args):
    """Observability wrapper shared by the featgen CLIs (SURVEY §5: the
    reference's only instrumentation is a wall-clock print,
    computeFDLPSpectrogram.py:264-271 — the TPU-era equivalents are a
    jax.profiler trace and utterances/sec / realtime-factor counters).
    Returns (context_manager, ThroughputMeter): the context captures an
    xprof trace into --profile_dir when given, else is a no-op."""
    import contextlib

    from speech_recognition_tools_tpu.utils.profiling import (
        ThroughputMeter,
        trace,
    )

    profile_dir = getattr(args, "profile_dir", None)
    ctx = trace(profile_dir) if profile_dir else contextlib.nullcontext()
    return ctx, ThroughputMeter()
