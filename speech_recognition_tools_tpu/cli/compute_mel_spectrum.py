"""Mel spectrum CLI — flag parity with the reference
(/root/reference/src/featgen/computeMelSpectrum.py :20-37)."""

import argparse
import time


def get_parser():
    parser = argparse.ArgumentParser("Extract Mel Energy Features")
    parser.add_argument("scp")
    parser.add_argument("outfile")
    parser.add_argument("--scp_type", default="wav")
    parser.add_argument("--wav_scp", help="recording wav scp for --scp_type segment")
    parser.add_argument("--spectrum_type", default="log", help="log/power")
    parser.add_argument("--nfilters", type=int, default=23)
    parser.add_argument("--fduration", type=float, default=0.02)
    parser.add_argument("--frate", type=int, default=100)
    parser.add_argument("--nfft", type=int, default=1024)
    parser.add_argument("--add_reverb")
    parser.add_argument("--fbank_type", type=str, default="mel,1")
    parser.add_argument("--write_utt2num_frames", action="store_true")
    parser.add_argument("--add_noise")
    parser.add_argument("--srate", type=int, default=16000)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard each batch over all devices (one "
                             "program replaces the reference's queue.pl "
                             "scp-shard fan-out)")
    from speech_recognition_tools_tpu.cli.common import add_profiling_arg

    add_profiling_arg(parser)
    return parser


def main(argv=None):
    args = get_parser().parse_args(argv)
    start = time.time()
    from speech_recognition_tools_tpu.cli.common import (
        finish,
        load_signals,
        profiled_extraction,
        run_batched,
    )
    from speech_recognition_tools_tpu.dsp import MelConfig, mel_spectrum_batch

    cfg = MelConfig(
        srate=args.srate,
        nfilters=args.nfilters,
        fduration=args.fduration,
        frate=args.frate,
        nfft=args.nfft,
        spectrum_type=args.spectrum_type,
        fbank_type=args.fbank_type,
    )
    signals = load_signals(args, args.srate)
    ctx, meter = profiled_extraction(args)
    with ctx:
        feats = run_batched(
            signals,
            lambda b, l: mel_spectrum_batch(b, l, cfg),
            batch_size=args.batch_size,
            data_parallel=args.data_parallel,
            meter=meter, srate=args.srate,
        )
    finish(args, feats, meter=meter)
    print(f"Execution Time: {time.time() - start:.3f} seconds")


if __name__ == "__main__":
    main()
