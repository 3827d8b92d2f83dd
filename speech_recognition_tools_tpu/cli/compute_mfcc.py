"""MFCC CLI — flag parity with the reference
(/root/reference/src/featgen/computeMfccFeatures.py :138-150)."""

import argparse
import time


def get_parser():
    parser = argparse.ArgumentParser("Extract MFCC Features")
    parser.add_argument("scp")
    parser.add_argument("outfile")
    parser.add_argument("--nfilters", type=int, default=30)
    parser.add_argument("--fduration", type=float, default=0.02)
    parser.add_argument("--frate", type=int, default=100)
    parser.add_argument("--context", type=int)
    parser.add_argument("--nfft", type=int, default=1024)
    parser.add_argument("--add_reverb")
    parser.add_argument("--add_noise", default="none")
    parser.add_argument("--kaldi_cmd", help="ignored: arks written natively")
    parser.add_argument("--srate", type=int, default=16000)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard each batch over all devices (one "
                             "program replaces the reference's queue.pl "
                             "scp-shard fan-out)")
    parser.add_argument("--write_utt2num_frames", action="store_true")
    from speech_recognition_tools_tpu.cli.common import add_profiling_arg

    add_profiling_arg(parser)
    return parser


def main(argv=None):
    args = get_parser().parse_args(argv)
    if args.add_noise == "none":
        args.add_noise = None
    start = time.time()
    from speech_recognition_tools_tpu.cli.common import (
        finish,
        load_signals,
        profiled_extraction,
        run_batched,
    )
    from speech_recognition_tools_tpu.dsp import MfccConfig, mfcc_batch

    cfg = MfccConfig(
        srate=args.srate,
        nfilters=args.nfilters,
        fduration=args.fduration,
        frate=args.frate,
        nfft=args.nfft,
        context=args.context,
    )
    signals = load_signals(args, args.srate)
    ctx, meter = profiled_extraction(args)
    with ctx:
        feats = run_batched(
            signals, lambda b, l: mfcc_batch(b, l, cfg),
            batch_size=args.batch_size, data_parallel=args.data_parallel,
            meter=meter, srate=args.srate,
        )
    finish(args, feats, meter=meter)
    print(f"Execution Time: {time.time() - start:.3f} seconds")


if __name__ == "__main__":
    main()
