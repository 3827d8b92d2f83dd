"""FDLP spectrogram CLI — flag parity with the reference
(/root/reference/src/featgen/computeFDLPSpectrogram.py :240-262), batched
TPU execution instead of the per-utterance numpy loop."""

import argparse
import sys
import time


def get_parser():
    parser = argparse.ArgumentParser("Extract FDLP Spectrogram.")
    parser.add_argument("scp", help='"scp" list')
    parser.add_argument("outfile", help="output file")
    parser.add_argument("--scp_type", default="wav", help="'wav' or 'segment'")
    parser.add_argument("--wav_scp", help="recording wav scp for --scp_type segment")
    parser.add_argument("--nfilters", type=int, default=20)
    parser.add_argument("--coeff_num", type=int, default=50)
    parser.add_argument("--coeff_range", type=str, default="1,20")
    parser.add_argument("--order", type=int, default=50)
    parser.add_argument("--fduration", type=float, default=0.5)
    parser.add_argument("--frate", type=int, default=100)
    parser.add_argument("--overlap_fraction", type=float, default=0.25)
    parser.add_argument("--kaldi_cmd", default="copy-feats",
                        help="ignored: arks are written natively")
    parser.add_argument("--add_reverb", help="clean|small_room|medium_room|large_room")
    parser.add_argument("--fbank_type", type=str, default="mel,1")
    parser.add_argument("--odd_mod_zero", action="store_true")
    parser.add_argument("--gamma_weight", type=str, default="None")
    parser.add_argument("--lifter_config", type=str, default=None)
    parser.add_argument("--write_utt2num_frames", action="store_true")
    parser.add_argument("--add_noise", help="'type,snr' | clean | diff")
    parser.add_argument("--srate", type=int, default=16000)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--bucket_seconds", type=float, default=1.0,
                        help="round padded batch length up to this many "
                             "seconds; raise (e.g. 4) on real corpora so "
                             "XLA compiles a handful of shapes instead "
                             "of one per second of length spread")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard each batch over all devices (one "
                             "program replaces the reference's queue.pl "
                             "scp-shard fan-out)")
    parser.add_argument("--precision", default="fast",
                        choices=["fast", "mixed", "high"])
    parser.add_argument("--random_jitter", action="store_true",
                        help="enable the reference's +-1 frame OLA jitter")
    from speech_recognition_tools_tpu.cli.common import add_profiling_arg

    add_profiling_arg(parser)
    return parser


def main(argv=None):
    args = get_parser().parse_args(argv)
    start = time.time()
    print(f"{sys.argv[0]}: Extracting features....")

    import jax

    if args.precision == "high":
        jax.config.update("jax_enable_x64", True)

    from speech_recognition_tools_tpu.cli.common import (
        finish,
        load_signals,
        profiled_extraction,
        run_batched,
    )
    from speech_recognition_tools_tpu.dsp import FdlpConfig, fdlp_spectrogram_batch

    lifter = None
    if args.lifter_config:
        with open(args.lifter_config) as fid:
            lifter = tuple(
                float(x) for x in fid.readline().strip().split(",")
            )

    cfg = FdlpConfig(
        srate=args.srate,
        nfilters=args.nfilters,
        coeff_num=args.coeff_num,
        coeff_range=args.coeff_range,
        order=args.order,
        fduration=args.fduration,
        frate=args.frate,
        overlap_fraction=args.overlap_fraction,
        fbank_type=args.fbank_type,
        odd_mod_zero=args.odd_mod_zero,
        gamma_weight=args.gamma_weight,
        lifter_config=lifter,
        precision=args.precision,
    )
    signals = load_signals(args, args.srate)
    key = jax.random.key(0) if args.random_jitter else None

    def batch_fn(batch, lens):
        return fdlp_spectrogram_batch(batch, lens, cfg, jitter_key=key)

    ctx, meter = profiled_extraction(args)
    with ctx:
        feats = run_batched(signals, batch_fn, batch_size=args.batch_size,
                            bucket_multiple=int(
                                args.bucket_seconds * args.srate),
                            data_parallel=args.data_parallel,
                            meter=meter, srate=args.srate)
    finish(args, feats, meter=meter)
    print(f"Execution Time: {time.time() - start:.3f} seconds")


if __name__ == "__main__":
    main()
