"""FDLP modulation-spectrum (M-vector) CLI — flag parity with the reference
(/root/reference/src/featgen/computeModulationSpectrum.py :208-229; the
segments-driven variant computeModulationSpectrum_segments.py is covered by
--scp_type segment, with the unity-gain option)."""

import argparse
import time


def get_parser():
    parser = argparse.ArgumentParser("Extract FDLP Modulation Spectral Features.")
    parser.add_argument("scp")
    parser.add_argument("outfile")
    parser.add_argument("--scp_type", default="wav")
    parser.add_argument("--wav_scp", help="recording wav scp for --scp_type segment")
    parser.add_argument("--nfilters", type=int, default=15)
    parser.add_argument("--coeff_0", type=int, default=5)
    parser.add_argument("--coeff_n", type=int, default=30)
    parser.add_argument("--keep_even", action="store_true")
    parser.add_argument("--order", type=int, default=50)
    parser.add_argument("--fduration", type=float, default=0.5)
    parser.add_argument("--frate", type=int, default=100)
    parser.add_argument("--add_reverb")
    parser.add_argument("--fbank_type", type=str, default="mel,1")
    parser.add_argument("--set_unity_gain", action="store_true")
    parser.add_argument("--no_window", action="store_true")
    parser.add_argument("--complex_modulation", action="store_true")
    parser.add_argument("--compensate_noise", action="store_true")
    parser.add_argument("--absolute_value", action="store_true")
    parser.add_argument("--kaldi_cmd", help="ignored: arks written natively")
    parser.add_argument("--srate", type=int, default=16000)
    parser.add_argument("--batch_size", type=int, default=8)
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
    start = time.time()
    from speech_recognition_tools_tpu.cli.common import (
        finish,
        load_signals,
        profiled_extraction,
        run_batched,
    )
    from speech_recognition_tools_tpu.dsp import (
        ModSpecConfig,
        modulation_spectrum_batch,
    )

    cfg = ModSpecConfig(
        srate=args.srate,
        nfilters=args.nfilters,
        coeff_0=args.coeff_0,
        coeff_n=args.coeff_n,
        order=args.order,
        fduration=args.fduration,
        frate=args.frate,
        fbank_type=args.fbank_type,
        keep_even=args.keep_even,
        complex_modulation=args.complex_modulation,
        compensate_noise=args.compensate_noise,
        absolute_value=args.absolute_value,
        set_unity_gain=args.set_unity_gain,
        no_window=args.no_window,
    )
    signals = load_signals(args, args.srate)
    ctx, meter = profiled_extraction(args)
    with ctx:
        feats = run_batched(
            signals,
            lambda b, l: modulation_spectrum_batch(b, l, cfg),
            batch_size=args.batch_size,
            data_parallel=args.data_parallel,
            meter=meter, srate=args.srate,
        )
    finish(args, feats, meter=meter)
    print(f"Execution Time: {time.time() - start:.3f} seconds")


if __name__ == "__main__":
    main()
