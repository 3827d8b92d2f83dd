"""Import a reference PyTorch checkpoint into a native checkpoint.

Migration path for users of the reference toolkit: its trainers save
self-describing torch dicts (train_rnn_nnet_classifier.py:273-288); this
CLI converts one into a native checkpoint directory that every inference /
adaptation / PM CLI here can consume (the model family is detected from the
state_dict structure — see io/torch_import.py for the supported families
and the exact weight mappings).

    srt-import-torch ref_model.model exp/imported_am [--tag final]
"""

import argparse


def get_parser():
    p = argparse.ArgumentParser("Import a reference torch .model checkpoint")
    p.add_argument("src", help="reference .model file (torch.save dict), "
                               "or an egs directory with --egs")
    p.add_argument("dest", help="native checkpoint / egs directory to create")
    p.add_argument("--tag", default="final",
                   help="checkpoint tag (subdirectory name)")
    p.add_argument("--egs", action="store_true",
                   help="src is a reference egs directory (per-utt .pt + "
                        "lengths.pkl [+ labels.pkl]); convert the DATA "
                        "instead of a model")
    p.add_argument("--num_targets", type=int, default=None,
                   help="(--egs) class count override (default: max label "
                        "+ 1)")
    p.add_argument("--input_hw",
                   help="(pooled nnetVAECNN only) FEATURE_DIM,NUM_FRAMES "
                        "the model was trained with — its Linear heads "
                        "bake this geometry in but the .model dict does "
                        "not record it (train_CNN_VAE.py:115-140)")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    if args.egs:
        from speech_recognition_tools_tpu.io.torch_import import (
            import_egs_dir,
        )

        out = import_egs_dir(args.src, args.dest,
                             num_targets=args.num_targets)
        print(f"imported egs {args.src} -> {out}")
        return
    from speech_recognition_tools_tpu.io.torch_import import (
        detect_family,
        import_state_dict,
        load_torch_checkpoint,
    )

    sd, hyper = load_torch_checkpoint(args.src)
    if args.input_hw:
        try:
            hw = tuple(int(v) for v in args.input_hw.split(","))
        except ValueError:
            hw = ()
        if len(hw) != 2:
            get_parser().error(
                f"--input_hw expects exactly FEATURE_DIM,NUM_FRAMES "
                f"(two comma-separated integers), got {args.input_hw!r}"
            )
        hyper["input_hw"] = hw
    family = detect_family(sd)
    path = import_state_dict(sd, hyper, args.dest, tag=args.tag, src=args.src)
    print(f"detected family: {family}")
    print(f"imported {args.src} -> {path}")


if __name__ == "__main__":
    main()
