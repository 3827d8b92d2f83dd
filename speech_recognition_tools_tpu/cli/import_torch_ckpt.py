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
    p.add_argument("--espnet_units",
                   help="(ESPnet e2e checkpoints) the char dict the model "
                        "was trained with ('token id' lines, data2json's "
                        "dict file); converts model.acc.best / snapshots "
                        "from the reference's e2e branch "
                        "(e2e/wsj/run.sh via espnet) into a native e2e "
                        "model dir for recog_e2e / srt-serve")
    p.add_argument("--aheads", type=int, default=4,
                   help="(--espnet_units) attention head count — not "
                        "recoverable from the state_dict; read it from "
                        "the training conf (train.yaml aheads; the "
                        "reference's e2e configs use 4)")
    p.add_argument("--mtlalpha", type=float, default=0.3,
                   help="(--espnet_units) CTC weight recorded in the "
                        "imported config (train.yaml mtlalpha)")
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
    if args.espnet_units:
        from speech_recognition_tools_tpu.io.torch_import import (
            import_espnet_model,
        )

        path = import_espnet_model(
            args.src, args.dest, args.espnet_units, args.aheads,
            mtlalpha=args.mtlalpha,
            tag="final_avg" if args.tag == "final" else args.tag,
        )
        print("detected family: espnet_e2e")
        print(f"imported {args.src} -> {path}")
        return
    from speech_recognition_tools_tpu.io.torch_import import (
        detect_family,
        import_state_dict,
        load_torch_checkpoint,
    )

    sd, hyper = load_torch_checkpoint(args.src)
    if detect_family(sd) == "espnet_e2e":
        get_parser().error(
            "this is an ESPnet e2e transformer checkpoint (the reference's "
            "e2e branch); rerun with --espnet_units DICT [--aheads N]"
        )
    if detect_family(sd) == "espnet_lm":
        from speech_recognition_tools_tpu.io.torch_import import (
            import_espnet_lm,
        )

        path = import_espnet_lm(args.src, args.dest, tag=args.tag)
        print("detected family: espnet_lm")
        print(f"imported {args.src} -> {path} (use with srt-recog-e2e --lm)")
        return
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
