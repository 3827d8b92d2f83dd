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
    p.add_argument("src", help="reference .model file (torch.save dict)")
    p.add_argument("dest", help="native checkpoint directory to create")
    p.add_argument("--tag", default="final",
                   help="checkpoint tag (subdirectory name)")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    from speech_recognition_tools_tpu.io.torch_import import (
        detect_family,
        import_state_dict,
        load_torch_checkpoint,
    )

    sd, hyper = load_torch_checkpoint(args.src)
    family = detect_family(sd)
    path = import_state_dict(sd, hyper, args.dest, tag=args.tag, src=args.src)
    print(f"detected family: {family}")
    print(f"imported {args.src} -> {path}")


if __name__ == "__main__":
    main()
