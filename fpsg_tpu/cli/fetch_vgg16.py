"""Fetch the ImageNet-pretrained VGG16-bn weights for the image branch.

The reference downloads these implicitly at model build
(``src/models/image_net.py:14`` — ``torchvision.models.vgg16_bn(
pretrained=True)``). This framework never downloads at train time
(zero-egress deployments), so the weights ship as an explicit file:

    # on any host with internet + torchvision:
    python -m fpsg_tpu.cli.fetch_vgg16 --out vgg16_bn.pt

    # then train with
    python -m fpsg_tpu.cli.trainNetwork ... --img_encoder_path vgg16_bn.pt

The produced file is a plain torch state dict; the trainer's
stdlib-only reader (``fpsg_tpu/io/torch_pickle.py``) parses it without
torch installed, and ``fpsg_tpu/io/convert.py:load_torchvision_vgg16_bn``
converts it bit-exactly (golden test:
``tests/test_golden_parity.py::test_vgg16_matches_torch_via_converter``).

Without this file, a ``vgg_16`` image branch starts from RANDOM init
and the trainer prints a loud warning (``train/loop.py:
load_pretrained_weights``).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="Download torchvision's ImageNet VGG16-bn state "
                    "dict for --img_encoder_path (run on a connected "
                    "host).")
    ap.add_argument("--out", type=str, default="vgg16_bn.pt",
                    help="output path for the state-dict file")
    args = ap.parse_args(argv)

    try:
        import torch
        import torchvision
    except ImportError as e:
        raise SystemExit(
            f"fetch_vgg16 needs torch + torchvision ({e}). Run this "
            "command on a connected host with both installed; the "
            "produced file is then portable to the training host."
        )

    try:
        weights = torchvision.models.VGG16_BN_Weights.IMAGENET1K_V1
        model = torchvision.models.vgg16_bn(weights=weights)
    except AttributeError:  # torchvision < 0.13
        model = torchvision.models.vgg16_bn(pretrained=True)
    torch.save(model.state_dict(), args.out)
    print(f"wrote {args.out} — train with --img_encoder_path {args.out}")


if __name__ == "__main__":
    main()
