"""Manifest generator CLI (reference ``src/generate_dataset.py:132-141``)."""

from __future__ import annotations

import argparse

from fpsg_tpu.data.manifest import (
    generate_modelnet_manifests, generate_shapenet_manifests,
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--img_path", type=str, required=True,
                   help="Path to the image directory;")
    p.add_argument("--pc_path", type=str, required=True,
                   help="Path to the pc directory;")
    p.add_argument("--dataset", type=str, required=True,
                   choices=["modelnet", "shapenet"])
    p.add_argument("--output", type=str, default="./")
    args = p.parse_args(argv)
    if args.dataset == "modelnet":
        generate_modelnet_manifests(args.img_path, args.pc_path, args.output)
    else:
        generate_shapenet_manifests(args.pc_path, args.output)


if __name__ == "__main__":
    main()
