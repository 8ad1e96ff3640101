"""Split/move tool (reference ``src/train_test_split.py``).

``--mode split``: write per-category 80/20 ``{cat}_{train,test}.txt`` lists
(:7-23). ``--mode mv_npy``: relocate sampled ``.npy`` clouds into ShapeNet
item dirs (:26-37; the reference's ``__main__`` runs this mode)."""

from __future__ import annotations

import argparse
import os
import shutil

from fpsg_tpu.data.manifest import train_test_split_lists


def split_mode(root: str, seed: int):
    for cat in sorted(os.listdir(root)):
        cat_dir = os.path.join(root, cat)
        if not os.path.isdir(cat_dir):
            continue
        items = sorted(os.listdir(cat_dir))
        train, test = train_test_split_lists(items, 0.2, seed)
        for split, rows in (("train", train), ("test", test)):
            with open(os.path.join(root, f"{cat}_{split}.txt"), "w") as f:
                f.write("\n".join(rows))
        print(f"{cat}: {len(train)} train / {len(test)} test")


def mv_npy_mode(npy_root: str, item_root: str):
    """Move ``<npy_root>/<item>.npy`` → ``<item_root>/<item>/models/
    npy_file.npy`` (reference mv_npy semantics)."""
    for fname in sorted(os.listdir(npy_root)):
        if not fname.endswith(".npy"):
            continue
        item = os.path.splitext(fname)[0]
        dst_dir = os.path.join(item_root, item, "models")
        if not os.path.isdir(dst_dir):
            continue
        shutil.move(
            os.path.join(npy_root, fname),
            os.path.join(dst_dir, "npy_file.npy"),
        )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", type=str, default="mv_npy",
                   choices=["split", "mv_npy"])
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--npy_root", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.mode == "split":
        split_mode(args.root, args.seed)
    else:
        mv_npy_mode(args.npy_root or args.root, args.root)


if __name__ == "__main__":
    main()
