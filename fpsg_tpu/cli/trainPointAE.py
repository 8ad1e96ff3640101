"""PC-encoder pretrainer CLI (reference ``src/trainPointAE.py:131-153``).

Fixed vs reference: ``--core`` is honored (the reference hardcoded
'pointnet'), saving uses a real modulo (the reference's bitwise-& bug saved
only at the final epoch) — SURVEY.md §5.1 item 6.
"""

from __future__ import annotations

import argparse

from fpsg_tpu.train.pretrain import PretrainConfig, pretrain_pc_encoder


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, required=True,
                   help="Path to the image/item root;")
    p.add_argument("--proot", type=str, default="",
                   help="Path to the point cloud root (modelnet only);")
    p.add_argument("--dataset", type=str, default="modelnet",
                   choices=["modelnet", "shapenet", "synthetic"])
    p.add_argument("--core", type=str, default="pointnet",
                   choices=["pointnet", "dgcnn"])
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr_decay", type=int, default=40)
    p.add_argument("--epoch", type=int, default=150)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--val_interval", type=int, default=10)
    p.add_argument("--save_interval", type=int, default=20)
    p.add_argument("--name", type=str, default="pretrain_pointnet")
    p.add_argument("--model_path", type=str, default="../checkpoint")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--transient_retries", type=int, default=2)
    args = p.parse_args(argv)
    conf = PretrainConfig(**vars(args))
    _, out = pretrain_pc_encoder(conf)
    print(f"saved pretrained encoder to {out}")


if __name__ == "__main__":
    main()
