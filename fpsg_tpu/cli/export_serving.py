"""Freeze a trained checkpoint into deployment artifacts (StableHLO).

    python -m fpsg_tpu.cli.export_serving \
        --eval_model model_epoch_500 --name run0 \
        --img_size 224 --out ./artifacts/

The output directory then serves WITHOUT this package's model code or
the checkpoint (see fpsg_tpu/serve_export.py):

    from fpsg_tpu.serve_export import ExportedGenerator
    g = ExportedGenerator("./artifacts/")
    proto = g.prototype(support_clouds)          # once per class
    clouds = g.generate(images_u8, proto, seed=0)
"""

from __future__ import annotations

import argparse
import os

from fpsg_tpu.config import add_train_flags, config_from_args
from fpsg_tpu.serve import Generator
from fpsg_tpu.serve_export import export_generator


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_train_flags(parser)
    parser.add_argument("--out", type=str, required=True,
                        help="Artifact output directory;")
    parser.add_argument("--img_size", type=int, default=224)
    parser.add_argument("--platforms", type=str, default="",
                        help="Comma-separated lowering targets, e.g. "
                             "'tpu' or 'tpu,cpu' (default: current "
                             "backend);")
    parser.add_argument("--batch", type=int, default=0,
                        help="Fixed query batch size (0 = symbolic: one "
                             "artifact serves every batch size);")
    parser.add_argument("--int8", action="store_true",
                        help="Bake the int8-quantized VGG image encoder "
                             "into the artifact (fpsg_tpu/serve_quant.py"
                             "); prototype/decoder stay full precision.")
    args = parser.parse_args(argv)
    conf = config_from_args(args)

    ckpt = None
    if conf.eval_model != "NONE":
        ckpt = os.path.join(conf.model_path, conf.name, conf.eval_model)
    gen = Generator.from_checkpoint(conf, ckpt, img_size=args.img_size)
    manifest = export_generator(
        gen, args.out,
        img_size=args.img_size,
        n_support=conf.n_shot,
        n_points_per_cloud=conf.num_points,
        platforms=[p for p in args.platforms.split(",") if p] or None,
        batch=args.batch or None,
        int8=args.int8,
    )
    print(f"wrote serving artifacts to {args.out}: {manifest}")


if __name__ == "__main__":
    main()
