"""Single-image inference CLI (new capability; the reference buries
generation inside eval/visualization).

    python -m fpsg_tpu.cli.generate \
        --image chair.png --support_dir ./chair_plys/ \
        --eval_model model_epoch_500 --name run0 --out cloud.npy
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from fpsg_tpu.config import add_train_flags, config_from_args
from fpsg_tpu.data.readers import (
    modelnet_image_transform,
    pad_and_normalize_cloud,
    read_ply,
    shapenet_image_transform,
)
from fpsg_tpu.serve import Generator
from fpsg_tpu.utils.visualization import draw_reconstruction


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_train_flags(parser)
    parser.add_argument("--image", type=str, required=True,
                        help="Query image (png/jpg);")
    parser.add_argument("--support_dir", type=str, required=True,
                        help="Directory of support .ply/.npy clouds;")
    parser.add_argument("--out", type=str, default="generated.npy")
    parser.add_argument("--render", type=str, default="",
                        help="Optional PNG panel output dir;")
    args = parser.parse_args(argv)
    conf = config_from_args(args)

    tf = (modelnet_image_transform if conf.dataset == "modelnet"
          else shapenet_image_transform)
    image = tf(args.image)

    clouds = []
    rng = np.random.default_rng(conf.seed)
    for fname in sorted(os.listdir(args.support_dir)):
        path = os.path.join(args.support_dir, fname)
        if fname.endswith(".ply"):
            pts = read_ply(path, conf.num_points)
        elif fname.endswith(".npy"):
            pts = np.load(path)
            if len(pts) > conf.num_points:
                pts = pts[rng.choice(len(pts), conf.num_points)]
        else:
            continue
        clouds.append(pad_and_normalize_cloud(pts, conf.num_points, rng))
    if not clouds:
        raise SystemExit(f"no support clouds in {args.support_dir}")
    support = np.stack(clouds)

    ckpt = None
    if conf.eval_model != "NONE":
        ckpt = os.path.join(conf.model_path, conf.name, conf.eval_model)
    gen = Generator.from_checkpoint(conf, ckpt, img_size=image.shape[0])
    cloud = gen(image, support)[0]
    np.save(args.out, cloud)
    print(f"wrote {cloud.shape} point cloud to {args.out}")
    if args.render:
        png = draw_reconstruction(cloud[None], support[:1], args.render,
                                  "generated")
        print(f"wrote panel to {png}")


if __name__ == "__main__":
    main()
