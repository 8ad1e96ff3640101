"""Offline dataset prep: point sampling + multi-view rendering driver
(reference ``src/view_generator.py``).

Point sampling uses the first-party mesh sampler (fpsg_tpu.data.mesh,
replacing PCL binaries); rendering shells out to Blender with the bundled
``phong.py`` when a Blender binary is available, exactly like the
reference's per-item invocation (view_generator.py:72-80).
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess

from fpsg_tpu.data.mesh import mesh_to_point_cloud_ply, off2ply


def generate_view(obj_root: str, img_root: str, blender: str = "blender",
                  blend_file: str = "", phong_script: str = ""):
    """Per-item Blender invocation:
    ``blender <blend> --background --python phong.py -- <obj> <img_dir>``."""
    if shutil.which(blender) is None:
        print("Blender not found on PATH; skipping view rendering "
              "(point sampling still runs).")
        return
    phong_script = phong_script or os.path.join(
        os.path.dirname(__file__), "phong.py"
    )
    for item in sorted(os.listdir(obj_root)):
        if not item.endswith((".obj", ".off")):
            continue
        out_dir = os.path.join(img_root, os.path.splitext(item)[0])
        os.makedirs(out_dir, exist_ok=True)
        cmd = [blender]
        if blend_file:
            cmd.append(blend_file)
        cmd += ["--background", "--python", phong_script, "--",
                os.path.join(obj_root, item), out_dir]
        subprocess.run(cmd, check=False)


def pc_sampling(mesh_root: str, out_root: str, n_points: int, seed: int):
    os.makedirs(out_root, exist_ok=True)
    for item in sorted(os.listdir(mesh_root)):
        if not item.endswith(".off"):
            continue
        out = os.path.join(out_root, item.replace(".off", ".ply"))
        mesh_to_point_cloud_ply(
            os.path.join(mesh_root, item), out, n_points, seed
        )
        print(f"sampled {item} -> {out}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mesh_root", type=str, required=True,
                   help="Directory of .off meshes;")
    p.add_argument("--pc_out", type=str, default="",
                   help="Output dir for sampled .ply point clouds;")
    p.add_argument("--img_out", type=str, default="",
                   help="Output dir for rendered views (needs Blender);")
    p.add_argument("--n_points", type=int, default=2048)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--blender", type=str, default="blender")
    p.add_argument("--off2ply_out", type=str, default="",
                   help="Optional dir for vertex-only OFF->PLY conversion;")
    args = p.parse_args(argv)

    if args.pc_out:
        pc_sampling(args.mesh_root, args.pc_out, args.n_points, args.seed)
    if args.off2ply_out:
        os.makedirs(args.off2ply_out, exist_ok=True)
        for item in sorted(os.listdir(args.mesh_root)):
            if item.endswith(".off"):
                off2ply(
                    os.path.join(args.mesh_root, item),
                    os.path.join(args.off2ply_out,
                                 item.replace(".off", ".ply")),
                )
    if args.img_out:
        generate_view(args.mesh_root, args.img_out, args.blender)


if __name__ == "__main__":
    main()
