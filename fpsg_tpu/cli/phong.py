"""Blender multi-view render script (offline tooling; reference
``src/phong.py`` equivalent).

Runs INSIDE Blender:
    blender --background --python phong.py -- <model.obj|.off|.stl> <img_dir> [background.jpg]

Reference parity (src/phong.py):
- 12 cameras: spherical (r=3, theta=60 deg from +z, phi=0..330 in 30-deg
  steps) (:24,171-182), orthographic with ortho_scale=2 (:71-79), tracked to
  an origin empty (:82-104).
- CYCLES render with transparent film, RGB 16-bit PNG, 600x600 (:29-31,
  220-231).
- Compositor: background image -> scale(RENDER_SIZE) -> alpha-over with the
  render layer -> output (:194-218). The background defaults to
  ``background.jpg`` next to this script (the reference hardcodes an
  absolute path, :11).
- Output naming: ``<model_name>.<view_index>.png`` (:110-119,233-236).
- NO recentering/renormalization of the model (the reference comments these
  out because ShapeNetCoreV2 is pre-normalized, :106-109).

The camera-pose math, camera list, output naming, and compositor node graph
are pure functions unit-tested WITHOUT Blender (tests/test_cli_tools.py).
"""

from __future__ import annotations

import math
import os
import sys

# 12 orientations around the object, 60-deg polar angle (reference :24).
CAMERAS = [(60, phi) for phi in range(0, 360, 30)]
RESOLUTION = (600, 600)  # (W, H), reference :28-31
CAMERA_R = 3.0           # reference :174
ORTHO_SCALE = 2.0        # reference :78


def camera_location(theta_deg: float, phi_deg: float,
                    r: float = CAMERA_R) -> tuple:
    """Spherical -> cartesian camera position (reference move_camera,
    :171-182): theta is the polar angle from +z, phi the azimuth."""
    theta = math.radians(theta_deg)
    phi = math.radians(phi_deg)
    return (
        r * math.sin(theta) * math.cos(phi),
        r * math.sin(theta) * math.sin(phi),
        r * math.cos(theta),
    )


def output_name(model_name: str, view_index: int) -> str:
    """``<name>.<i>.png`` (reference save/do_model, :110-119,233-236)."""
    return f"{model_name}.{view_index}.png"


def model_name_from_path(path: str) -> str:
    """Reference load_model naming (:120-128), incl. the stl quirk."""
    name = os.path.basename(path).split(".")[0]
    if path.split(".")[-1] == "stl":
        name = name.title().replace("_", " ")
    return name


def compositor_graph() -> list:
    """The background alpha-over node graph as (src_node, out_idx,
    dst_node, in_idx) edges (reference node_setting_init, :194-218)."""
    return [
        ("image", 0, "scale", 0),
        ("scale", 0, "alpha_over", 1),
        ("render_layer", 0, "alpha_over", 2),
        ("alpha_over", 0, "output", 0),
    ]


def build_compositor(tree, background_path: str):
    """Materialize :func:`compositor_graph` on a Blender node tree."""
    import bpy

    for node in list(tree.nodes):
        tree.nodes.remove(node)
    nodes = {
        "image": tree.nodes.new("CompositorNodeImage"),
        "scale": tree.nodes.new("CompositorNodeScale"),
        "alpha_over": tree.nodes.new("CompositorNodeAlphaOver"),
        "render_layer": tree.nodes.new("CompositorNodeRLayers"),
        "output": tree.nodes.new("CompositorNodeComposite"),
    }
    nodes["scale"].space = "RENDER_SIZE"
    if background_path and os.path.exists(background_path):
        nodes["image"].image = bpy.data.images.load(background_path)
    for src, oi, dst, ii in compositor_graph():
        tree.links.new(nodes[src].outputs[oi], nodes[dst].inputs[ii])
    return nodes


def main():
    try:
        import bpy
    except ImportError:
        sys.exit("phong.py must be run inside Blender (bpy unavailable)")

    argv = sys.argv[sys.argv.index("--") + 1:]
    if len(argv) < 2:
        sys.exit("phong.py args: <3d mesh path> <image dir> [background.jpg]")
    model_path, img_dir = argv[0], argv[1]
    background = argv[2] if len(argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "background.jpg"
    )
    os.makedirs(img_dir, exist_ok=True)

    # Fresh scene; CYCLES with transparent film (scene_setting_init,
    # :220-231). film_transparent moved between Blender API generations.
    bpy.ops.wm.read_factory_settings(use_empty=True)
    scene = bpy.context.scene
    scene.render.engine = "CYCLES"
    try:
        scene.render.film_transparent = True          # Blender >= 2.80
    except AttributeError:
        scene.cycles.film_transparent = True          # Blender 2.79
    scene.render.resolution_x, scene.render.resolution_y = RESOLUTION
    scene.render.image_settings.file_format = "PNG"
    scene.render.image_settings.color_mode = "RGB"
    scene.render.image_settings.color_depth = "16"

    # Import model (load_model, :120-141); reference parity: the model is
    # NOT recentered/renormalized (:106-109).
    ext = os.path.splitext(model_path)[1].lower()
    if ext == ".obj":
        try:
            bpy.ops.wm.obj_import(filepath=model_path)   # Blender >= 3.x
        except AttributeError:
            bpy.ops.import_scene.obj(filepath=model_path)
    elif ext == ".stl":
        bpy.ops.import_mesh.stl(filepath=model_path)
    elif ext == ".off":
        _import_off(bpy, model_path)
    else:
        sys.exit(f"unsupported model format: {ext}")
    name = model_name_from_path(model_path)

    # Sun light (the reference scene file ships a light; factory-empty
    # scenes need one for CYCLES to see anything).
    light = bpy.data.objects.new(
        "sun", bpy.data.lights.new("sun", type="SUN")
    )
    scene.collection.objects.link(light)
    light.location = (0, 0, 3)

    # Orthographic camera tracked to an ORIGIN EMPTY (init_camera +
    # fix_camera_to_origin, :71-104).
    origin = bpy.data.objects.new("Origin", None)
    scene.collection.objects.link(origin)
    origin.location = (0.0, 0.0, 0.0)
    cam_data = bpy.data.cameras.new("cam")
    cam_data.type = "ORTHO"
    cam_data.ortho_scale = ORTHO_SCALE
    cam = bpy.data.objects.new("cam", cam_data)
    scene.collection.objects.link(cam)
    scene.camera = cam
    track = cam.constraints.new(type="TRACK_TO")
    track.target = origin
    track.track_axis = "TRACK_NEGATIVE_Z"
    track.up_axis = "UP_Y"

    # Background alpha-over compositor (node_setting_init, :194-218).
    scene.use_nodes = True
    build_compositor(scene.node_tree, background)

    # do_model loop (:106-119)
    for i, (theta, phi) in enumerate(CAMERAS):
        cam.location = camera_location(theta, phi)
        scene.render.filepath = os.path.join(img_dir, output_name(name, i))
        bpy.ops.render.render(write_still=True)


def _import_off(bpy, path):
    from fpsg_tpu.data.mesh import read_off  # vendored reader

    verts, faces = read_off(path)
    mesh = bpy.data.meshes.new("off_mesh")
    mesh.from_pydata(verts.tolist(), [], faces.tolist())
    mesh.update()
    obj = bpy.data.objects.new("off_obj", mesh)
    bpy.context.scene.collection.objects.link(obj)


if __name__ == "__main__":
    main()
