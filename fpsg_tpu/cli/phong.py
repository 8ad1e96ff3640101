"""Blender multi-view render script (offline tooling; reference
``src/phong.py`` equivalent).

Runs INSIDE Blender:
    blender --background --python phong.py -- <model.obj|.off> <img_dir>

Renders 12 orthographic views — cameras at 30-degree azimuth steps, 60-degree
elevation, tracked to the origin, 600x600 PNG output — matching the
reference's camera rig (phong.py:24,71-104,238-240). Out of scope for the
TPU runtime (SURVEY.md §2.4 N7); requires bpy.
"""

from __future__ import annotations

import math
import os
import sys


def main():
    try:
        import bpy
    except ImportError:
        sys.exit("phong.py must be run inside Blender (bpy unavailable)")

    argv = sys.argv[sys.argv.index("--") + 1:]
    model_path, img_dir = argv[0], argv[1]
    os.makedirs(img_dir, exist_ok=True)

    # Fresh scene
    bpy.ops.wm.read_factory_settings(use_empty=True)
    scene = bpy.context.scene
    scene.render.resolution_x = 600
    scene.render.resolution_y = 600
    scene.render.image_settings.file_format = "PNG"

    # Import model
    ext = os.path.splitext(model_path)[1].lower()
    if ext == ".obj":
        bpy.ops.import_scene.obj(filepath=model_path)
    elif ext == ".off":
        _import_off(bpy, model_path)
    else:
        sys.exit(f"unsupported model format: {ext}")

    # Normalize object scale to the unit ball around the origin
    obj = bpy.context.selected_objects[0] if bpy.context.selected_objects \
        else bpy.context.scene.objects[0]
    dims = max(obj.dimensions)
    if dims > 0:
        obj.scale = tuple(1.0 / dims for _ in range(3))

    # Sun light + camera rig: elevation 60 deg, azimuth 30-deg steps
    light = bpy.data.objects.new(
        "sun", bpy.data.lights.new("sun", type="SUN")
    )
    scene.collection.objects.link(light)
    light.location = (0, 0, 3)

    cam_data = bpy.data.cameras.new("cam")
    cam_data.type = "ORTHO"
    cam = bpy.data.objects.new("cam", cam_data)
    scene.collection.objects.link(cam)
    scene.camera = cam
    track = cam.constraints.new(type="TRACK_TO")
    track.target = obj
    track.track_axis = "TRACK_NEGATIVE_Z"
    track.up_axis = "UP_Y"

    radius, elev = 2.0, math.radians(60.0)
    for i in range(12):
        azim = math.radians(30.0 * i)
        cam.location = (
            radius * math.cos(elev) * math.cos(azim),
            radius * math.cos(elev) * math.sin(azim),
            radius * math.sin(elev),
        )
        scene.render.filepath = os.path.join(img_dir, f"v{i:03d}.png")
        bpy.ops.render.render(write_still=True)


def _import_off(bpy, path):
    from fpsg_tpu.data.mesh import read_off  # vendored reader

    verts, faces = read_off(path)
    mesh = bpy.data.meshes.new("off_mesh")
    mesh.from_pydata(verts.tolist(), [], faces.tolist())
    mesh.update()
    obj = bpy.data.objects.new("off_obj", mesh)
    bpy.context.scene.collection.objects.link(obj)
    obj.select_set(True)


if __name__ == "__main__":
    main()
