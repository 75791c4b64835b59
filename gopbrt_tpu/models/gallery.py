"""The BASELINE.json benchmark scenes (configs 1-4) as canonical builders.

Golden-image tests (tests/test_goldens.py) render these at fixed seeds and
compare against checked-in references so any radiometric regression across
rounds is caught; benches reuse them for workload parity with the judge's
configs.

  1. demo scene, direct-lighting integrator (the pbrtd Render demo,
     internal/render/server.go:30-164)
  2. Cornell-style box: matte walls + mirror sphere, path depth 5
  3. triangle-mesh under SAH BVH, textured matte + plastic
  4. area lights + MIS + glass (specular transmission), depth 8
"""

from __future__ import annotations

import numpy as np

from gopbrt_tpu.models import camera as cam_mod
from gopbrt_tpu.models.render import RenderSettings
from gopbrt_tpu.models.scene import Scene, SceneBuilder
from gopbrt_tpu.ops import geom


def config1(width=96, height=54):
    """Demo scene + direct lighting (BASELINE config 1)."""
    from gopbrt_tpu.models.demo import build_demo_camera, build_demo_scene

    scene = build_demo_scene(accelerator="none")
    cam = build_demo_camera(width, height)
    settings = RenderSettings(
        width=width, height=height, spp=8, max_depth=3, integrator="direct",
        samples_per_pass=4, seed=11,
    )
    return scene, cam, settings


def config2(width=64, height=64):
    """Cornell-style box: matte walls + mirror sphere, path depth 5."""
    b = SceneBuilder()
    white = b.matte(kd=(0.73, 0.73, 0.73))
    red = b.matte(kd=(0.65, 0.05, 0.05))
    green = b.matte(kd=(0.12, 0.45, 0.15))
    # box walls as big disks (normal facing inward)
    b.disk(np.asarray(geom.matmul(geom.translate([0, 0, 0]), geom.rotate_x(-90.0))), 8.0, white)  # floor
    b.disk(np.asarray(geom.matmul(geom.translate([0, 4, 0]), geom.rotate_x(90.0))), 8.0, white)  # ceiling
    b.disk(np.asarray(geom.translate([0, 2, -2.0])), 8.0, white)  # back (+z normal)
    b.disk(np.asarray(geom.matmul(geom.translate([-2, 2, 0]), geom.rotate_y(90.0))), 8.0, red)  # left
    b.disk(np.asarray(geom.matmul(geom.translate([2, 2, 0]), geom.rotate_y(-90.0))), 8.0, green)  # right
    mirror = b.mirror(kr=(0.9, 0.9, 0.9))
    b.sphere(np.asarray(geom.translate([-0.7, 0.7, -0.6])), 0.7, mirror)
    matte_ball = b.matte(kd=(0.5, 0.5, 0.7))
    b.sphere(np.asarray(geom.translate([0.9, 0.5, 0.2])), 0.5, matte_ball)
    dark = b.matte(kd=(0.0, 0.0, 0.0))
    lamp = b.sphere(np.asarray(geom.translate([0.0, 3.6, 0.0])), 0.35, dark)
    b.area_light(lamp, radiance=(22.0, 22.0, 22.0), two_sided=False)
    scene = b.build(accelerator="none")
    cam = cam_mod.perspective_camera(
        geom.look_at([0.0, 2.0, 5.2], [0.0, 1.6, 0.0], [0.0, 1.0, 0.0]),
        width, height, fov_deg=55.0,
    )
    settings = RenderSettings(
        width=width, height=height, spp=16, max_depth=5, integrator="path",
        samples_per_pass=4, seed=7,
    )
    return scene, cam, settings


def config3(width=64, height=36):
    """Triangle mesh under SAH BVH, textured matte + plastic."""
    from gopbrt_tpu.models.meshes import build_mesh_scene, mesh_camera

    scene = build_mesh_scene(n_lat=24, n_lon=24)  # 1104 tris, > cutoff
    cam = mesh_camera(width, height)
    settings = RenderSettings(
        width=width, height=height, spp=8, max_depth=3, integrator="path",
        samples_per_pass=4, seed=5,
    )
    return scene, cam, settings


def config4(width=64, height=64):
    """Area lights + MIS + smooth glass, depth 8 (BASELINE config 4)."""
    b = SceneBuilder()
    checker = b.checkerboard_texture(
        (0.8, 0.8, 0.8), (0.2, 0.2, 0.2),
        vs=(0.7, 0.0, 0.0), vt=(0.0, 0.0, 0.7), mapping="planar",
    )
    floor = b.matte(kd=(1.0, 1.0, 1.0), kd_tex=checker)
    b.disk(np.asarray(geom.rotate_x(-90.0)), 60.0, floor)
    glass = b.glass(kr=(1.0, 1.0, 1.0), kt=(1.0, 1.0, 1.0), eta=1.5)
    b.sphere(np.asarray(geom.translate([0.0, 1.2, 0.0])), 1.2, glass)
    matte = b.matte(kd=(0.7, 0.3, 0.2))
    b.sphere(np.asarray(geom.translate([2.4, 0.8, -1.4])), 0.8, matte)
    dark = b.matte(kd=(0.0, 0.0, 0.0))
    l1 = b.sphere(np.asarray(geom.translate([-2.5, 4.0, 2.0])), 0.5, dark)
    b.area_light(l1, radiance=(30.0, 28.0, 24.0), two_sided=False)
    l2 = b.sphere(np.asarray(geom.translate([3.0, 5.0, 3.5])), 1.2, dark)
    b.area_light(l2, radiance=(4.0, 5.0, 7.0), two_sided=False)
    scene = b.build(accelerator="none")
    cam = cam_mod.perspective_camera(
        geom.look_at([0.0, 2.4, 6.5], [0.0, 1.0, 0.0], [0.0, 1.0, 0.0]),
        width, height, fov_deg=45.0,
    )
    settings = RenderSettings(
        width=width, height=height, spp=16, max_depth=8, integrator="path",
        samples_per_pass=4, seed=3,
    )
    return scene, cam, settings


CONFIGS = {
    "config1_demo_direct": config1,
    "config2_cornell_mirror": config2,
    "config3_mesh_bvh": config3,
    "config4_arealights_glass": config4,
}

# golden-image rendering overrides (tests/goldens): configs 2 and 4 carry
# the multi-bounce MIS/specular math where a subtle estimator bug hides
# inside MC noise at low spp — render their goldens bigger and at 64 spp
# so the noise floor sits well below the tolerance gates (VERDICT r3 #10).
GOLDEN_SETTINGS = {
    "config2_cornell_mirror": dict(width=128, height=128, spp=64,
                                   samples_per_pass=8),
    "config4_arealights_glass": dict(width=128, height=128, spp=64,
                                     samples_per_pass=8),
}


def golden_config(name):
    """(scene, camera, settings) exactly as the golden images render."""
    ov = GOLDEN_SETTINGS.get(name, {})
    w = ov.get("width")
    scene, cam_, settings = (
        CONFIGS[name](ov["width"], ov["height"]) if w else CONFIGS[name]()
    )
    if ov:
        settings = settings._replace(
            spp=ov["spp"], samples_per_pass=ov["samples_per_pass"]
        )
    return scene, cam_, settings
