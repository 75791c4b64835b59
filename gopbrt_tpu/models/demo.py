"""The reference demo scene, rebuilt on the SoA builder.

Reproduces the hardcoded scene of the gRPC Render handler
(``internal/render/server.go:30-164``): 21 matte spheres along three axes,
two giant checkerboard disks as the floor, BVH aggregate, and four lights
(distant + 2 point + a sphere area light), viewed by a LookAt perspective
camera with fov 100.
"""

from __future__ import annotations

import math

import numpy as np

from gopbrt_tpu.models import camera as cam_mod
from gopbrt_tpu.models.render import RenderSettings
from gopbrt_tpu.models.scene import Scene, SceneBuilder
from gopbrt_tpu.ops import geom


def build_demo_scene(accelerator: str = "bvh") -> Scene:
    """server.go:30-132, table-ized."""
    b = SceneBuilder()

    # 21 spheres: k in 1..7 along each of 3 axes (server.go:32-65)
    n = 8
    radius = 2.0
    for k in range(1, n):
        for axis in range(3):
            x = y = z = 0.0
            if axis == 0:
                x = k / n * 100.0
                color = (1.0, 0.0, 0.0)
            elif axis == 1:
                y = k / n * 100.0
                color = (0.0, 1.0, 0.0)
            else:
                z = k / n * 100.0
                color = (0.0, 0.0, 1.0)
            y = max(y, radius / 2.0)
            mat = b.matte(kd=color, sigma=0.0)
            b.sphere(geom.translate([x, y, z]), radius, mat)

    # checkerboard floor disks (server.go:86-102): RotateX(90) disk + one
    # translated; planar mapping vs=(.2,0,0), vt=(0,0,.2)
    checker = b.checkerboard_texture(
        (1.0, 1.0, 1.0), (0.18, 0.18, 0.18),
        vs=(0.2, 0.0, 0.0), vt=(0.0, 0.0, 0.2), mapping="planar",
    )
    floor_mat = b.matte(kd=(1.0, 1.0, 1.0), kd_tex=checker)
    disk_xform = np.asarray(geom.matmul(geom.translate([0.0, 0.0, 0.0]), geom.rotate_x(90.0)))
    b.disk(disk_xform, radius=10000.0, material=floor_mat, height=0.01)
    b.disk(np.asarray(geom.translate([-50.0, 0.0, -50.0])), radius=10000.0,
           material=floor_mat, height=0.01)

    # lights (server.go:106-130)
    b.distant_light(direction=(-1.0, 1.0, 1.0), radiance=(0.05, 0.05, 0.05))
    b.point_light(p=(50.0, 20.0, 50.0), intensity=(100.0, 100.0, 100.0))
    b.point_light(p=(-50.0, 30.0, -50.0), intensity=(50.0, 50.0, 50.0))
    # sphere area light at (-10, 5, 20), r=5, L=0.2, one-sided
    light_mat = b.matte(kd=(0.0, 0.0, 0.0))
    lp = b.sphere(geom.translate([-10.0, 5.0, 20.0]), 5.0, light_mat)
    b.area_light(lp, radiance=(0.2, 0.2, 0.2), two_sided=False)

    return b.build(accelerator=accelerator)


def build_demo_camera(width: int, height: int) -> cam_mod.Camera:
    """server.go:152-159: LookAt(150,150,150 -> 0,0,0) * RotY(-30) * RotX(-30),
    fov=100, screen window [0,1]^2 (the demo's quirky crop)."""
    m = geom.look_at([150.0, 150.0, 150.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    m = geom.matmul(m, geom.rotate_y(-30.0))
    m = geom.matmul(m, geom.rotate_x(-30.0))
    return cam_mod.perspective_camera(
        m, width, height, fov_deg=100.0,
        screen_window=((0.0, 0.0), (1.0, 1.0)),
    )


def demo_settings(width=480, height=270, spp=16, **kw) -> RenderSettings:
    """server.go:136-164: stratified 4x4 spp, path depth 10, rr threshold 1."""
    return RenderSettings(
        width=width, height=height, spp=spp, max_depth=10, rr_threshold=1.0,
        integrator="path", **kw,
    )
