"""Cameras: batched primary-ray generation.

Replaces the reference's ProjectiveCamera / PerspectiveCamera classes
(``pkg/pbrt/camera.go:106-242``) with a parameter pytree + a vectorised
ray-generation function.  The raster->screen->camera->world transform chain
is precomputed host-side exactly as NewProjectiveCamera does
(camera.go:106-124); per-ray work is two affine transforms on the VPU.

Also provides the orthographic camera (the reference declares the
projection matrix, transform.go:501-502, but never built the camera class).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from gopbrt_tpu.ops import geom
from gopbrt_tpu.ops.geom import normalize
from gopbrt_tpu.ops.sampling import concentric_sample_disk

CAM_PERSPECTIVE = 0
CAM_ORTHOGRAPHIC = 1


class Camera(NamedTuple):
    kind: jnp.ndarray  # int32[] CAM_*
    raster_to_camera: jnp.ndarray  # f32[4,4]
    camera_to_world: jnp.ndarray  # f32[4,4]
    lens_radius: jnp.ndarray  # f32[]
    focal_distance: jnp.ndarray  # f32[]
    shutter_open: jnp.ndarray  # f32[]
    shutter_close: jnp.ndarray  # f32[]


def _screen_to_raster(width, height, screen_window):
    (x0, y0), (x1, y1) = screen_window
    m = geom.scale(float(width), float(height), 1.0)
    m = geom.matmul(m, geom.scale(1.0 / (x1 - x0), 1.0 / (y0 - y1), 1.0))
    m = geom.matmul(m, geom.translate([-x0, -y1, 0.0]))
    return m


def perspective_camera(
    camera_to_world,
    width: int,
    height: int,
    fov_deg: float = 90.0,
    screen_window=None,
    lens_radius: float = 0.0,
    focal_distance: float = 1e6,
    shutter_open: float = 0.0,
    shutter_close: float = 1.0,
) -> Camera:
    """NewPerspectiveCamera (camera.go:135-166).

    screen_window defaults to the aspect-corrected [-1,1] window (PBRT
    proper).  The reference demo passes [0,1]^2 (server.go:138,159) — pass
    it explicitly for golden parity.
    """
    if screen_window is None:
        aspect = width / height
        if aspect > 1:
            screen_window = ((-aspect, -1.0), (aspect, 1.0))
        else:
            screen_window = ((-1.0, -1.0 / aspect), (1.0, 1.0 / aspect))
    cam_to_screen = geom.perspective(fov_deg, 1e-2, 1000.0)
    s2r = _screen_to_raster(width, height, screen_window)
    r2s = geom.inverse(s2r)
    r2c = geom.matmul(geom.inverse(cam_to_screen), r2s)
    return Camera(
        kind=jnp.asarray(CAM_PERSPECTIVE, jnp.int32),
        raster_to_camera=jnp.asarray(r2c, jnp.float32),
        camera_to_world=jnp.asarray(camera_to_world, jnp.float32),
        lens_radius=jnp.asarray(lens_radius, jnp.float32),
        focal_distance=jnp.asarray(focal_distance, jnp.float32),
        shutter_open=jnp.asarray(shutter_open, jnp.float32),
        shutter_close=jnp.asarray(shutter_close, jnp.float32),
    )


def orthographic_camera(
    camera_to_world, width: int, height: int, screen_window=None,
    lens_radius: float = 0.0, focal_distance: float = 1e6,
) -> Camera:
    if screen_window is None:
        aspect = width / height
        screen_window = ((-aspect, -1.0), (aspect, 1.0)) if aspect > 1 else (
            (-1.0, -1.0 / aspect), (1.0, 1.0 / aspect))
    cam_to_screen = geom.orthographic(0.0, 1.0)
    s2r = _screen_to_raster(width, height, screen_window)
    r2c = geom.matmul(geom.inverse(cam_to_screen), geom.inverse(s2r))
    return Camera(
        kind=jnp.asarray(CAM_ORTHOGRAPHIC, jnp.int32),
        raster_to_camera=jnp.asarray(r2c, jnp.float32),
        camera_to_world=jnp.asarray(camera_to_world, jnp.float32),
        lens_radius=jnp.asarray(lens_radius, jnp.float32),
        focal_distance=jnp.asarray(focal_distance, jnp.float32),
        shutter_open=jnp.asarray(0.0, jnp.float32),
        shutter_close=jnp.asarray(1.0, jnp.float32),
    )


def generate_rays(cam: Camera, p_film: jnp.ndarray, u_lens: jnp.ndarray):
    """Batched GenerateRay (camera.go:167-190): p_film[N,2] raster coords,
    u_lens[N,2] lens samples.  Returns world-space (o[N,3], d[N,3]).

    Ray differentials (GenerateRayDifferential, camera.go:192-242) are not
    materialised: texture filtering works from pixel-footprint estimates
    instead (wavefront renderers don't carry per-ray differentials).
    """
    n = p_film.shape[0]
    p_raster = jnp.concatenate([p_film, jnp.zeros((n, 1), jnp.float32)], axis=-1)
    p_cam = geom.apply_point(cam.raster_to_camera, p_raster)

    is_persp = cam.kind == CAM_PERSPECTIVE
    o_persp = jnp.zeros((n, 3), jnp.float32)
    d_persp = normalize(p_cam)
    o_ortho = p_cam
    d_ortho = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
    o = jnp.where(is_persp, o_persp, o_ortho)
    d = jnp.where(is_persp, d_persp, d_ortho)

    # thin-lens depth of field (camera.go:173-186)
    def with_lens(o, d):
        p_lens = concentric_sample_disk(u_lens) * cam.lens_radius
        ft = cam.focal_distance / jnp.maximum(d[:, 2], 1e-8)
        p_focus = o + d * ft[:, None]
        o2 = jnp.concatenate([p_lens, jnp.zeros((n, 1), jnp.float32)], axis=-1)
        return o2, normalize(p_focus - o2)

    o_l, d_l = with_lens(o, d)
    use_lens = cam.lens_radius > 0.0
    o = jnp.where(use_lens, o_l, o)
    d = jnp.where(use_lens, d_l, d)

    o_w = geom.apply_point_affine(cam.camera_to_world, o)
    d_w = geom.apply_vector(cam.camera_to_world, d)
    return o_w, normalize(d_w)


def look_at_camera(eye, target, up, **kw) -> Camera:
    """Convenience: LookAt + perspective (server.go:152-159 pattern)."""
    return perspective_camera(geom.look_at(eye, target, up), **kw)
