"""Differentiability tests: gradients through the full render vs finite
differences (the BASELINE.json config-5 requirement), plus an inverse-
rendering optimization smoke test."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from gopbrt_tpu.models import camera as cam_mod
from gopbrt_tpu.models import film as film_mod
from gopbrt_tpu.models import render as render_mod
from gopbrt_tpu.models.scene import SceneBuilder
from gopbrt_tpu.ops import geom


def make_scene(kd=(0.5, 0.4, 0.3), intensity=100.0):
    b = SceneBuilder()
    floor = b.matte(kd=kd)
    b.disk(np.asarray(geom.rotate_x(-90.0)), 100.0, floor)
    b.point_light(p=(0.0, 10.0, 0.0), intensity=(intensity,) * 3)
    return b.build(accelerator="none")


def render_linear(scene, cam, settings):
    """Un-gamma'd image for clean gradient math."""
    film = film_mod.new_film(settings.width, settings.height)
    film = render_mod.render_pass(scene, cam, film, settings, jnp.uint32(0))
    return film.rgb / jnp.maximum(film.weight[..., None], 1e-8)


SETTINGS = render_mod.RenderSettings(
    width=12, height=12, spp=4, max_depth=2, samples_per_pass=4,
    compaction=False,  # reverse-mode AD needs the static bounce loop
)
CAM = cam_mod.perspective_camera(
    geom.look_at([0.0, 5.0, 1e-3], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
    12, 12, fov_deg=35.0,
)


class TestGradVsFiniteDifference:
    def test_albedo_gradient(self):
        base = make_scene()

        def loss_fn(kd_scalar):
            scene = base._replace(
                materials=base.materials._replace(
                    kd=jnp.full_like(base.materials.kd, kd_scalar)
                )
            )
            return jnp.mean(render_linear(scene, CAM, SETTINGS))

        g = jax.grad(loss_fn)(jnp.float32(0.5))
        eps = 1e-2
        fd = (loss_fn(jnp.float32(0.5 + eps)) - loss_fn(jnp.float32(0.5 - eps))) / (
            2 * eps
        )
        # direct lighting is linear in albedo at depth<=2 -> tight match
        np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)
        assert float(g) > 0  # brighter albedo -> brighter image

    def test_light_intensity_gradient(self):
        base = make_scene()

        def loss_fn(i_scalar):
            scene = base._replace(
                lights=base.lights._replace(
                    intensity=jnp.full_like(base.lights.intensity, i_scalar)
                )
            )
            return jnp.mean(render_linear(scene, CAM, SETTINGS))

        g = jax.grad(loss_fn)(jnp.float32(100.0))
        fd = (loss_fn(jnp.float32(101.0)) - loss_fn(jnp.float32(99.0))) / 2.0
        np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)

    def test_image_is_linear_in_intensity(self):
        # radiance from a point light is exactly linear in I: the detached-
        # sampling estimator must preserve that (gradient == image/I)
        base = make_scene(intensity=50.0)
        img = render_linear(base, CAM, SETTINGS)

        def loss_fn(i_scalar):
            scene = base._replace(
                lights=base.lights._replace(
                    intensity=jnp.full_like(base.lights.intensity, i_scalar)
                )
            )
            return jnp.sum(render_linear(scene, CAM, SETTINGS))

        g = jax.grad(loss_fn)(jnp.float32(50.0))
        np.testing.assert_allclose(float(g), float(jnp.sum(img)) / 50.0, rtol=1e-3)


class TestInverseRendering:
    def test_albedo_recovery(self):
        # optimize albedo to match a target rendered with known albedo.
        # Parameterize through a sigmoid: raw albedo can be driven negative
        # by the optimizer, where paths die and the gradient vanishes (a
        # real dead-zone of the physical parameterization, not a bug).
        target_scene = make_scene(kd=(0.8, 0.3, 0.1))
        target = render_linear(target_scene, CAM, SETTINGS)
        base = make_scene(kd=(0.5, 0.5, 0.5))

        def loss_fn(logit):
            scene = base._replace(
                materials=base.materials._replace(kd=jax.nn.sigmoid(logit))
            )
            img = render_linear(scene, CAM, SETTINGS)
            return jnp.mean((img - target) ** 2)

        logit = jnp.zeros_like(base.materials.kd)
        opt = optax.adam(0.2)
        state = opt.init(logit)
        step = jax.jit(
            lambda p, state: _step(loss_fn, opt, p, state)
        )
        for _ in range(60):
            logit, state, loss = step(logit, state)
        kd = np.asarray(jax.nn.sigmoid(logit)[0])
        np.testing.assert_allclose(kd, [0.8, 0.3, 0.1], atol=0.05)


def _step(loss_fn, opt, params, state):
    loss, g = jax.value_and_grad(loss_fn)(params)
    updates, state = opt.update(g, state, params)
    return optax.apply_updates(params, updates), state, loss


class TestImageTextureGradient:
    """Round-5 regression: atlas gradients through the bilinear image
    texture.  Masked (missed) lanes carry garbage uv; before the
    _image_lookup sanitize, their NaN bilinear weights scattered
    NaN * 0-cotangent into the ATLAS gradient and poisoned every
    inverse-rendering step that optimized a texture."""

    def test_atlas_gradient_finite_and_nonzero(self):
        b = SceneBuilder()
        atlas = np.full((8, 8, 3), 0.5, np.float32)
        tex = b.image_texture(atlas)
        m = b.matte(kd=(1.0, 1.0, 1.0), kd_tex=tex)
        b.sphere(np.asarray(geom.translate([0.0, 0.0, 0.0])), 1.0, m)
        b.point_light(p=(0.0, 5.0, 3.0), intensity=(50.0,) * 3)
        scene = b.build(accelerator="none")
        cam = cam_mod.perspective_camera(
            geom.look_at([0.0, 0.0, 4.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
            16, 16, fov_deg=40.0,
        )
        settings = render_mod.RenderSettings(
            width=16, height=16, spp=4, max_depth=2, samples_per_pass=4,
            compaction=False,
        )

        def loss(a):
            sc = scene._replace(textures=scene.textures._replace(atlas=a))
            img = render_linear(sc, cam, settings)
            return jnp.mean(img)

        g = jax.grad(loss)(scene.textures.atlas)
        g = np.asarray(g)
        assert np.all(np.isfinite(g)), "NaN in atlas gradient"
        assert np.abs(g).max() > 0.0, "atlas gradient identically zero"
