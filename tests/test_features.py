"""Tests for the completeness batch: light emission sampling (SampleLe),
camera adjoints (We/PdfWe/SampleWi), spatial light distribution, bump
mapping, the Halton pixel sampler, and render checkpoint/resume."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gopbrt_tpu.models import camera as cam_mod
from gopbrt_tpu.models import film as film_mod
from gopbrt_tpu.models import render as render_mod
from gopbrt_tpu.models.scene import SceneBuilder
from gopbrt_tpu.ops import geom
from gopbrt_tpu.ops import lights as light_ops
from gopbrt_tpu.ops import rng as rng_ops


def _u2(key, n):
    return jax.random.uniform(key, (n, 2))


class TestSampleLe:
    def test_point_light_power(self):
        """MC estimate of emitted power from SampleLe must equal 4*pi*I
        (point.go:51-53,63-66)."""
        b = SceneBuilder()
        b.matte()
        b.sphere(geom.translate([0, 0, 0]), 1.0, 0)
        b.point_light(p=(1.0, 2.0, 3.0), intensity=(5.0, 5.0, 5.0))
        scene = b.build(accelerator="none")
        n = 4096
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        idx = jnp.zeros((n,), jnp.int32)
        ls = light_ops.sample_le(
            scene.lights, idx, _u2(k1, n), _u2(k2, n),
            scene.world_center, scene.world_radius,
        )
        # estimator: Le / (pdf_pos * pdf_dir); exact per-sample for a point
        est = ls.le / (ls.pdf_pos * ls.pdf_dir)[..., None]
        np.testing.assert_allclose(
            np.asarray(est.mean(axis=0)), 4.0 * np.pi * 5.0, rtol=1e-5
        )
        # origins at the light position, unit directions
        np.testing.assert_allclose(
            np.asarray(ls.o), np.broadcast_to([1.0, 2.0, 3.0], (n, 3)), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(geom.length(ls.d)), 1.0, atol=1e-5
        )

    def test_area_sphere_power_identity(self):
        """For a diffuse sphere emitter, Le*cos/(pdf_pos*pdf_dir) == L*A*pi
        per sample (cosine cancels), matching Power (diffuse.go)."""
        b = SceneBuilder()
        b.matte()
        pid = b.sphere(geom.translate([0, 0, 0]), 2.0, 0)
        b.area_light(pid, radiance=(3.0, 3.0, 3.0))
        scene = b.build(accelerator="none")
        n = 512
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        idx = jnp.zeros((n,), jnp.int32)
        ls = light_ops.sample_le(
            scene.lights, idx, _u2(k1, n), _u2(k2, n),
            scene.world_center, scene.world_radius,
        )
        cos_t = jnp.abs(geom.dot(ls.d, ls.n_light))
        per_sample = ls.le[..., 0] * cos_t / (ls.pdf_pos * ls.pdf_dir)
        area = 4.0 * np.pi * 4.0
        np.testing.assert_allclose(
            np.asarray(per_sample), 3.0 * area * np.pi, rtol=2e-4
        )
        # emitted rays leave the surface outward-ish: dot(d, n) >= 0
        assert float(jnp.min(geom.dot(ls.d, ls.n_light))) >= 0.0

    def test_distant_light_geometry(self):
        b = SceneBuilder()
        b.matte()
        b.sphere(geom.translate([0, 0, 0]), 1.0, 0)
        b.distant_light(direction=(0.0, 1.0, 0.0), radiance=(2.0, 2.0, 2.0))
        scene = b.build(accelerator="none")
        n = 128
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        idx = jnp.zeros((n,), jnp.int32)
        ls = light_ops.sample_le(
            scene.lights, idx, _u2(k1, n), _u2(k2, n),
            scene.world_center, scene.world_radius,
        )
        # shoots along -w (downward), from above the world
        np.testing.assert_allclose(
            np.asarray(ls.d), np.broadcast_to([0.0, -1.0, 0.0], (n, 3)), atol=1e-5
        )
        assert float(jnp.min(ls.o[:, 1])) > 0.0
        np.testing.assert_allclose(
            float(ls.pdf_pos[0]),
            1.0 / (np.pi * float(scene.world_radius) ** 2),
            rtol=1e-5,
        )


class TestCameraAdjoints:
    def _camera(self, w=64, h=48):
        return cam_mod.perspective_camera(
            geom.look_at([0, 0, -5], [0, 0, 0], [0, 1, 0]), w, h, fov_deg=60.0
        )

    def test_we_reprojects_raster(self):
        w, h = 64, 48
        cam = self._camera(w, h)
        p_film = jnp.asarray(
            [[10.5, 20.5], [32.0, 24.0], [63.0, 47.0]], jnp.float32
        )
        u_lens = jnp.zeros((3, 2), jnp.float32)
        o, d = cam_mod.generate_rays(cam, p_film, u_lens)
        w_val, p_rast = cam_mod.we(cam, w, h, o, d)
        assert (np.asarray(w_val) > 0.0).all()
        np.testing.assert_allclose(np.asarray(p_rast), np.asarray(p_film),
                                   rtol=1e-3, atol=2e-2)

    def test_we_zero_outside_frustum(self):
        w, h = 64, 48
        cam = self._camera(w, h)
        o = jnp.zeros((1, 3), jnp.float32) + jnp.asarray([0.0, 0.0, -5.0])
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)  # backwards
        w_val, _ = cam_mod.we(cam, w, h, o, d)
        assert float(w_val[0]) == 0.0

    def test_pdf_we_formulas(self):
        w, h = 64, 48
        cam = self._camera(w, h)
        p_film = jnp.asarray([[32.0, 24.0]], jnp.float32)
        o, d = cam_mod.generate_rays(cam, p_film, jnp.zeros((1, 2)))
        pdf_pos, pdf_dir = cam_mod.pdf_we(cam, w, h, o, d)
        assert float(pdf_pos[0]) == pytest.approx(1.0)  # pinhole lens
        assert float(pdf_dir[0]) > 0.0

    def test_sample_wi_points_at_camera(self):
        w, h = 64, 48
        cam = self._camera(w, h)
        ref_p = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
        wi, w_val, pdf, p_lens, p_rast = cam_mod.sample_wi(
            cam, w, h, ref_p, jnp.zeros((1, 2))
        )
        np.testing.assert_allclose(np.asarray(p_lens[0]), [0.0, 0.0, -5.0],
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(wi[0]), [0.0, 0.0, -1.0], atol=1e-4)
        assert float(pdf[0]) > 0.0
        assert float(w_val[0]) > 0.0
        # center of the image
        np.testing.assert_allclose(np.asarray(p_rast[0]), [w / 2, h / 2],
                                   atol=0.5)


def _two_light_scene(strategy):
    b = SceneBuilder(light_strategy=strategy)
    mat = b.matte(kd=(0.6, 0.6, 0.6))
    b.disk(np.asarray(geom.rotate_x(-90.0)), 40.0, mat)
    # a bright light near the floor's +x side, a dim one far -x
    b.point_light(p=(10.0, 3.0, 0.0), intensity=(300.0, 300.0, 300.0))
    b.point_light(p=(-10.0, 3.0, 0.0), intensity=(3.0, 3.0, 3.0))
    return b.build(accelerator="none")


class TestSpatialLightDistribution:
    def test_grid_built_and_normalised(self):
        scene = _two_light_scene("spatial")
        g = scene.light_grid
        assert g is not None
        v = int(np.prod(np.asarray(g.dims)))
        assert g.func.shape == (v, 2)
        cdf = np.asarray(g.cdf)
        assert cdf.shape == (v, 3)
        np.testing.assert_allclose(cdf[:, -1], 1.0, atol=1e-5)
        assert (np.diff(cdf, axis=-1) >= -1e-6).all()

    def test_voxels_prefer_near_light(self):
        scene = _two_light_scene("spatial")
        from gopbrt_tpu.models import integrators

        # a point near the bright light should pick it with high pmf
        p = jnp.asarray([[9.0, 1.0, 0.0]], jnp.float32)
        pmf_bright = integrators._light_pick_pmf(
            scene, p, jnp.asarray([0], jnp.int32)
        )
        pmf_dim = integrators._light_pick_pmf(
            scene, p, jnp.asarray([1], jnp.int32)
        )
        assert float(pmf_bright[0]) > 0.9
        assert float(pmf_bright[0]) + float(pmf_dim[0]) == pytest.approx(1.0, abs=1e-5)

    def test_spatial_render_matches_uniform(self):
        """Both strategies are unbiased: small renders must agree in mean."""
        cam = cam_mod.perspective_camera(
            geom.look_at([0, 8, 20], [0, 0, 0], [0, 1, 0]), 32, 24, fov_deg=60.0
        )
        imgs = {}
        for strat in ("uniform", "spatial"):
            scene = _two_light_scene(strat)
            settings = render_mod.RenderSettings(
                width=32, height=24, spp=32, max_depth=2, samples_per_pass=8
            )
            imgs[strat] = np.asarray(render_mod.render(scene, cam, settings))
        m_u, m_s = imgs["uniform"].mean(), imgs["spatial"].mean()
        assert abs(m_u - m_s) / max(m_u, 1e-6) < 0.06


class TestBump:
    def test_bump_perturbs_normals_and_stays_unit(self):
        from gopbrt_tpu.models import integrators
        from gopbrt_tpu.ops import intersect as isect

        b = SceneBuilder()
        # scale the checker so edges (where the FD height gradient is
        # nonzero) actually cross the sampled band of the sphere
        tex = b.checkerboard_texture(
            (1, 1, 1), (0, 0, 0), vs=(32.0, 0, 0), vt=(0, 32.0, 0), mapping="uv"
        )
        mat = b.matte(kd=(0.5, 0.5, 0.5), bump_tex=tex, bump_scale=0.5)
        b.sphere(geom.translate([0, 0, 0]), 1.0, mat)
        scene = b.build(accelerator="none")
        assert scene.materials.bump_tex is not None

        n = 64
        o = jnp.stack(
            [jnp.linspace(-0.9, 0.9, n), jnp.zeros(n), jnp.full((n,), -5.0)],
            axis=-1,
        )
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        hit, t, pidx = isect.intersect_brute(
            scene.prims, o, d, jnp.full((n,), 1e30)
        )
        si = isect.surface_interaction(scene.prims, hit, t, pidx, o, d)
        si2 = integrators._apply_bump(
            scene, si, scene.prims.material_id[si.prim_idx]
        )
        ns = np.asarray(si2.ns)[np.asarray(hit)]
        np.testing.assert_allclose(np.linalg.norm(ns, axis=-1), 1.0, atol=1e-4)
        # somewhere along the checker edges normals must actually deviate
        base = np.asarray(si.ns)[np.asarray(hit)]
        assert np.abs(ns - base).max() > 1e-3

    def test_no_bump_is_identity(self):
        from gopbrt_tpu.models import integrators
        from gopbrt_tpu.ops import intersect as isect

        b = SceneBuilder()
        b.matte()
        b.sphere(geom.translate([0, 0, 0]), 1.0, 0)
        scene = b.build(accelerator="none")
        assert scene.materials.bump_tex is None
        n = 8
        o = jnp.zeros((n, 3)) + jnp.asarray([0.0, 0.0, -3.0])
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        hit, t, pidx = isect.intersect_brute(scene.prims, o, d, jnp.full((n,), 1e30))
        si = isect.surface_interaction(scene.prims, hit, t, pidx, o, d)
        si2 = integrators._apply_bump(scene, si, scene.prims.material_id[si.prim_idx])
        assert si2 is si


class TestHalton:
    def test_halton_jitter_in_unit_square_and_stratified(self):
        settings = render_mod.RenderSettings(
            width=8, height=8, spp=16, sampler="halton"
        )
        pixel = jnp.zeros((16,), jnp.uint32)
        sample = jnp.arange(16, dtype=jnp.uint32)
        p_film, _ = render_mod.camera_samples(settings, pixel, sample, jnp.uint32(0))
        j = np.asarray(p_film)  # pixel 0 -> jitter == film pos
        assert (j >= 0).all() and (j < 1.0).all()
        # base-2 radical inverse of 0..15 hits every 1/16 stratum exactly once
        strata = np.floor(j[:, 0] * 16).astype(int)
        assert sorted(strata.tolist()) == list(range(16))

    def test_pixel_decorrelation(self):
        settings = render_mod.RenderSettings(
            width=8, height=8, spp=4, sampler="halton"
        )
        sample = jnp.zeros((2,), jnp.uint32)
        pixel = jnp.asarray([0, 1], jnp.uint32)
        p_film, _ = render_mod.camera_samples(settings, pixel, sample, jnp.uint32(0))
        f = np.asarray(p_film)
        # jitters differ across pixels (rotation), positions differ anyway
        assert abs((f[0, 0] - 0.0) - (f[1, 0] - 1.0)) > 1e-3


class TestCheckpoint:
    def test_resume_produces_identical_image(self, tmp_path):
        b = SceneBuilder()
        mat = b.matte(kd=(0.7, 0.4, 0.2))
        b.sphere(geom.translate([0, 0, 0]), 1.0, mat)
        b.point_light(p=(3, 3, -3), intensity=(40, 40, 40))
        scene = b.build(accelerator="none")
        cam = cam_mod.perspective_camera(
            geom.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), 16, 12, fov_deg=60.0
        )
        settings = render_mod.RenderSettings(
            width=16, height=12, spp=4, max_depth=2, samples_per_pass=1
        )
        ref = np.asarray(render_mod.render(scene, cam, settings))

        ck = str(tmp_path / "film.ckpt")
        calls = []

        def progress(p, n):
            calls.append(p)

        # run passes 1-2, "crash", resume
        partial = render_mod.RenderSettings(
            width=16, height=12, spp=4, max_depth=2, samples_per_pass=1
        )
        n_passes = 4

        # simulate interruption: render only 2 passes by checkpointing then
        # truncating the loop (use the internals the way a crash would)
        film = film_mod.new_film(16, 12)
        for p in range(2):
            film = render_mod.render_pass(scene, cam, film, partial, jnp.uint32(p))
        render_mod._save_checkpoint(ck, partial, film, 2)

        out = np.asarray(
            render_mod.render(scene, cam, partial, progress=progress,
                              checkpoint_path=ck)
        )
        # resumed from pass 2: only passes 3,4 executed
        assert calls == [3, 4]
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_mismatched_settings_ignored(self, tmp_path):
        ck = str(tmp_path / "film.ckpt")
        s1 = render_mod.RenderSettings(width=16, height=12, spp=4)
        s2 = render_mod.RenderSettings(width=16, height=12, spp=8)
        film = film_mod.new_film(16, 12)
        render_mod._save_checkpoint(ck, s1, film, 2)
        assert render_mod._load_checkpoint(ck, s2) is None
        assert render_mod._load_checkpoint(ck, s1) is not None


class TestInsideSpherePdf:
    def test_pdf_li_from_inside_integrates_to_one(self):
        """pdf_li from a point INSIDE a sphere emitter is the exact
        area->solid-angle conversion (Shape.PdfWi, shape.go:29-47), not the
        old 1/4pi approximation: it must integrate to 1 over directions."""
        import math

        b = SceneBuilder()
        m = b.matte()
        pid = b.sphere(np.eye(4), 2.0, m)
        b.area_light(pid, (1, 1, 1))
        sc = b.build(accelerator="none")
        rngr = np.random.default_rng(0)
        v = rngr.normal(size=(50000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        wi = jnp.asarray(v, jnp.float32)
        ref = jnp.broadcast_to(
            jnp.asarray([0.5, -0.3, 0.2], jnp.float32), wi.shape
        )
        pdf = light_ops.pdf_li(
            sc.lights, jnp.zeros((wi.shape[0],), jnp.int32), ref, wi
        )
        integral = float(jnp.mean(pdf)) * 4.0 * math.pi
        assert abs(integral - 1.0) < 0.02
        # and every direction has positive density (a full sphere surrounds
        # any interior point)
        assert float(jnp.min(pdf)) > 0.0
