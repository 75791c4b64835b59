"""Megakernel vs jnp-chain cross-check.

The fused Pallas bounce megakernel (ops/pallas_megakernel.py) consumes the
SAME counter-based RNG streams (ops/rng.py dimension layout) and mirrors the
jnp wavefront chain op-for-op, so on a fast-path scene both backends trace
the same paths: per-lane radiance must agree to float tolerance except for
the rare lane where a discrete decision (hit selection, shadow occlusion,
RR accept) flips on float noise (the kernel's spawn offset is a conservative
approximation of the jnp chain's exact transformed error bound).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gopbrt_tpu.models import integrators
from gopbrt_tpu.models import render as render_mod
from gopbrt_tpu.models.demo import build_demo_camera, build_demo_scene
from gopbrt_tpu.models import camera as cam_mod
from gopbrt_tpu.ops import pallas_megakernel as mk


@pytest.fixture(scope="module")
def demo():
    scene = build_demo_scene(accelerator="none")
    w, h = 64, 36
    camera = build_demo_camera(w, h)
    settings = render_mod.RenderSettings(width=w, height=h, spp=1, max_depth=5)
    pixel = jnp.arange(w * h, dtype=jnp.uint32)
    sample = jnp.zeros((w * h,), jnp.uint32)
    p_film, u_lens = render_mod.camera_samples(settings, pixel, sample, jnp.uint32(7))
    o, d = cam_mod.generate_rays(camera, p_film, u_lens)
    return scene, o, d, pixel, sample


def test_fastinfo_demo_scene_eligible(demo):
    scene = demo[0]
    assert scene.fastinfo is not None and scene.fastinfo.ok


def test_fastinfo_accepts_smooth_and_rough_glass():
    from gopbrt_tpu.models.scene import SceneBuilder
    from gopbrt_tpu.ops import geom

    b = SceneBuilder()
    m = b.glass()  # smooth: FresnelSpecular — in the megakernel fast set
    b.sphere(geom.translate([0.0, 0.0, 0.0]), 1.0, m)
    b.point_light(p=(0.0, 5.0, 0.0), intensity=(1.0, 1.0, 1.0))
    fi = b.build(accelerator="none").fastinfo
    assert fi.ok and fi.has_glass and not fi.has_rough_glass

    b = SceneBuilder()
    m = b.glass(roughness=0.2)  # rough: GGX R+T lobes (round 5)
    b.sphere(geom.translate([0.0, 0.0, 0.0]), 1.0, m)
    b.point_light(p=(0.0, 5.0, 0.0), intensity=(1.0, 1.0, 1.0))
    fi = b.build(accelerator="none").fastinfo
    assert fi.ok and fi.has_rough_glass


def _rough_glass_scene():
    """Checker floor + rough-glass sphere + matte ball + sphere lamp."""
    from gopbrt_tpu.models.scene import SceneBuilder
    from gopbrt_tpu.ops import geom

    b = SceneBuilder()
    checker = b.checkerboard_texture(
        (0.8, 0.8, 0.8), (0.2, 0.2, 0.2),
        vs=(0.7, 0.0, 0.0), vt=(0.0, 0.0, 0.7), mapping="planar",
    )
    floor = b.matte(kd=(1.0, 1.0, 1.0), kd_tex=checker)
    b.disk(np.asarray(geom.rotate_x(-90.0)), 60.0, floor)
    rough = b.glass(kr=(1.0, 1.0, 1.0), kt=(1.0, 1.0, 1.0), eta=1.5,
                    roughness=0.15)
    b.sphere(np.asarray(geom.translate([0.0, 1.2, 0.0])), 1.2, rough)
    matte = b.matte(kd=(0.7, 0.3, 0.2))
    b.sphere(np.asarray(geom.translate([2.4, 0.8, -1.4])), 0.8, matte)
    dark = b.matte(kd=(0.0, 0.0, 0.0))
    lamp = b.sphere(np.asarray(geom.translate([-2.5, 4.0, 2.0])), 0.5, dark)
    b.area_light(lamp, radiance=(30.0, 28.0, 24.0), two_sided=False)
    scene = b.build(accelerator="none")
    cam = cam_mod.perspective_camera(
        geom.look_at([0.0, 2.4, 6.5], [0.0, 1.0, 0.0], [0.0, 1.0, 0.0]),
        48, 48, fov_deg=45.0,
    )
    return scene, cam


def test_megakernel_rough_glass_parity():
    """Rough-glass GGX R+T lobes in the kernel (round 5): per-lane match
    vs the jnp chain on the same RNG streams."""
    scene, camera = _rough_glass_scene()
    assert scene.fastinfo is not None and scene.fastinfo.ok
    assert scene.fastinfo.has_rough_glass
    n = 48 * 48
    settings = render_mod.RenderSettings(width=48, height=48, spp=1,
                                         max_depth=5)
    pixel = jnp.arange(n, dtype=jnp.uint32)
    sample = jnp.zeros((n,), jnp.uint32)
    p_film, u_lens = render_mod.camera_samples(settings, pixel, sample,
                                               jnp.uint32(13))
    o, d = cam_mod.generate_rays(camera, p_film, u_lens)
    cfg = integrators.PathConfig(max_depth=5, rr_threshold=1.0)
    ref = np.asarray(
        integrators._li_jnp(scene, o, d, pixel, sample, jnp.uint32(13), cfg)
    )
    got = np.asarray(
        mk.path_li_fused(scene, o, d, pixel, sample, jnp.uint32(13), cfg,
                         interpret=True)
    )
    assert np.all(np.isfinite(got))
    diff = np.abs(got - ref).max(axis=-1)
    rel = diff / (1e-3 + np.abs(ref).max(axis=-1))
    assert np.mean(rel < 1e-3) > 0.98, f"agreement {np.mean(rel < 1e-3):.4f}"
    assert abs(got.mean() - ref.mean()) < 1e-2 * max(ref.mean(), 1e-6)


@pytest.mark.parametrize("depth", [1, 5])
def test_megakernel_matches_jnp_chain(demo, depth):
    scene, o, d, pixel, sample = demo
    cfg = integrators.PathConfig(max_depth=depth, rr_threshold=1.0)
    seed = jnp.uint32(7)
    ref = np.asarray(integrators._li_jnp(scene, o, d, pixel, sample, seed, cfg))
    got = np.asarray(
        mk.path_li_fused(scene, o, d, pixel, sample, seed, cfg, interpret=True)
    )
    assert np.all(np.isfinite(got))
    diff = np.abs(got - ref).max(axis=-1)
    scale = 1e-3 + np.abs(ref).max(axis=-1)
    rel = diff / scale
    # nearly every lane identical; allow a small tail of discrete flips
    assert np.mean(rel < 1e-3) > 0.99, (
        f"lane agreement {np.mean(rel < 1e-3):.4f}"
    )
    # aggregate radiance must match tightly (flips average out)
    assert abs(got.mean() - ref.mean()) < 2e-3 * max(ref.mean(), 1e-6)


def test_megakernel_gradient_path_replay(demo):
    """path_li_fused is differentiable via path-replay through the jnp
    chain: d(sum L)/d(light intensity) must equal the jnp chain's."""
    scene, o, d, pixel, sample = demo
    n = 512
    o, d, pixel, sample = o[:n], d[:n], pixel[:n], sample[:n]
    cfg = integrators.PathConfig(max_depth=2, rr_threshold=1.0)
    seed = jnp.uint32(7)

    def loss_fused(intensity):
        sc = scene._replace(lights=scene.lights._replace(intensity=intensity))
        return jnp.sum(
            mk.path_li_fused(sc, o, d, pixel, sample, seed, cfg, interpret=True)
        )

    def loss_jnp(intensity):
        sc = scene._replace(lights=scene.lights._replace(intensity=intensity))
        return jnp.sum(integrators._li_jnp(sc, o, d, pixel, sample, seed, cfg))

    g_fused = jax.grad(loss_fused)(scene.lights.intensity)
    g_ref = jax.grad(loss_jnp)(scene.lights.intensity)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-7
    )


def test_megakernel_mirror_cornell_parity():
    """Mirror lobe in the kernel: the Cornell config (matte walls + mirror
    sphere + sphere area light) is on the fast path and must match the jnp
    chain per lane."""
    from gopbrt_tpu.models.gallery import config2

    scene, camera, settings = config2(48, 48)
    assert scene.fastinfo is not None and scene.fastinfo.ok
    n = 48 * 48
    pixel = jnp.arange(n, dtype=jnp.uint32)
    sample = jnp.zeros((n,), jnp.uint32)
    p_film, u_lens = render_mod.camera_samples(settings, pixel, sample, jnp.uint32(9))
    o, d = cam_mod.generate_rays(camera, p_film, u_lens)
    cfg = integrators.PathConfig(max_depth=5, rr_threshold=1.0)
    ref = np.asarray(
        integrators._li_jnp(scene, o, d, pixel, sample, jnp.uint32(9), cfg)
    )
    got = np.asarray(
        mk.path_li_fused(scene, o, d, pixel, sample, jnp.uint32(9), cfg,
                         interpret=True)
    )
    assert np.all(np.isfinite(got))
    diff = np.abs(got - ref).max(axis=-1)
    rel = diff / (1e-3 + np.abs(ref).max(axis=-1))
    assert np.mean(rel < 1e-3) > 0.99, f"agreement {np.mean(rel < 1e-3):.4f}"
    assert abs(got.mean() - ref.mean()) < 5e-3 * max(ref.mean(), 1e-6)


def test_megakernel_glass_config4_parity():
    """Smooth-glass lobe in the kernel (FresnelSpecular R/T + etaScale):
    the BASELINE config-4 scene (glass sphere + two sphere area lights +
    planar-checker floor) is on the fast path and must match the jnp chain
    per lane — same RNG streams, so identical paths up to float noise."""
    from gopbrt_tpu.models.gallery import config4

    scene, camera, settings = config4(48, 48)
    assert scene.fastinfo is not None and scene.fastinfo.ok
    n = 48 * 48
    pixel = jnp.arange(n, dtype=jnp.uint32)
    sample = jnp.zeros((n,), jnp.uint32)
    p_film, u_lens = render_mod.camera_samples(settings, pixel, sample, jnp.uint32(3))
    o, d = cam_mod.generate_rays(camera, p_film, u_lens)
    cfg = integrators.PathConfig(max_depth=8, rr_threshold=1.0)
    ref = np.asarray(
        integrators._li_jnp(scene, o, d, pixel, sample, jnp.uint32(3), cfg)
    )
    got = np.asarray(
        mk.path_li_fused(scene, o, d, pixel, sample, jnp.uint32(3), cfg,
                         interpret=True)
    )
    assert np.all(np.isfinite(got))
    diff = np.abs(got - ref).max(axis=-1)
    rel = diff / (1e-3 + np.abs(ref).max(axis=-1))
    # glass paths chain several discrete Fresnel choices; allow a slightly
    # larger tail of float-noise flips than the matte/mirror configs
    assert np.mean(rel < 1e-3) > 0.98, f"agreement {np.mean(rel < 1e-3):.4f}"
    assert abs(got.mean() - ref.mean()) < 1e-2 * max(ref.mean(), 1e-6)


def test_brute_split_is_exactly_the_unsplit_estimator(demo):
    """The brute kernel's phase split + dead-lane compaction sort (round
    5, disabled by default after measuring a loss on TPU — see
    BENCH_NOTES) must still return EXACTLY the single-launch result."""
    scene, o, d, pixel, sample = demo
    seed = jnp.uint32(7)
    ref = mk._li_fused_fwd(
        scene, o, d, pixel, sample, seed, jnp.float32(0), jnp.float32(0),
        max_depth=5, interpret=True, split_at=0,
    )
    got = mk._li_fused_fwd(
        scene, o, d, pixel, sample, seed, jnp.float32(0), jnp.float32(0),
        max_depth=5, interpret=True, split_at=3,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
