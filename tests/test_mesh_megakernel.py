"""Mesh megakernel vs jnp-chain cross-check (interpret mode).

The mesh megakernel (ops/pallas_mesh_megakernel.py) inlines the two-level
cluster traversal into the fused bounce loop and consumes the SAME counter
RNG streams as the jnp wavefront chain, so on a mesh fast-path scene both
backends trace the same paths: per-lane radiance must agree except for the
rare lane where a discrete decision flips on float noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gopbrt_tpu.models import camera as cam_mod
from gopbrt_tpu.models import integrators
from gopbrt_tpu.models import render as render_mod
from gopbrt_tpu.models.meshes import build_mesh_scene, mesh_camera
from gopbrt_tpu.ops import pallas_mesh_megakernel as pmm


@pytest.fixture(scope="module")
def mesh():
    scene = build_mesh_scene(n_lat=16, n_lon=16)  # 480 tris + floor + lamp
    assert scene.fastinfo is not None and scene.fastinfo.mesh_ok
    assert scene.meshkernel is not None
    w, h = 48, 48
    camera = mesh_camera(w, h)
    settings = render_mod.RenderSettings(width=w, height=h, spp=1, max_depth=3)
    pixel = jnp.arange(w * h, dtype=jnp.uint32)
    sample = jnp.zeros((w * h,), jnp.uint32)
    p_film, u_lens = render_mod.camera_samples(
        settings, pixel, sample, jnp.uint32(5)
    )
    o, d = cam_mod.generate_rays(camera, p_film, u_lens)
    return scene, o, d, pixel, sample


def test_mesh_tables_built(mesh):
    scene = mesh[0]
    mt = scene.meshkernel
    assert mt.n_extras == 2  # floor disk + lamp sphere
    assert mt.n_clusters >= 4


@pytest.mark.parametrize("depth", [1, 3])
def test_mesh_megakernel_matches_jnp_chain(mesh, depth):
    scene, o, d, pixel, sample = mesh
    cfg = integrators.PathConfig(max_depth=depth, rr_threshold=1.0)
    seed = jnp.uint32(5)
    ref = np.asarray(
        integrators._li_jnp(scene, o, d, pixel, sample, seed, cfg)
    )
    got = np.asarray(
        pmm.mesh_li_fused(scene, o, d, pixel, sample, seed, cfg,
                          interpret=True)
    )
    assert np.all(np.isfinite(got))
    diff = np.abs(got - ref).max(axis=-1)
    rel = diff / (1e-3 + np.abs(ref).max(axis=-1))
    agree = np.mean(rel < 1e-3)
    assert agree > 0.98, f"lane agreement {agree:.4f}"
    assert abs(got.mean() - ref.mean()) < 1e-2 * max(ref.mean(), 1e-6)


def test_mesh_megakernel_gradient_path_replay(mesh):
    """Path-replay backward: d(sum L)/d(light intensity) equals the jnp
    chain's."""
    scene, o, d, pixel, sample = mesh
    n = 512
    o, d, pixel, sample = o[:n], d[:n], pixel[:n], sample[:n]
    cfg = integrators.PathConfig(max_depth=2, rr_threshold=1.0)
    seed = jnp.uint32(5)

    def loss_fused(intensity):
        sc = scene._replace(lights=scene.lights._replace(intensity=intensity))
        return jnp.sum(
            pmm.mesh_li_fused(sc, o, d, pixel, sample, seed, cfg,
                              interpret=True)
        )

    def loss_jnp(intensity):
        sc = scene._replace(lights=scene.lights._replace(intensity=intensity))
        return jnp.sum(integrators._li_jnp(sc, o, d, pixel, sample, seed, cfg))

    g_fused = jax.grad(loss_fused)(scene.lights.intensity)
    g_ref = jax.grad(loss_jnp)(scene.lights.intensity)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-7
    )


@pytest.mark.parametrize("resort_until", [1, 2])
def test_reorder_is_exactly_the_unsorted_estimator(mesh, resort_until):
    """The phase-split wavefront reorder (round 5) must return EXACTLY the
    single-launch result: per-lane math is order-independent (counter RNG
    rides pixel/sample) and the unsort must invert the whole sort chain —
    the multi-sort unsort bug this pins shipped briefly as a pure
    permutation of the correct image."""
    scene, o, d, pixel, sample = mesh
    seed = jnp.uint32(5)
    ref = pmm._mesh_li_fwd(
        scene, o, d, pixel, sample, seed, jnp.float32(0), jnp.float32(0),
        max_depth=3, interpret=True, reorder_on=False,
    )
    got = pmm._mesh_li_fwd(
        scene, o, d, pixel, sample, seed, jnp.float32(0), jnp.float32(0),
        max_depth=3, interpret=True, reorder_on=True,
        resort_until=resort_until,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
