"""Cluster-intersect kernel vs the brute-force oracle (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gopbrt_tpu.models.meshes import build_mesh_scene
from gopbrt_tpu.ops import intersect as isect
from gopbrt_tpu.ops import pallas_cluster as pc


@pytest.fixture(scope="module")
def mesh_scene():
    scene = build_mesh_scene(n_lat=16, n_lon=16)  # 482 prims: tris+disk+spheres
    assert scene.clusters is not None
    return scene


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    # aim from a shell around the scene toward points near the mesh
    o = rng.normal(0.0, 4.0, (n, 3)).astype(np.float32)
    o[:, 1] = np.abs(o[:, 1]) + 0.2
    target = rng.normal(0.0, 1.2, (n, 3)).astype(np.float32)
    target[:, 1] = np.abs(target[:, 1])
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_cluster_matches_bruteforce_oracle(mesh_scene):
    scene = mesh_scene
    o, d = _random_rays(2048)
    t_max = jnp.full((2048,), 1e30, jnp.float32)
    h1, t1, i1 = isect.intersect_brute(scene.prims, o, d, t_max)
    h2, t2, i2 = pc.cluster_intersect(
        scene.clusters, scene.prims, o, d, t_max, interpret=True
    )
    h1, t1, i1 = map(np.asarray, (h1, t1, i1))
    h2, t2, i2 = map(np.asarray, (h2, t2, i2))
    assert (h1 == h2).mean() > 0.999, f"hit mismatch {(h1 != h2).sum()}"
    both = h1 & h2
    # same winner (or same t for coplanar ties)
    np.testing.assert_allclose(t1[both], t2[both], rtol=2e-4, atol=2e-4)
    assert (i1[both] == i2[both]).mean() > 0.995


def test_cluster_respects_tmax(mesh_scene):
    scene = mesh_scene
    o, d = _random_rays(512, seed=1)
    t_inf = jnp.full((512,), 1e30, jnp.float32)
    _, t_ref, _ = pc.cluster_intersect(
        scene.clusters, scene.prims, o, d, t_inf, interpret=True
    )
    # shorten t_max to half the first-hit distance: those rays must miss
    t_half = jnp.asarray(np.asarray(t_ref) * 0.5)
    h, _, _ = pc.cluster_intersect(
        scene.clusters, scene.prims, o, d, t_half, interpret=True
    )
    assert not bool(np.asarray(h).any())


def test_cluster_any_hit(mesh_scene):
    scene = mesh_scene
    o, d = _random_rays(512, seed=2)
    t_max = jnp.full((512,), 1e30, jnp.float32)
    h_brute = np.asarray(isect.intersect_p_brute(scene.prims, o, d, t_max))
    h_pc = np.asarray(
        pc.cluster_intersect_p(scene.clusters, scene.prims, o, d, t_max,
                               interpret=True)
    )
    assert (h_brute == h_pc).mean() > 0.999


def test_cluster_any_hit_dead_lanes_and_tmax(mesh_scene):
    """The early-exit any-hit kernel: masked lanes (t_max <= 2e-4) read
    unoccluded, and hits beyond t_max don't occlude."""
    scene = mesh_scene
    o, d = _random_rays(768, seed=3)
    _, t_ref, _ = pc.cluster_intersect(
        scene.clusters, scene.prims, o, d,
        jnp.full((768,), 1e30, jnp.float32), interpret=True,
    )
    t_max = np.asarray(t_ref) * 0.5  # halve: first hits fall out of range
    dead = np.arange(768) % 4 == 0
    t_max[dead] = 1e-4
    t_max = jnp.asarray(t_max.astype(np.float32))
    occ = np.asarray(
        pc.cluster_intersect_p(scene.clusters, scene.prims, o, d, t_max,
                               interpret=True)
    )
    oracle = np.asarray(isect.intersect_p_brute(scene.prims, o, d, t_max))
    assert not occ[dead].any()
    assert (occ[~dead] == oracle[~dead]).mean() > 0.999
