"""Pallas fused-intersection kernel vs the jnp brute-force oracle.

Runs in interpreter mode on CPU (the kernel itself targets TPU); the same
oracle comparison runs compiled on real hardware in benchmarks.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from gopbrt_tpu.ops import intersect, pallas_intersect
from tests.test_bvh import random_sphere_scene, random_rays
from tests.test_intersect import make_prims, sphere_entry


def compare(prims, o, d, t_max):
    bh, bt, bi = map(np.asarray, intersect.intersect_brute(prims, o, d, t_max))
    ph, pt, pi = map(
        np.asarray,
        pallas_intersect.intersect_brute_pallas(prims, o, d, t_max, interpret=True),
    )
    np.testing.assert_array_equal(bh, ph)
    both = bh & ph
    np.testing.assert_allclose(bt[both], pt[both], rtol=2e-3)
    clear = np.abs(bt[both] - pt[both]) <= 1e-6 * np.maximum(bt[both], 1.0)
    np.testing.assert_array_equal(bi[both][clear], pi[both][clear])


class TestPallasOracle:
    def test_random_spheres(self):
        prims = random_sphere_scene(30, seed=4)
        o, d = random_rays(512, seed=40)
        compare(prims, o, d, jnp.full((512,), 1e30))

    def test_partial_shapes_wedges(self):
        prims = make_prims(
            [
                (intersect.SPHERE, np.asarray(np.eye(4), np.float32),
                 [1.0, 0.0, 1.0, 2 * math.pi], 0),
                (intersect.SPHERE, np.asarray(np.eye(4) + 0, np.float32),
                 [1.0, -1.0, 1.0, math.pi / 2], 0),
                (intersect.DISK, np.eye(4, dtype=np.float32),
                 [0.0, 2.0, 0.5, 1.5 * math.pi], 0),
            ]
        )
        o, d = random_rays(2048, seed=9, spread=5.0)
        compare(prims, o, d, jnp.full((2048,), 1e30))

    def test_triangles_and_mixed(self):
        prims = make_prims(
            [
                sphere_entry([0.0, 0.0, -2.0], 0.5),
                (intersect.DISK, np.eye(4, dtype=np.float32),
                 [-5.0, 10.0, 0.0, 2 * math.pi], 1),
                (intersect.TRIANGLE, np.eye(4, dtype=np.float32),
                 [-1, -1, -8, 1, -1, -8, 0, 1, -8], 2),
            ]
        )
        o, d = random_rays(1024, seed=11, spread=8.0)
        compare(prims, o, d, jnp.full((1024,), 1e30))

    def test_tmax_and_padding(self):
        # non-multiple-of-BLOCK ray count exercises the pad path
        prims = random_sphere_scene(10, seed=5)
        o, d = random_rays(777, seed=13)
        compare(prims, o, d, jnp.full((777,), 30.0))

    def test_any_hit(self):
        prims = random_sphere_scene(20, seed=6)
        o, d = random_rays(512, seed=14)
        t_max = jnp.full((512,), 1e30)
        bp = np.asarray(intersect.intersect_p_brute(prims, o, d, t_max))
        pp = np.asarray(
            pallas_intersect.intersect_p_brute_pallas(
                prims, o, d, t_max, interpret=True
            )
        )
        np.testing.assert_array_equal(bp, pp)

    def test_any_hit_early_exit_loop(self):
        """>UNROLL_MAX prims exercises the while_loop early-exit path;
        masked (dead) shadow lanes with tiny t_max must read unoccluded and
        must not stall the exit condition."""
        prims = random_sphere_scene(48, seed=7)
        o, d = random_rays(640, seed=15)
        t_max = np.full((640,), 1e30, np.float32)
        dead = np.arange(640) % 3 == 0
        t_max[dead] = 1e-4  # the integrators' masked-lane marker
        t_max = jnp.asarray(t_max)
        bp = np.asarray(intersect.intersect_p_brute(prims, o, d, t_max))
        pp = np.asarray(
            pallas_intersect.intersect_p_brute_pallas(
                prims, o, d, t_max, interpret=True
            )
        )
        assert not pp[dead].any()
        np.testing.assert_array_equal(bp[~dead], pp[~dead])

    def test_any_hit_respects_tmax(self):
        """A hit beyond t_max must not occlude (shadow semantics)."""
        prims = random_sphere_scene(40, seed=8)
        o, d = random_rays(512, seed=16)
        t_inf = jnp.full((512,), 1e30)
        bh, bt, _ = intersect.intersect_brute(prims, o, d, t_inf)
        bh, bt = np.asarray(bh), np.asarray(bt)
        t_half = jnp.asarray(np.where(bh, bt * 0.5, 1e30).astype(np.float32))
        pp = np.asarray(
            pallas_intersect.intersect_p_brute_pallas(
                prims, o, d, t_half, interpret=True
            )
        )
        # rays whose only hits lie beyond t_max: cannot be occluded unless a
        # second, nearer surface exists inside the shortened range
        oracle = np.asarray(intersect.intersect_p_brute(prims, o, d, t_half))
        np.testing.assert_array_equal(oracle, pp)
