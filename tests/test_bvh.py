"""BVH tests: the reference's oracle pattern (bvh_test.go cross-checks the
BVH against the Simple brute-force aggregate on identical rays) scaled up
to random scenes and random rays."""

import numpy as np
import jax.numpy as jnp
import pytest

from gopbrt_tpu.ops import bvh as bvh_mod
from gopbrt_tpu.ops import geom, intersect
from tests.test_intersect import make_prims, sphere_entry


def random_sphere_scene(n, seed=0, spread=50.0):
    rng = np.random.default_rng(seed)
    entries = []
    for i in range(n):
        c = rng.uniform(-spread, spread, 3)
        r = rng.uniform(0.3, 3.0)
        entries.append(sphere_entry(c, r))
    return make_prims(entries)


def prim_bounds(prims):
    """World bounds per primitive (host, for building)."""
    lo, hi = [], []
    pt = np.asarray(prims.prim_type)
    params = np.asarray(prims.params)
    o2w = np.asarray(prims.obj_to_world)
    for i in range(pt.shape[0]):
        if pt[i] == intersect.SPHERE:
            r = params[i, 0]
            c = o2w[i, :3, 3]
            lo.append(c - r)
            hi.append(c + r)
        elif pt[i] == intersect.DISK:
            r = params[i, 1]
            # conservative: disk in z=h plane transformed
            blo = np.array([-r, -r, params[i, 0] - 1e-3])
            bhi = np.array([r, r, params[i, 0] + 1e-3])
            corners = np.array(
                [[x, y, z] for x in (blo[0], bhi[0]) for y in (blo[1], bhi[1])
                 for z in (blo[2], bhi[2])]
            )
            tc = corners @ o2w[i, :3, :3].T + o2w[i, :3, 3]
            lo.append(tc.min(axis=0))
            hi.append(tc.max(axis=0))
        else:
            v = params[i, :9].reshape(3, 3)
            lo.append(v.min(axis=0))
            hi.append(v.max(axis=0))
    return np.asarray(lo, np.float32), np.asarray(hi, np.float32)


def random_rays(n, seed=1, spread=80.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestBuild:
    def test_flat_layout_invariants(self):
        prims = random_sphere_scene(100)
        bvh = bvh_mod.build_from_bounds(*prim_bounds(prims))
        nr = np.asarray(bvh.node_right)
        nc = np.asarray(bvh.node_count)
        nf = np.asarray(bvh.node_first)
        order = np.asarray(bvh.prim_order)
        # every prim appears exactly once in the ordered list
        assert sorted(order.tolist()) == list(range(100))
        # interior nodes: right child > own index; leaves: count <= MAX_LEAF
        for i in range(nr.shape[0]):
            if nc[i] == 0:
                assert nr[i] > i
            else:
                assert 1 <= nc[i] <= bvh_mod.MAX_LEAF
                assert 0 <= nf[i] <= 100 - nc[i]

    def test_child_bounds_nested(self):
        prims = random_sphere_scene(64, seed=3)
        bvh = bvh_mod.build_from_bounds(*prim_bounds(prims))
        lo = np.asarray(bvh.node_lo)
        hi = np.asarray(bvh.node_hi)
        nr = np.asarray(bvh.node_right)
        nc = np.asarray(bvh.node_count)
        for i in range(nr.shape[0]):
            if nc[i] == 0:
                for ch in (i + 1, nr[i]):
                    assert (lo[ch] >= lo[i] - 1e-4).all()
                    assert (hi[ch] <= hi[i] + 1e-4).all()


class TestOracle:
    """bvh_test.go:43-141's strategy: BVH must agree with brute force."""

    @pytest.mark.parametrize("n_prims,seed", [(10, 0), (100, 1), (300, 2)])
    def test_closest_hit_matches_bruteforce(self, n_prims, seed):
        prims = random_sphere_scene(n_prims, seed=seed)
        bvh = bvh_mod.build_from_bounds(*prim_bounds(prims))
        o, d = random_rays(256, seed=seed + 10)
        t_max = jnp.full((256,), 1e30)
        bh, bt, bi = intersect.intersect_brute(prims, o, d, t_max)
        vh, vt, vi = bvh_mod.bvh_intersect(bvh, prims, o, d, t_max)
        np.testing.assert_array_equal(np.asarray(bh), np.asarray(vh))
        hit = np.asarray(bh)
        # rtol 2e-3: grazing (near-tangent) hits are ill-conditioned in f32
        # and the gather vs vmap code paths fuse with different rounding
        np.testing.assert_allclose(
            np.asarray(bt)[hit], np.asarray(vt)[hit], rtol=2e-3
        )
        # prim ids must agree wherever the hit is not a near-tie
        bt_h, vt_h = np.asarray(bt)[hit], np.asarray(vt)[hit]
        clear = np.abs(bt_h - vt_h) <= 1e-6 * np.maximum(bt_h, 1.0)
        np.testing.assert_array_equal(
            np.asarray(bi)[hit][clear], np.asarray(vi)[hit][clear]
        )

    def test_any_hit_matches_bruteforce(self):
        prims = random_sphere_scene(100, seed=5)
        bvh = bvh_mod.build_from_bounds(*prim_bounds(prims))
        o, d = random_rays(256, seed=20)
        t_max = jnp.full((256,), 1e30)
        bp = intersect.intersect_p_brute(prims, o, d, t_max)
        vp = bvh_mod.bvh_intersect_p(bvh, prims, o, d, t_max)
        np.testing.assert_array_equal(np.asarray(bp), np.asarray(vp))

    def test_tmax_limited(self):
        prims = random_sphere_scene(50, seed=7)
        bvh = bvh_mod.build_from_bounds(*prim_bounds(prims))
        o, d = random_rays(128, seed=21)
        t_max = jnp.full((128,), 25.0)
        bh, bt, bi = intersect.intersect_brute(prims, o, d, t_max)
        vh, vt, vi = bvh_mod.bvh_intersect(bvh, prims, o, d, t_max)
        np.testing.assert_array_equal(np.asarray(bh), np.asarray(vh))

    def test_three_sphere_fixture(self):
        # the bvh_test.go fixture through the BVH path
        prims = make_prims(
            [
                sphere_entry([0.0, 0.0, 0.0], 0.5),
                sphere_entry([2.0, 0.0, 0.0], 0.5),
                sphere_entry([4.0, 0.0, 0.0], 0.5),
            ]
        )
        bvh = bvh_mod.build_from_bounds(*prim_bounds(prims))
        o = jnp.array([[-5.0, 0.0, 0.0], [9.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
        hit, t, idx = bvh_mod.bvh_intersect(bvh, prims, o, d, jnp.full((2,), 1e30))
        assert list(np.asarray(hit)) == [True, True]
        assert list(np.asarray(idx)) == [0, 2]
        np.testing.assert_allclose(np.asarray(t), [4.5, 4.5], rtol=1e-5)
