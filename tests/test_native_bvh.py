"""Native (C++) BVH builder tests: structural invariants for both build
methods (SAH / HLBVH) and traversal agreement with the NumPy builder and
the brute-force oracle (the bvh_test.go cross-check pattern)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gopbrt_tpu import native
from gopbrt_tpu.ops import bvh as bvh_mod
from gopbrt_tpu.ops import intersect
from tests.test_bvh import prim_bounds, random_rays, random_sphere_scene

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native tier"
)


def check_invariants(out, n_prims, max_leaf):
    node_lo, node_hi, node_right, node_first, node_count, node_axis, order = out
    n_nodes = node_lo.shape[0]
    assert sorted(order.tolist()) == list(range(n_prims))
    for i in range(n_nodes):
        if node_count[i] == 0:
            assert i + 1 < n_nodes
            assert node_right[i] > i
            for ch in (i + 1, node_right[i]):
                assert (node_lo[ch] >= node_lo[i] - 1e-4).all()
                assert (node_hi[ch] <= node_hi[i] + 1e-4).all()
        else:
            assert 1 <= node_count[i] <= max_leaf
            assert 0 <= node_first[i] <= n_prims - node_count[i]


@pytest.mark.parametrize("method", ["sah", "hlbvh"])
@pytest.mark.parametrize("n", [1, 2, 5, 64, 333])
def test_invariants(method, n):
    prims = random_sphere_scene(n, seed=n)
    lo, hi = prim_bounds(prims)
    out = native.bvh_build(lo, hi, max_leaf=4, method=method)
    assert out is not None
    check_invariants(out, n, 4)


@pytest.mark.parametrize("method", ["sah", "hlbvh"])
def test_duplicate_centroids(method):
    # all prims at the same point: identical Morton codes / zero extent
    lo = np.zeros((37, 3), np.float32)
    hi = np.ones((37, 3), np.float32)
    out = native.bvh_build(lo, hi, max_leaf=4, method=method)
    assert out is not None
    check_invariants(out, 37, 4)


@pytest.mark.parametrize("method", ["sah", "hlbvh"])
def test_traversal_matches_bruteforce(method):
    prims = random_sphere_scene(200, seed=9)
    lo, hi = prim_bounds(prims)
    bvh = bvh_mod.build_from_bounds(lo, hi, backend="native", method=method)
    o, d = random_rays(256, seed=40)
    t_max = jnp.full((256,), 1e30)
    bh, bt, bi = intersect.intersect_brute(prims, o, d, t_max)
    vh, vt, vi = bvh_mod.bvh_intersect(bvh, prims, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(vh))
    hitm = np.asarray(bh)
    np.testing.assert_allclose(
        np.asarray(bt)[hitm], np.asarray(vt)[hitm], rtol=2e-3
    )
    bp = intersect.intersect_p_brute(prims, o, d, t_max)
    vp = bvh_mod.bvh_intersect_p(bvh, prims, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(bp), np.asarray(vp))


def test_native_matches_numpy_traversal():
    """Same rays through native-built and NumPy-built trees must agree on
    hit set and distances (trees may differ structurally)."""
    prims = random_sphere_scene(150, seed=11)
    lo, hi = prim_bounds(prims)
    b_native = bvh_mod.build_from_bounds(lo, hi, backend="native")
    b_numpy = bvh_mod.build_from_bounds(lo, hi, backend="numpy")
    o, d = random_rays(200, seed=42)
    t_max = jnp.full((200,), 1e30)
    nh, nt, _ = bvh_mod.bvh_intersect(b_native, prims, o, d, t_max)
    ph, pt, _ = bvh_mod.bvh_intersect(b_numpy, prims, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(nh), np.asarray(ph))
    hitm = np.asarray(nh)
    np.testing.assert_allclose(
        np.asarray(nt)[hitm], np.asarray(pt)[hitm], rtol=2e-3
    )


def test_large_parallel_build():
    """Exercises the parallel subtree path (>16k prims) and HLBVH treelets."""
    rng = np.random.default_rng(0)
    c = rng.uniform(-100, 100, (40000, 3)).astype(np.float32)
    r = rng.uniform(0.1, 1.0, (40000, 1)).astype(np.float32)
    lo, hi = c - r, c + r
    for method in ("sah", "hlbvh"):
        out = native.bvh_build(lo, hi, max_leaf=4, method=method)
        assert out is not None
        node_count = out[4]
        order = out[6]
        assert sorted(order.tolist()) == list(range(40000))
        assert node_count.max() <= 4
