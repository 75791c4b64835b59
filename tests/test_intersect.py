"""Shape-intersection tests.

Ports the reference's 3-sphere fixture semantics
(pkg/accelerator/simple_test.go:10-108) — closest-hit identity and the
table-driven any-hit cases — onto the SoA brute-force aggregate, plus
sphere/disk/triangle unit tests and transform/instancing checks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gopbrt_tpu.ops import geom, intersect


def make_prims(entries):
    """entries: list of (ptype, obj_to_world, params(list), material_id)."""
    n = len(entries)
    prim_type = np.zeros(n, np.int32)
    o2w = np.zeros((n, 4, 4), np.float32)
    w2o = np.zeros((n, 4, 4), np.float32)
    params = np.zeros((n, 9), np.float32)
    mat = np.zeros(n, np.int32)
    for i, (pt, m, pr, mid) in enumerate(entries):
        prim_type[i] = pt
        m = np.asarray(m, np.float32)
        o2w[i] = m
        w2o[i] = np.linalg.inv(m)
        params[i, : len(pr)] = pr
        mat[i] = mid
    return intersect.Primitives(
        prim_type=jnp.asarray(prim_type),
        obj_to_world=jnp.asarray(o2w),
        world_to_obj=jnp.asarray(w2o),
        params=jnp.asarray(params),
        material_id=jnp.asarray(mat),
        area_light_id=jnp.full((n,), -1, jnp.int32),
        reverse_orientation=jnp.zeros(n, bool),
    )


def sphere_entry(center, radius, z_min=None, z_max=None, phi_max=2 * np.pi):
    if z_min is None:
        z_min = -radius
    if z_max is None:
        z_max = radius
    return (
        intersect.SPHERE,
        np.asarray(geom.translate(center)),
        [radius, z_min, z_max, phi_max],
        0,
    )


# the simple_test.go:10-38 fixture: spheres at x = 0, 2, 4 with radius 0.5
@pytest.fixture(scope="module")
def three_spheres():
    return make_prims(
        [
            sphere_entry([0.0, 0.0, 0.0], 0.5),
            sphere_entry([2.0, 0.0, 0.0], 0.5),
            sphere_entry([4.0, 0.0, 0.0], 0.5),
        ]
    )


class TestBruteForce:
    def test_closest_hit_identity(self, three_spheres):
        # ray down +x must hit sphere 0 at x=-0.5 (simple_test.go:40-57)
        o = jnp.array([[-5.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        hit, t, idx = intersect.intersect_brute(
            three_spheres, o, d, jnp.full((1,), 1e30)
        )
        assert bool(hit[0])
        assert int(idx[0]) == 0
        assert float(t[0]) == pytest.approx(4.5, rel=1e-5)
        si = intersect.surface_interaction(three_spheres, hit, t, idx, o, d)
        np.testing.assert_allclose(si.p[0], [-0.5, 0, 0], atol=1e-5)
        np.testing.assert_allclose(si.n[0], [-1, 0, 0], atol=1e-5)

    def test_reverse_ray_hits_last(self, three_spheres):
        o = jnp.array([[9.0, 0.0, 0.0]])
        d = jnp.array([[-1.0, 0.0, 0.0]])
        hit, t, idx = intersect.intersect_brute(
            three_spheres, o, d, jnp.full((1,), 1e30)
        )
        assert bool(hit[0]) and int(idx[0]) == 2
        assert float(t[0]) == pytest.approx(4.5, rel=1e-5)

    def test_intersect_p_table(self, three_spheres):
        # simple_test.go:69-108 table
        cases = [
            ([-5, 0, 0], [1, 0, 0], True),
            ([-5, 0, 0], [-1, 0, 0], False),
            ([-5, 2, 0], [1, 0, 0], False),
            ([2, 2, 0], [0, -1, 0], True),
            ([1, 0, 0], [1, 0, 0], True),  # between spheres, toward #1
        ]
        o = jnp.asarray([c[0] for c in cases], jnp.float32)
        d = jnp.asarray([c[1] for c in cases], jnp.float32)
        out = intersect.intersect_p_brute(
            three_spheres, o, d, jnp.full((len(cases),), 1e30)
        )
        assert list(np.asarray(out)) == [c[2] for c in cases]

    def test_tmax_respected(self, three_spheres):
        o = jnp.array([[-5.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        hit, _, _ = intersect.intersect_brute(three_spheres, o, d, jnp.array([4.0]))
        assert not bool(hit[0])

    def test_ray_from_inside_sphere(self, three_spheres):
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        hit, t, idx = intersect.intersect_brute(
            three_spheres, o, d, jnp.full((1,), 1e30)
        )
        # exits sphere 0 at x=+0.5 (t1 retry path, sphere.go:110-135)
        assert bool(hit[0]) and int(idx[0]) == 0
        assert float(t[0]) == pytest.approx(0.5, rel=1e-4)


class TestSphereGeometry:
    def test_uv_and_derivatives(self):
        prims = make_prims([sphere_entry([0.0, 0.0, 0.0], 1.0)])
        o = jnp.array([[-5.0, 0.0, 0.0], [0.0, 0.0, 5.0]])
        d = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0]])
        hit, t, idx = intersect.intersect_brute(prims, o, d, jnp.full((2,), 1e30))
        si = intersect.surface_interaction(prims, hit, t, idx, o, d)
        # n is unit and points outward (against ray for outside hits)
        np.testing.assert_allclose(geom.length(si.n), 1.0, atol=1e-5)
        assert float(geom.dot(si.n, d)[0]) < 0
        # dpdu/dpdv orthogonal-ish to normal
        np.testing.assert_allclose(geom.dot(si.n, si.dpdu), 0.0, atol=1e-4)
        np.testing.assert_allclose(geom.dot(si.n, si.dpdv), 0.0, atol=1e-4)
        # pole hit (second ray): v at z=+1 -> theta=0
        assert 0.0 <= float(si.uv[1, 1]) <= 1.0

    def test_partial_sphere_clips(self):
        # upper hemisphere only: z in [0, r]
        prims = make_prims([sphere_entry([0.0, 0.0, 0.0], 1.0, z_min=0.0)])
        o = jnp.array([[-5.0, 0.0, 0.5], [-5.0, 0.0, -0.5]])
        d = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        hit, _, _ = intersect.intersect_brute(prims, o, d, jnp.full((2,), 1e30))
        assert bool(hit[0]) and not bool(hit[1])

    def test_scaled_instance(self):
        # ellipsoid via transform: scale(2,1,1) on unit sphere
        m = geom.matmul(geom.translate([0.0, 0.0, 0.0]), geom.scale(2.0, 1.0, 1.0))
        prims = make_prims([(intersect.SPHERE, np.asarray(m), [1.0, -1.0, 1.0, 2 * np.pi], 0)])
        o = jnp.array([[-5.0, 0.0, 0.0], [0.0, -5.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        hit, t, idx = intersect.intersect_brute(prims, o, d, jnp.full((2,), 1e30))
        assert bool(hit[0]) and bool(hit[1])
        assert float(t[0]) == pytest.approx(3.0, rel=1e-4)  # x extent ±2
        assert float(t[1]) == pytest.approx(4.0, rel=1e-4)  # y extent ±1
        si = intersect.surface_interaction(prims, hit, t, idx, o, d)
        np.testing.assert_allclose(si.n[0], [-1, 0, 0], atol=1e-4)


class TestDisk:
    def test_hit_and_annulus(self):
        # disk at z=0.01 radius 3 inner 1 (disk.go:64-126 semantics)
        prims = make_prims(
            [(intersect.DISK, np.eye(4), [0.01, 3.0, 1.0, 2 * np.pi], 0)]
        )
        o = jnp.array([[2.0, 0.0, 5.0], [0.0, 0.0, 5.0], [4.0, 0.0, 5.0]])
        d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (3, 1))
        hit, t, idx = intersect.intersect_brute(prims, o, d, jnp.full((3,), 1e30))
        assert list(np.asarray(hit)) == [True, False, False]  # annulus hole + miss
        si = intersect.surface_interaction(prims, hit, t, idx, o, d)
        np.testing.assert_allclose(si.p[0], [2.0, 0.0, 0.01], atol=1e-5)
        np.testing.assert_allclose(si.n[0], [0, 0, 1], atol=1e-6)

    def test_rotated_disk_as_floor(self):
        # demo scene: disk rotated X+90 = y-up floor (server.go:74-102)
        m = geom.matmul(geom.translate([0.0, 0.0, 0.0]), geom.rotate_x(90.0))
        prims = make_prims(
            [(intersect.DISK, np.asarray(m), [0.01, 100.0, 0.0, 2 * np.pi], 0)]
        )
        o = jnp.array([[5.0, 10.0, 5.0]])
        d = jnp.array([[0.0, -1.0, 0.0]])
        hit, t, idx = intersect.intersect_brute(prims, o, d, jnp.full((1,), 1e30))
        assert bool(hit[0])
        si = intersect.surface_interaction(prims, hit, t, idx, o, d)
        assert abs(float(si.p[0, 1])) < 0.1  # lands near y=0 plane
        assert abs(abs(float(si.n[0, 1])) - 1.0) < 1e-4  # normal ±y

    def test_parallel_ray_misses(self):
        prims = make_prims(
            [(intersect.DISK, np.eye(4), [0.0, 3.0, 0.0, 2 * np.pi], 0)]
        )
        o = jnp.array([[0.0, 5.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        hit, _, _ = intersect.intersect_brute(prims, o, d, jnp.full((1,), 1e30))
        assert not bool(hit[0])


class TestTriangle:
    def tri(self, p0, p1, p2):
        return make_prims(
            [(intersect.TRIANGLE, np.eye(4), list(p0) + list(p1) + list(p2), 0)]
        )

    def test_hit_inside_miss_outside(self):
        prims = self.tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.array([[0.25, 0.25, 5.0], [0.9, 0.9, 5.0]])
        d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (2, 1))
        hit, t, idx = intersect.intersect_brute(prims, o, d, jnp.full((2,), 1e30))
        assert bool(hit[0]) and not bool(hit[1])
        assert float(t[0]) == pytest.approx(5.0, rel=1e-5)
        si = intersect.surface_interaction(prims, hit, t, idx, o, d)
        np.testing.assert_allclose(np.abs(si.n[0]), [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(si.uv[0], [0.25, 0.25], atol=1e-5)

    def test_edge_and_vertex_hits(self):
        prims = self.tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.array([[0.5, 0.0, 5.0], [0.0, 0.0, 5.0]])
        d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (2, 1))
        hit, _, _ = intersect.intersect_brute(prims, o, d, jnp.full((2,), 1e30))
        assert bool(hit[0]) and bool(hit[1])


class TestMixedScene:
    def test_closest_across_types(self):
        prims = make_prims(
            [
                sphere_entry([0.0, 0.0, -2.0], 0.5),
                (intersect.DISK, np.eye(4), [-5.0, 10.0, 0.0, 2 * np.pi], 1),
                (
                    intersect.TRIANGLE,
                    np.eye(4),
                    [-1, -1, -8, 1, -1, -8, 0, 1, -8],
                    2,
                ),
            ]
        )
        o = jnp.tile(jnp.array([[0.0, 0.0, 5.0]]), (1, 1))
        d = jnp.array([[0.0, 0.0, -1.0]])
        hit, t, idx = intersect.intersect_brute(prims, o, d, jnp.full((1,), 1e30))
        assert bool(hit[0]) and int(idx[0]) == 0  # sphere is closest
        assert float(t[0]) == pytest.approx(6.5, rel=1e-4)
