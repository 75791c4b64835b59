"""Geometry-core unit tests.

Ports the exact-value expectations of the reference's
pkg/geometry/xyz_test.go and pkg/pbrt/transform_test.go (including the
empty stubs it left — filled in here), plus robustness tests the reference
lacks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gopbrt_tpu.ops import geom


class TestVectors:
    # xyz_test.go:9-162 equivalents on batched arrays
    def test_add_sub_mul(self):
        a = jnp.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
        b = jnp.array([[10.0, 20.0, 30.0], [1.0, 1.0, 1.0]])
        np.testing.assert_allclose(a + b, [[11, 22, 33], [5, 6, 7]])
        np.testing.assert_allclose(b - a, [[9, 18, 27], [-3, -4, -5]])
        np.testing.assert_allclose(a * 2.0, [[2, 4, 6], [8, 10, 12]])

    def test_dot_cross(self):
        a = jnp.array([1.0, 0.0, 0.0])
        b = jnp.array([0.0, 1.0, 0.0])
        assert float(geom.dot(a, b)) == 0.0
        np.testing.assert_allclose(geom.cross(a, b), [0, 0, 1])
        # batched
        aa = jnp.stack([a, b])
        bb = jnp.stack([b, a])
        np.testing.assert_allclose(geom.cross(aa, bb), [[0, 0, 1], [0, 0, -1]])

    def test_normalize_length(self):
        v = jnp.array([3.0, 4.0, 0.0])
        assert float(geom.length(v)) == 5.0
        np.testing.assert_allclose(geom.normalize(v), [0.6, 0.8, 0.0], rtol=1e-6)

    def test_normalize_zero_guarded(self):
        v = jnp.zeros((3,))
        out = geom.normalize(v, eps=1e-20)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_face_forward(self):
        n = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        v = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
        out = geom.face_forward(n, v)
        np.testing.assert_allclose(out, [[0, 0, -1], [0, 0, 1]])

    def test_coordinate_system_orthonormal(self):
        rng = np.random.default_rng(0)
        v1 = rng.normal(size=(64, 3)).astype(np.float32)
        v1 /= np.linalg.norm(v1, axis=-1, keepdims=True)
        v2, v3 = geom.coordinate_system(jnp.asarray(v1))
        np.testing.assert_allclose(geom.dot(v1, v2), 0.0, atol=1e-5)
        np.testing.assert_allclose(geom.dot(v1, v3), 0.0, atol=1e-5)
        np.testing.assert_allclose(geom.dot(v2, v3), 0.0, atol=1e-5)
        np.testing.assert_allclose(geom.length(v2), 1.0, atol=1e-5)
        np.testing.assert_allclose(geom.length(v3), 1.0, atol=1e-5)


class TestTransforms:
    def test_translate_point(self):
        m = geom.translate([1.0, 2.0, 3.0])
        p = jnp.array([1.0, 1.0, 1.0])
        np.testing.assert_allclose(geom.apply_point_affine(m, p), [2, 3, 4])
        # vectors unaffected by translation
        np.testing.assert_allclose(geom.apply_vector(m, p), [1, 1, 1])

    def test_scale(self):
        m = geom.scale(2.0, 3.0, 4.0)
        np.testing.assert_allclose(
            geom.apply_point_affine(m, jnp.array([1.0, 1.0, 1.0])), [2, 3, 4]
        )

    def test_rotate_x90(self):
        m = geom.rotate_x(90.0)
        out = geom.apply_point_affine(m, jnp.array([0.0, 1.0, 0.0]))
        np.testing.assert_allclose(out, [0, 0, 1], atol=1e-6)

    def test_rotate_matches_axis_rotations(self):
        for deg in (17.0, 90.0, -45.0):
            np.testing.assert_allclose(
                geom.rotate(deg, [1.0, 0.0, 0.0]), geom.rotate_x(deg), atol=1e-6
            )
            np.testing.assert_allclose(
                geom.rotate(deg, [0.0, 1.0, 0.0]), geom.rotate_y(deg), atol=1e-6
            )

    def test_inverse_roundtrip(self):
        m = geom.matmul(
            geom.translate([5.0, -3.0, 2.0]),
            geom.matmul(geom.rotate_y(33.0), geom.scale(2.0, 2.0, 2.0)),
        )
        mi = geom.inverse(m)
        # f32 Gauss elimination: ~1e-4 relative error is expected
        np.testing.assert_allclose(geom.matmul(m, mi), np.eye(4), atol=2e-2)
        p = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(
            geom.apply_point_affine(mi, geom.apply_point_affine(m, p)), p, atol=1e-3
        )

    def test_matmul_correct_last_row(self):
        # The reference's Matrix4x4.Mul is wrong when row 3 != (0,0,0,1)
        # (transform.go:66); verify we implement the true product.
        a = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
        b = jnp.asarray((np.arange(16, dtype=np.float32) * 2 + 1).reshape(4, 4))
        np.testing.assert_allclose(geom.matmul(a, b), np.asarray(a) @ np.asarray(b))

    def test_look_at_maps_origin_to_eye(self):
        eye = [150.0, 150.0, 150.0]
        m = geom.look_at(eye, [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        np.testing.assert_allclose(
            geom.apply_point_affine(m, jnp.zeros(3)), eye, atol=1e-4
        )
        # camera +z looks toward target
        d = geom.apply_vector(m, jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(
            geom.normalize(d), geom.normalize(jnp.array([-1.0, -1.0, -1.0])), atol=1e-6
        )

    def test_normal_transform_stays_perpendicular(self):
        m = geom.scale(1.0, 2.0, 0.5)
        m_inv = geom.inverse(m)
        # tangent on z=const plane, normal z
        tangent = jnp.array([1.0, 1.0, 0.0])
        normal = jnp.array([0.0, 0.0, 1.0])
        tt = geom.apply_vector(m, tangent)
        nt = geom.apply_normal(m_inv, normal)
        assert abs(float(geom.dot(tt, nt))) < 1e-6

    def test_swaps_handedness(self):
        assert bool(geom.swaps_handedness(geom.scale(-1.0, 1.0, 1.0)))
        assert not bool(geom.swaps_handedness(geom.rotate_x(90.0)))


class TestBounds:
    def test_union_surface_area(self):
        lo, hi = geom.bounds_empty()
        lo, hi = geom.bounds_union_point(lo, hi, jnp.array([0.0, 0.0, 0.0]))
        lo, hi = geom.bounds_union_point(lo, hi, jnp.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(lo, [0, 0, 0])
        np.testing.assert_allclose(hi, [1, 2, 3])
        assert float(geom.bounds_surface_area(lo, hi)) == pytest.approx(22.0)

    def test_intersect_p_hits_and_misses(self):
        lo = jnp.array([-1.0, -1.0, -1.0])
        hi = jnp.array([1.0, 1.0, 1.0])
        o = jnp.array([[0.0, 0.0, -5.0], [0.0, 5.0, -5.0], [0.0, 0.0, 5.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        hit = geom.bounds_intersect_p(lo, hi, o, d, jnp.full((3,), 1e30))
        assert list(np.asarray(hit)) == [True, False, False]

    def test_intersect_p_respects_tmax(self):
        lo = jnp.array([-1.0, -1.0, -1.0])
        hi = jnp.array([1.0, 1.0, 1.0])
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        assert not bool(
            geom.bounds_intersect_p(lo, hi, o, d, jnp.array([2.0]))[0]
        )

    def test_transform_bounds(self):
        lo = jnp.array([0.0, 0.0, 0.0])
        hi = jnp.array([1.0, 1.0, 1.0])
        m = geom.rotate_z(90.0)
        tlo, thi = geom.bounds_transform(m, lo, hi)
        np.testing.assert_allclose(tlo, [-1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(thi, [0, 1, 1], atol=1e-6)


class TestRayOffset:
    def test_offset_moves_off_surface(self):
        # ray_test.go:10-19 analogue: spawn point must clear the surface
        p = jnp.array([[0.0, 0.0, 0.0]])
        p_err = jnp.array([[1e-4, 1e-4, 1e-4]])
        n = jnp.array([[0.0, 0.0, 1.0]])
        w_up = jnp.array([[0.0, 0.0, 1.0]])
        w_dn = jnp.array([[0.0, 0.0, -1.0]])
        up = geom.offset_ray_origin(p, p_err, n, w_up)
        dn = geom.offset_ray_origin(p, p_err, n, w_dn)
        assert float(up[0, 2]) > 0.0
        assert float(dn[0, 2]) < 0.0
