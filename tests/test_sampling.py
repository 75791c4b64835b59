"""Sampling / RNG tests: determinism, distribution sanity, warps, MIS.

The reference only unit-tests geometry; these cover the subsystems that
replace pkg/pbrt/{rng,sampling,lowdiscrepancy}.go and pkg/sampler/.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gopbrt_tpu.ops import rng, sampling


class TestCounterRng:
    def test_deterministic_and_order_independent(self):
        px = jnp.arange(1000, dtype=jnp.uint32)
        a = rng.sample_1d(7, px, 0, 0)
        b = rng.sample_1d(7, px, 0, 0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # permuting the batch permutes outputs identically (sharding-safe)
        perm = np.random.default_rng(0).permutation(1000)
        c = rng.sample_1d(7, px[perm], 0, 0)
        np.testing.assert_array_equal(np.asarray(a)[perm], np.asarray(c))

    def test_distinct_streams(self):
        px = jnp.arange(4096, dtype=jnp.uint32)
        u0 = np.asarray(rng.sample_1d(7, px, 0, 0))
        u1 = np.asarray(rng.sample_1d(7, px, 0, 1))
        u2 = np.asarray(rng.sample_1d(7, px, 1, 0))
        u3 = np.asarray(rng.sample_1d(8, px, 0, 0))
        assert not np.allclose(u0, u1)
        assert not np.allclose(u0, u2)
        assert not np.allclose(u0, u3)

    def test_uniformity(self):
        px = jnp.arange(1 << 16, dtype=jnp.uint32)
        u = np.asarray(rng.sample_1d(3, px, 0, 5))
        assert 0.0 <= u.min() and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 5e-3
        assert abs(u.var() - 1.0 / 12.0) < 5e-3
        hist, _ = np.histogram(u, bins=64, range=(0, 1))
        assert hist.min() > 0.8 * (1 << 16) / 64

    def test_stratified_2d_covers_strata(self):
        # quirk #6 in SURVEY §6: reference stratification is broken; ours
        # must actually place sample s in stratum s.
        px = jnp.zeros((16,), jnp.uint32)
        s = jnp.arange(16, dtype=jnp.uint32)
        pts = np.asarray(rng.stratified_2d(0, px, s, 0, 4, 4))
        cells = {(int(p[0] * 4), int(p[1] * 4)) for p in pts}
        assert len(cells) == 16


class TestWarps:
    def test_concentric_disk_in_unit_disk(self):
        u = jnp.asarray(np.random.default_rng(1).random((4096, 2)), jnp.float32)
        d = np.asarray(sampling.concentric_sample_disk(u))
        r = np.hypot(d[:, 0], d[:, 1])
        assert r.max() <= 1.0 + 1e-6
        # area uniformity: mean radius of uniform disk = 2/3
        assert abs(r.mean() - 2.0 / 3.0) < 0.01
        # center maps to center
        np.testing.assert_allclose(
            sampling.concentric_sample_disk(jnp.array([[0.5, 0.5]])), [[0, 0]]
        )

    def test_cosine_hemisphere(self):
        u = jnp.asarray(np.random.default_rng(2).random((8192, 2)), jnp.float32)
        w = np.asarray(sampling.cosine_sample_hemisphere(u))
        assert (w[:, 2] >= 0).all()
        np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)
        # E[cos theta] = 2/3 for cosine-weighted
        assert abs(w[:, 2].mean() - 2.0 / 3.0) < 0.01

    def test_uniform_sphere(self):
        u = jnp.asarray(np.random.default_rng(3).random((8192, 2)), jnp.float32)
        w = np.asarray(sampling.uniform_sample_sphere(u))
        np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)
        assert abs(w.mean(axis=0)).max() < 0.03

    def test_uniform_cone(self):
        ctm = 0.8
        u = jnp.asarray(np.random.default_rng(4).random((4096, 2)), jnp.float32)
        w = np.asarray(sampling.uniform_sample_cone(u, ctm))
        assert w[:, 2].min() >= ctm - 1e-6

    def test_triangle_barycentrics(self):
        u = jnp.asarray(np.random.default_rng(5).random((4096, 2)), jnp.float32)
        b = np.asarray(sampling.uniform_sample_triangle(u))
        assert (b >= 0).all() and (b.sum(axis=-1) <= 1 + 1e-6).all()


class TestMis:
    def test_power_heuristic_limits(self):
        # sampling.go:204-212 semantics
        assert float(sampling.power_heuristic(1, 1.0, 1, 1.0)) == pytest.approx(0.5)
        assert float(sampling.power_heuristic(1, 10.0, 1, 0.01)) == pytest.approx(
            1.0, abs=1e-4
        )
        assert float(sampling.power_heuristic(1, 0.0, 1, 0.0)) == 0.0

    def test_balance_heuristic(self):
        assert float(sampling.balance_heuristic(1, 2.0, 1, 2.0)) == pytest.approx(0.5)


class TestDistribution1D:
    def test_sample_discrete_proportional(self):
        f, cdf, fint = sampling.distribution_1d(jnp.array([1.0, 3.0, 0.0, 4.0]))
        u = jnp.asarray(np.random.default_rng(6).random(1 << 15), jnp.float32)
        idx, pmf = sampling.sample_discrete(f, cdf, fint, u)
        idx = np.asarray(idx)
        counts = np.bincount(idx, minlength=4) / idx.size
        np.testing.assert_allclose(counts, [1 / 8, 3 / 8, 0, 4 / 8], atol=0.01)
        # pmf of chosen entries
        pmf = np.asarray(pmf)
        np.testing.assert_allclose(
            pmf[idx == 1], 3.0 / 8.0, atol=1e-6
        )

    def test_all_zero_falls_back_uniform(self):
        f, cdf, fint = sampling.distribution_1d(jnp.zeros(4))
        u = jnp.asarray([0.1, 0.3, 0.6, 0.9], jnp.float32)
        idx, pmf = sampling.sample_discrete(f, cdf, fint, u)
        np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 3])
        np.testing.assert_allclose(np.asarray(pmf), 0.25)


class TestRadicalInverse:
    def test_base2_first_values(self):
        # lowdiscrepancy.go radical inverse: 1->0.5, 2->0.25, 3->0.75
        a = jnp.arange(8, dtype=jnp.uint32)
        out = np.asarray(sampling.radical_inverse(0, a))
        np.testing.assert_allclose(
            out, [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875], atol=1e-7
        )

    def test_base3(self):
        a = jnp.arange(4, dtype=jnp.uint32)
        out = np.asarray(sampling.radical_inverse(1, a))
        np.testing.assert_allclose(out, [0.0, 1 / 3, 2 / 3, 1 / 9], atol=1e-5)

    def test_low_discrepancy_uniform(self):
        a = jnp.arange(4096, dtype=jnp.uint32)
        for b in (0, 1, 2):
            u = np.asarray(sampling.radical_inverse(b, a))
            assert abs(u.mean() - 0.5) < 2e-3
