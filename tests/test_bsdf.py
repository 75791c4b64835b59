"""BSDF tests: flag semantics, energy conservation, sample/pdf consistency.

Covers pkg/pbrt/reflection.go + microfacet.go behaviours — including the
fixed reference bugs (SURVEY §6 #5/#8): working rough-glass sampling and the
corrected FresnelSpecular eta term.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gopbrt_tpu.ops import bsdf
from gopbrt_tpu.ops.geom import INV_PI, dot


def mp_for(mat_type, n, **kw):
    d = dict(
        kd=jnp.full((n, 3), 0.5),
        sigma=jnp.zeros((n,)),
        kr=jnp.ones((n, 3)),
        kt=jnp.ones((n, 3)),
        eta=jnp.full((n,), 1.5),
        roughness=jnp.zeros((n,)),
    )
    d.update({k: jnp.asarray(v) for k, v in kw.items()})
    return bsdf.MaterialParams(mat_type=jnp.full((n,), mat_type, jnp.int32), **d)


def rand_dirs(n, seed, hemisphere=True):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if hemisphere:
        v[:, 2] = np.abs(v[:, 2])
    return jnp.asarray(v)


class TestLambert:
    def test_f_value(self):
        n = 4
        mp = mp_for(bsdf.MATTE, n, kd=jnp.full((n, 3), 0.7))
        wo = rand_dirs(n, 0)
        wi = rand_dirs(n, 1)
        f = bsdf.bsdf_f(mp, wo, wi)
        np.testing.assert_allclose(np.asarray(f), 0.7 * INV_PI, rtol=1e-5)

    def test_opposite_hemisphere_zero(self):
        n = 4
        mp = mp_for(bsdf.MATTE, n)
        wo = rand_dirs(n, 0)
        wi = rand_dirs(n, 1) * jnp.asarray([1.0, 1.0, -1.0])
        np.testing.assert_allclose(np.asarray(bsdf.bsdf_f(mp, wo, wi)), 0.0)

    def test_white_furnace(self):
        # MC estimate of albedo: E[f * cos / pdf] = kd for cosine sampling
        n = 8192
        mp = mp_for(bsdf.MATTE, n, kd=jnp.full((n, 3), 0.8))
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        rng = np.random.default_rng(2)
        u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
        uc = jnp.asarray(rng.random(n), jnp.float32)
        s = bsdf.bsdf_sample(mp, wo, u2, uc)
        est = np.asarray(
            s.f * (bsdf.abs_cos_theta(s.wi) / jnp.maximum(s.pdf, 1e-9))[:, None]
        ).mean(axis=0)
        np.testing.assert_allclose(est, 0.8, atol=0.02)

    def test_sample_pdf_consistency(self):
        n = 1024
        mp = mp_for(bsdf.MATTE, n)
        wo = rand_dirs(n, 3)
        rng = np.random.default_rng(4)
        s = bsdf.bsdf_sample(
            mp, wo, jnp.asarray(rng.random((n, 2)), jnp.float32),
            jnp.asarray(rng.random(n), jnp.float32),
        )
        pdf2 = bsdf.bsdf_pdf(mp, wo, s.wi)
        np.testing.assert_allclose(np.asarray(s.pdf), np.asarray(pdf2), rtol=1e-4)
        # sampled wi on same side as wo
        assert bool(jnp.all(bsdf.same_hemisphere(wo, s.wi)))


class TestOrenNayar:
    def test_reduces_to_lambert_at_sigma0(self):
        n = 16
        mp0 = mp_for(bsdf.MATTE, n, sigma=jnp.zeros((n,)))
        mp_on = mp_for(bsdf.MATTE, n, sigma=jnp.full((n,), 1e-6))
        wo, wi = rand_dirs(n, 5), rand_dirs(n, 6)
        np.testing.assert_allclose(
            np.asarray(bsdf.bsdf_f(mp0, wo, wi)),
            np.asarray(bsdf.bsdf_f(mp_on, wo, wi)),
            atol=1e-5,
        )

    def test_darker_at_grazing_than_lambert_normal_inc(self):
        n = 1
        mp = mp_for(bsdf.MATTE, n, sigma=jnp.full((n,), 30.0))
        wo = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        wi = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        f_on = float(bsdf.bsdf_f(mp, wo, wi)[0, 0])
        assert f_on < 0.5 * INV_PI  # A < 1 darkens retro-normal config


class TestMirror:
    def test_delta_reflection(self):
        n = 64
        mp = mp_for(bsdf.MIRROR, n, kr=jnp.full((n, 3), 0.9))
        wo = rand_dirs(n, 7)
        rng = np.random.default_rng(8)
        s = bsdf.bsdf_sample(
            mp, wo, jnp.asarray(rng.random((n, 2)), jnp.float32),
            jnp.asarray(rng.random(n), jnp.float32),
        )
        assert bool(jnp.all(s.is_specular))
        # wi is the mirror direction
        expect = np.asarray(wo) * np.array([-1, -1, 1])
        np.testing.assert_allclose(np.asarray(s.wi), expect, atol=1e-6)
        # f*cos/pdf == kr exactly (energy preserved)
        thr = np.asarray(
            s.f * (bsdf.abs_cos_theta(s.wi) / s.pdf)[:, None]
        )
        np.testing.assert_allclose(thr, 0.9, rtol=1e-5)
        # eval returns 0 for delta lobes (reflection.go specular F)
        np.testing.assert_allclose(np.asarray(bsdf.bsdf_f(mp, wo, s.wi)), 0.0)


class TestFresnel:
    def test_normal_incidence_value(self):
        # R0 = ((1.5-1)/(1.5+1))^2 = 0.04
        f = float(bsdf.fr_dielectric(jnp.asarray(1.0), 1.0, 1.5))
        assert f == pytest.approx(0.04, abs=1e-4)

    def test_total_internal_reflection(self):
        # from inside glass at grazing angle: TIR
        f = float(bsdf.fr_dielectric(jnp.asarray(-0.2), 1.0, 1.5))
        assert f == pytest.approx(1.0)

    def test_grazing_goes_to_one(self):
        f = float(bsdf.fr_dielectric(jnp.asarray(0.01), 1.0, 1.5))
        assert f > 0.9


class TestSmoothGlass:
    def test_energy_conservation(self):
        # R/T together carry full energy: E[f cos/pdf] ~= 1 with kr=kt=1
        n = 8192
        mp = mp_for(bsdf.GLASS, n)
        wo = rand_dirs(n, 9)
        rng = np.random.default_rng(10)
        s = bsdf.bsdf_sample(
            mp, wo, jnp.asarray(rng.random((n, 2)), jnp.float32),
            jnp.asarray(rng.random(n), jnp.float32),
        )
        thr = np.asarray(
            s.f * (bsdf.abs_cos_theta(s.wi) / jnp.maximum(s.pdf, 1e-9))[:, None]
        )
        # account for the radiance-compression factor: undo via eta_scale
        thr = thr * np.asarray(s.eta_scale)[:, None]
        assert abs(thr.mean() - 1.0) < 0.02

    def test_refraction_direction_snell(self):
        mp = mp_for(bsdf.GLASS, 1)
        wo = jnp.asarray([[0.6, 0.0, 0.8]], jnp.float32)  # cos=0.8
        # force transmission: uc > F
        f_term = float(bsdf.fr_dielectric(jnp.asarray(0.8), 1.0, 1.5))
        s = bsdf.bsdf_sample(
            mp, wo, jnp.asarray([[0.5, 0.5]], jnp.float32),
            jnp.asarray([f_term + 0.01], jnp.float32),
        )
        assert bool(s.is_transmission[0])
        wi = np.asarray(s.wi[0])
        # Snell: sin_t = sin_i / 1.5
        sin_i = 0.6
        sin_t = np.hypot(wi[0], wi[1])
        assert sin_t == pytest.approx(sin_i / 1.5, abs=1e-4)
        assert wi[2] < 0  # crossed the interface


class TestRoughGlassAndGGX:
    def test_tr_d_normalization(self):
        # ∫ D(wh) cos(wh) dwh = 1 over the hemisphere (MC check)
        rng = np.random.default_rng(11)
        n = 1 << 16
        u = rng.random((n, 2))
        # uniform hemisphere sampling
        z = u[:, 0]
        r = np.sqrt(np.maximum(0, 1 - z * z))
        phi = 2 * np.pi * u[:, 1]
        wh = jnp.asarray(
            np.stack([r * np.cos(phi), r * np.sin(phi), z], -1), jnp.float32
        )
        alpha = jnp.full((n,), 0.3)
        d = np.asarray(bsdf.tr_d(wh, alpha) * bsdf.abs_cos_theta(wh))
        est = d.mean() * 2 * np.pi  # / pdf (1/2π)
        assert est == pytest.approx(1.0, rel=0.05)

    def test_sample_wh_pdf_consistency(self):
        n = 4096
        rng = np.random.default_rng(12)
        wo = rand_dirs(n, 13)
        u = jnp.asarray(rng.random((n, 2)), jnp.float32)
        alpha = jnp.full((n,), 0.25)
        wh = bsdf.tr_sample_wh(wo, u, alpha)
        pdf = np.asarray(bsdf.tr_pdf(wo, wh, alpha))
        assert (pdf > 0).mean() > 0.99

    def test_rough_glass_scatters(self):
        n = 512
        mp = mp_for(bsdf.GLASS, n, roughness=jnp.full((n,), 0.1))
        wo = rand_dirs(n, 14)
        rng = np.random.default_rng(15)
        s = bsdf.bsdf_sample(
            mp, wo, jnp.asarray(rng.random((n, 2)), jnp.float32),
            jnp.asarray(rng.random(n), jnp.float32),
        )
        assert not bool(jnp.any(s.is_specular))
        ok = np.asarray(s.pdf) > 0
        assert ok.mean() > 0.7  # most samples valid
        f = np.asarray(bsdf.bsdf_f(mp, wo, s.wi))
        assert np.isfinite(f).all()


class TestPlasticMetal:
    def test_plastic_combines_lobes(self):
        n = 2048
        mp = mp_for(
            bsdf.PLASTIC, n, kd=jnp.full((n, 3), 0.4),
            kr=jnp.full((n, 3), 0.3), roughness=jnp.full((n,), 0.2),
        )
        wo = rand_dirs(n, 16)
        rng = np.random.default_rng(17)
        s = bsdf.bsdf_sample(
            mp, wo, jnp.asarray(rng.random((n, 2)), jnp.float32),
            jnp.asarray(rng.random(n), jnp.float32),
        )
        pdf2 = bsdf.bsdf_pdf(mp, wo, s.wi)
        ok = np.asarray(s.pdf) > 1e-6
        np.testing.assert_allclose(
            np.asarray(s.pdf)[ok], np.asarray(pdf2)[ok], rtol=1e-3
        )

    def test_metal_reflects_with_f0_tint(self):
        n = 256
        mp = mp_for(bsdf.METAL, n, kr=jnp.tile(jnp.asarray([[0.9, 0.5, 0.2]]), (n, 1)),
                    roughness=jnp.full((n,), 0.05))
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        rng = np.random.default_rng(18)
        s = bsdf.bsdf_sample(
            mp, wo, jnp.asarray(rng.random((n, 2)), jnp.float32),
            jnp.asarray(rng.random(n), jnp.float32),
        )
        f = np.asarray(s.f)
        good = np.asarray(s.pdf) > 0
        # tint ordering preserved: r >= g >= b on average
        means = f[good].mean(axis=0)
        assert means[0] > means[1] > means[2]


class TestRoughGlassTransmission:
    """Round-5 regression: the transmission denominator clamp.

    microfacet_transmission_f divided by max(c_i*c_o*denom^2, 1e-10); the
    product c_i*c_o is NEGATIVE for transmission (opposite hemispheres),
    so the clamp floored the denominator at 1e-10 and f exploded by ~1e9
    on every rough-glass transmission eval.  Pin both the pointwise value
    and the energy integral."""

    def test_transmission_f_is_sane(self):
        mp = mp_for(bsdf.GLASS, 1, kr=jnp.ones((1, 3)), kt=jnp.ones((1, 3)),
                    eta=jnp.full((1,), 1.5), roughness=jnp.full((1,), 0.2))
        wo = jnp.asarray([[0.3, 0.2, 0.93]], jnp.float32)
        wo = wo / jnp.linalg.norm(wo)
        wi = jnp.asarray([[0.1, -0.05, -0.99]], jnp.float32)
        wi = wi / jnp.linalg.norm(wi)
        f = np.asarray(bsdf._glass_rough_f(mp, wo, wi))
        assert np.all(np.isfinite(f))
        assert 0.0 < f[0, 0] < 10.0, f

    def test_energy_conservation(self):
        # int f |cos| dw <= 1 for kr = kt = 1 (single-scatter GGX loses
        # energy at alpha=0.2; anything >1.05 means double counting or the
        # clamp bug, anything <0.2 means a lobe went missing)
        n = 200_000
        mp = mp_for(bsdf.GLASS, n, kr=jnp.ones((n, 3)), kt=jnp.ones((n, 3)),
                    eta=jnp.full((n,), 1.5), roughness=jnp.full((n,), 0.2))
        rng = np.random.default_rng(0)
        z = rng.uniform(-1, 1, n)
        phi = rng.uniform(0, 2 * np.pi, n)
        r = np.sqrt(np.maximum(0, 1 - z * z))
        wi = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], 1),
                         jnp.float32)
        wo = jnp.broadcast_to(
            jnp.asarray([[0.30151135, 0.20100756, 0.93202615]], jnp.float32),
            (n, 3),
        )
        f = bsdf.bsdf_f(mp, wo, wi)
        integ = float(jnp.mean(f[:, 0] * jnp.abs(wi[:, 2])) * 4 * np.pi)
        assert 0.2 < integ < 1.05, integ
