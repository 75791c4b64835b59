"""Compiled-mode TPU smoke gate: every Pallas kernel, interpret=False.

Round-3 postmortem (VERDICT r3, Weak #2): every Pallas test ran in
interpret mode, so a Mosaic-lowering regression (an i1-vector select in the
megakernel's mirror lobe) shipped in the snapshot and crashed bench.py on
the chip.  This script is the gate that makes that class of regression
impossible: it COMPILES each kernel — the brute-force intersector, the
two-level cluster intersector (closest + any-hit), and the bounce
megakernel (demo + mirror-Cornell + glass configs) — on the real TPU and
cross-checks results against the pure-jnp oracle chain.

Exit codes: 0 = all kernels compile and agree; 75 = not on TPU (skip);
1 = compile failure or oracle mismatch.  Run it:

    python benchmarks/tpu_smoke.py

Wired into tests/test_tpu_smoke.py (auto-skip off-TPU), the verify skill,
and cloudbuild.yaml's bench step — the analog of the reference CI's
platform-native test run (cloudbuild.yaml:12-13).
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

SKIP_RC = 75


def _require_tpu() -> bool:
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return "tpu" in dev.platform.lower() or "TPU" in getattr(dev, "device_kind", "")


def _rays(scene, camera, settings, n, seed):
    from gopbrt_tpu.models import camera as cam_mod
    from gopbrt_tpu.models import render as render_mod

    pixel = jnp.arange(n, dtype=jnp.uint32)
    sample = jnp.zeros((n,), jnp.uint32)
    p_film, u_lens = render_mod.camera_samples(
        settings, pixel, sample, jnp.uint32(seed)
    )
    o, d = cam_mod.generate_rays(camera, p_film, u_lens)
    return o, d, pixel, sample


def check_brute_intersect() -> str:
    """intersect_brute_pallas compiled vs ops.intersect.intersect_brute."""
    from gopbrt_tpu.models.demo import build_demo_camera, build_demo_scene
    from gopbrt_tpu.models.render import RenderSettings
    from gopbrt_tpu.ops import intersect as isect
    from gopbrt_tpu.ops import pallas_intersect as pk

    scene = build_demo_scene(accelerator="none")
    w, h = 64, 36
    settings = RenderSettings(width=w, height=h, spp=1, max_depth=1)
    o, d, _, _ = _rays(scene, build_demo_camera(w, h), settings, w * h, 3)
    t_max = jnp.full((w * h,), 1e30, jnp.float32)
    hit_k, t_k, idx_k = jax.block_until_ready(
        pk.intersect_brute_pallas(scene.prims, o, d, t_max, interpret=False)
    )
    hit_o, t_o, idx_o = isect.intersect_brute(scene.prims, o, d, t_max)
    hit_k, hit_o = np.asarray(hit_k), np.asarray(hit_o)
    agree = np.mean(
        (hit_k == hit_o)
        & (np.abs(np.asarray(t_k) - np.asarray(t_o)) < 1e-3 * np.abs(np.asarray(t_o)) + 1e-4)
    )
    assert agree > 0.999, f"brute intersect agreement {agree:.4f}"
    # any-hit variant
    occ_k = np.asarray(
        jax.block_until_ready(
            pk.intersect_p_brute_pallas(scene.prims, o, d, t_max, interpret=False)
        )
    )
    assert np.mean(occ_k == hit_o) > 0.999, "brute any-hit disagrees"
    return f"brute agree={agree:.4f}"


def check_cluster_intersect() -> str:
    """cluster_intersect compiled vs the dense jnp oracle on the mesh scene."""
    from gopbrt_tpu.models.meshes import build_mesh_scene, mesh_camera
    from gopbrt_tpu.models.render import RenderSettings
    from gopbrt_tpu.ops import intersect as isect
    from gopbrt_tpu.ops import pallas_cluster as pc

    scene = build_mesh_scene(n_lat=24, n_lon=24)
    assert scene.clusters is not None, "mesh scene has no clusters"
    w, h = 64, 36
    settings = RenderSettings(width=w, height=h, spp=1, max_depth=1)
    o, d, _, _ = _rays(scene, mesh_camera(w, h), settings, w * h, 5)
    t_max = jnp.full((w * h,), 1e30, jnp.float32)
    hit_k, t_k, idx_k = jax.block_until_ready(
        pc.cluster_intersect(
            scene.clusters, scene.prims, o, d, t_max, interpret=False
        )
    )
    hit_o, t_o, idx_o = isect.intersect_brute(scene.prims, o, d, t_max)
    hit_k, hit_o = np.asarray(hit_k), np.asarray(hit_o)
    t_k, t_o = np.asarray(t_k), np.asarray(t_o)
    agree = np.mean((hit_k == hit_o) & (np.abs(t_k - t_o) < 1e-3 * np.abs(t_o) + 1e-4))
    assert agree > 0.995, f"cluster intersect agreement {agree:.4f}"
    # any-hit variant
    occ = np.asarray(
        jax.block_until_ready(
            pc.cluster_intersect_p(
                scene.clusters, scene.prims, o, d, t_max, interpret=False
            )
        )
    )
    assert np.mean(occ == hit_o) > 0.995, "cluster any-hit disagrees"
    return f"cluster agree={agree:.4f}"


def check_mesh_megakernel() -> str:
    """mesh_li_fused compiled vs the jnp chain on a small mesh scene."""
    from gopbrt_tpu.models import integrators
    from gopbrt_tpu.models.meshes import build_mesh_scene, mesh_camera
    from gopbrt_tpu.models.render import RenderSettings
    from gopbrt_tpu.ops import pallas_mesh_megakernel as pmm

    scene = build_mesh_scene(n_lat=16, n_lon=16)
    assert scene.fastinfo.mesh_ok and scene.meshkernel is not None
    w, h = 64, 36
    settings = RenderSettings(width=w, height=h, spp=1, max_depth=3)
    o, d, pixel, sample = _rays(scene, mesh_camera(w, h), settings, w * h, 5)
    cfg = integrators.PathConfig(max_depth=3, rr_threshold=1.0)
    got = np.asarray(
        jax.block_until_ready(
            pmm.mesh_li_fused(
                scene, o, d, pixel, sample, jnp.uint32(5), cfg, interpret=False
            )
        )
    )
    assert np.all(np.isfinite(got)), "mesh kernel: non-finite radiance"
    old_pi, old_mk = integrators.USE_PALLAS_INTERSECT, integrators.USE_MEGAKERNEL
    integrators.USE_PALLAS_INTERSECT = False
    integrators.USE_MEGAKERNEL = False
    try:
        ref = np.asarray(
            integrators._li_jnp(scene, o, d, pixel, sample, jnp.uint32(5), cfg)
        )
    finally:
        integrators.USE_PALLAS_INTERSECT = old_pi
        integrators.USE_MEGAKERNEL = old_mk
    rel = np.abs(got - ref).max(axis=-1) / (1e-3 + np.abs(ref).max(axis=-1))
    agree = np.mean(rel < 1e-3)
    assert agree > 0.98, f"mesh kernel: lane agreement {agree:.4f}"
    assert abs(got.mean() - ref.mean()) < 1e-2 * max(ref.mean(), 1e-6)
    return f"mesh agree={agree:.4f}"


def check_megakernel(config_name: str, builder, depth: int, seed: int) -> str:
    """path_li_fused compiled vs the jnp chain on a fast-path config."""
    from gopbrt_tpu.models import integrators
    from gopbrt_tpu.ops import pallas_megakernel as mk

    scene, camera, settings = builder(64, 36)
    assert scene.fastinfo is not None and scene.fastinfo.ok, (
        f"{config_name} not on the fast path"
    )
    n = 64 * 36
    o, d, pixel, sample = _rays(scene, camera, settings, n, seed)
    cfg = integrators.PathConfig(max_depth=depth, rr_threshold=1.0)
    got = np.asarray(
        jax.block_until_ready(
            mk.path_li_fused(
                scene, o, d, pixel, sample, jnp.uint32(seed), cfg, interpret=False
            )
        )
    )
    assert np.all(np.isfinite(got)), f"{config_name}: non-finite radiance"
    # oracle on the same backend, forced down the jnp chain
    old_pi, old_mk = integrators.USE_PALLAS_INTERSECT, integrators.USE_MEGAKERNEL
    integrators.USE_PALLAS_INTERSECT = False
    integrators.USE_MEGAKERNEL = False
    try:
        ref = np.asarray(
            integrators._li_jnp(scene, o, d, pixel, sample, jnp.uint32(seed), cfg)
        )
    finally:
        integrators.USE_PALLAS_INTERSECT = old_pi
        integrators.USE_MEGAKERNEL = old_mk
    rel = np.abs(got - ref).max(axis=-1) / (1e-3 + np.abs(ref).max(axis=-1))
    agree = np.mean(rel < 1e-3)
    assert agree > 0.98, f"{config_name}: lane agreement {agree:.4f}"
    assert abs(got.mean() - ref.mean()) < 5e-3 * max(ref.mean(), 1e-6), (
        f"{config_name}: mean {got.mean():.5f} vs {ref.mean():.5f}"
    )
    return f"{config_name} agree={agree:.4f}"


def main() -> int:
    if not _require_tpu():
        print(json.dumps({"tpu_smoke": "skip", "reason": "no TPU backend"}))
        return SKIP_RC

    from gopbrt_tpu.models import gallery
    from gopbrt_tpu.models.demo import build_demo_camera, build_demo_scene
    from gopbrt_tpu.models.render import RenderSettings

    def demo_cfg(w, h):
        scene = build_demo_scene(accelerator="none")
        return scene, build_demo_camera(w, h), RenderSettings(
            width=w, height=h, spp=1, max_depth=5
        )

    def _rough_cfg(w, h):
        # config4 with the glass sphere made ROUGH: exercises the GGX
        # R+T lobes the brute kernel gained in round 5
        import numpy as _np

        from gopbrt_tpu.models import camera as cam_mod
        from gopbrt_tpu.models.scene import SceneBuilder
        from gopbrt_tpu.ops import geom

        b = SceneBuilder()
        checker = b.checkerboard_texture(
            (0.8, 0.8, 0.8), (0.2, 0.2, 0.2),
            vs=(0.7, 0.0, 0.0), vt=(0.0, 0.0, 0.7), mapping="planar",
        )
        floor = b.matte(kd=(1.0, 1.0, 1.0), kd_tex=checker)
        b.disk(_np.asarray(geom.rotate_x(-90.0)), 60.0, floor)
        rough = b.glass(kr=(1.0, 1.0, 1.0), kt=(1.0, 1.0, 1.0), eta=1.5,
                        roughness=0.15)
        b.sphere(_np.asarray(geom.translate([0.0, 1.2, 0.0])), 1.2, rough)
        matte = b.matte(kd=(0.7, 0.3, 0.2))
        b.sphere(_np.asarray(geom.translate([2.4, 0.8, -1.4])), 0.8, matte)
        dark = b.matte(kd=(0.0, 0.0, 0.0))
        lamp = b.sphere(_np.asarray(geom.translate([-2.5, 4.0, 2.0])), 0.5,
                        dark)
        b.area_light(lamp, radiance=(30.0, 28.0, 24.0), two_sided=False)
        scene = b.build(accelerator="none")
        cam = cam_mod.perspective_camera(
            geom.look_at([0.0, 2.4, 6.5], [0.0, 1.0, 0.0], [0.0, 1.0, 0.0]),
            w, h, fov_deg=45.0,
        )
        return scene, cam, RenderSettings(width=w, height=h, spp=1,
                                          max_depth=5)

    checks = [
        ("brute_intersect", check_brute_intersect),
        ("cluster_intersect", check_cluster_intersect),
        ("mega_demo", lambda: check_megakernel("demo", demo_cfg, 5, 7)),
        ("mega_mirror_cornell",
         lambda: check_megakernel("config2", gallery.config2, 5, 9)),
        ("mega_glass",
         lambda: check_megakernel("config4", gallery.config4, 8, 3)),
        ("mega_rough_glass",
         lambda: check_megakernel("rough_glass", _rough_cfg, 5, 13)),
        ("mega_mesh", check_mesh_megakernel),
    ]
    results = {}
    failed = False
    for name, fn in checks:
        try:
            results[name] = fn()
        except Exception as e:  # noqa: BLE001 — report every kernel
            results[name] = f"FAIL: {e}"
            traceback.print_exc()
            failed = True
    print(json.dumps({"tpu_smoke": "fail" if failed else "ok", **results}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
