"""Headline benchmark: rays/s for a 1080p 1spp path trace of the demo scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context: the reference publishes no numbers (BASELINE.md); its
de-facto workload is the demo scene at 1920x1080, path depth 10, on CPU with
64 goroutines (internal/render/server.go:136-164).  vs_baseline is measured
against BASELINE_RAYS_PER_S — a measured-or-estimated CPU rays/s figure for
the Go reference on that workload (see BASELINE.md; the Go toolchain is not
present in this image, so the figure is the documented estimate until a
measured number replaces it).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

# Estimated Go-reference throughput on the demo workload: a Go CPU path
# tracer with interface dispatch typically reaches ~0.5-2 Mrays/s/core;
# with 64 goroutines on a big CI box, ~10 Mrays/s is a generous estimate.
BASELINE_RAYS_PER_S = 10e6

WIDTH, HEIGHT, SPP = 1920, 1080, 1
MAX_DEPTH = 10


def main() -> None:
    from gopbrt_tpu.models import film as film_mod
    from gopbrt_tpu.models import render as render_mod
    from gopbrt_tpu.models.demo import build_demo_camera, build_demo_scene

    scene = build_demo_scene(accelerator="bvh")
    camera = build_demo_camera(WIDTH, HEIGHT)
    settings = render_mod.RenderSettings(
        width=WIDTH, height=HEIGHT, spp=SPP, max_depth=MAX_DEPTH,
        integrator="path", samples_per_pass=1,
    )
    film = film_mod.new_film(WIDTH, HEIGHT)

    # compile + warm up
    out = render_mod.render_pass(scene, camera, film, settings, jnp.uint32(0))
    jax.block_until_ready(out)

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = render_mod.render_pass(
            scene, camera, out, settings, jnp.uint32(i + 1)
        )
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    # rays/s counts camera rays only (the conventional paths/s metric);
    # each path traces up to MAX_DEPTH segments + shadow rays.
    rays = WIDTH * HEIGHT * SPP
    rays_per_s = rays / dt
    print(
        json.dumps(
            {
                "metric": "camera_rays_per_s_1080p_path_depth10",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
