"""Mesh-megakernel stage profiler (BENCH_NOTES round-5 ledger).

Times mesh_li_fused directly on the config-3 ray batch, skipping the film
and render-driver overhead, under the GOPBRT_MESH_ABLATE stages compiled
into gopbrt_tpu.ops.pallas_mesh_megakernel at import (set the env var
BEFORE running; one process per ablation):

    for a in "" nee shadow resolve "nee,resolve"; do
        GOPBRT_MESH_ABLATE="$a" python benchmarks/profile_mesh.py
    done

Stage cost = full - ablated.  Ablations distort downstream liveness a
little (e.g. no-NEE keeps beta identical but skips ~half the traversals),
so read the deltas as a map, not a budget.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from gopbrt_tpu.models import camera as cam_mod
    from gopbrt_tpu.models import integrators
    from gopbrt_tpu.models import render as render_mod
    from gopbrt_tpu.models.meshes import build_mesh_scene, mesh_camera
    from gopbrt_tpu.ops import pallas_mesh_megakernel as pmm

    scene = build_mesh_scene()
    camera = mesh_camera(args.width, args.height)
    settings = render_mod.RenderSettings(
        width=args.width, height=args.height, spp=1, max_depth=args.depth,
    )
    n = args.width * args.height
    pixel = jnp.arange(n, dtype=jnp.uint32)
    sample = jnp.zeros((n,), jnp.uint32)
    p_film, u_lens = render_mod.camera_samples(
        settings, pixel, sample, jnp.uint32(0)
    )
    o, d = cam_mod.generate_rays(camera, p_film, u_lens)
    cfg = integrators.PathConfig(max_depth=args.depth)

    run = lambda s: pmm.mesh_li_fused(scene, o, d, pixel, sample, s, cfg)
    jax.block_until_ready(run(jnp.uint32(0)))
    t0 = time.perf_counter()
    for i in range(args.iters):
        out = run(jnp.uint32(i + 1))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    print(
        json.dumps(
            {
                "ablate": os.environ.get("GOPBRT_MESH_ABLATE", ""),
                "depth": args.depth,
                "ms": round(dt * 1e3, 1),
                "mrays_s": round(n / dt / 1e6, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
