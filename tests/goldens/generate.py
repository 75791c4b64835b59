"""Regenerate the golden images (CPU backend, deterministic seeds).

Run after an INTENTIONAL radiometric change, inspect the PNGs by eye, and
commit the updated .npz + .png files:

    python tests/goldens/generate.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np


def main() -> None:
    from gopbrt_tpu.models import film as film_mod
    from gopbrt_tpu.models import render as render_mod
    from gopbrt_tpu.models.gallery import CONFIGS, golden_config

    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in sorted(CONFIGS):
        scene, cam, settings = golden_config(name)
        img = np.asarray(render_mod.render(scene, cam, settings))
        np.savez_compressed(
            os.path.join(out_dir, name + ".npz"), img=img.astype(np.float16)
        )
        film_mod.write_png(os.path.join(out_dir, name + ".png"), img)
        print(f"{name}: mean={img.mean():.4f} max={img.max():.3f}", flush=True)

    # compat_go demo (reference WriteImage semantics, film.go:142-179)
    from gopbrt_tpu.models.demo import build_demo_camera, build_demo_scene

    scene = build_demo_scene(accelerator="none")
    w, h = 96, 54
    cam = build_demo_camera(w, h)
    settings = render_mod.RenderSettings(
        width=w, height=h, spp=4, max_depth=5, samples_per_pass=4, seed=2,
    )
    film = film_mod.new_film(w, h)
    film = render_mod.render_pass(scene, cam, film, settings, np.uint32(0))
    img = np.asarray(film_mod.develop(film, compat_go=True))
    np.savez_compressed(
        os.path.join(out_dir, "compat_go_demo.npz"), img=img.astype(np.float16)
    )
    film_mod.write_png(os.path.join(out_dir, "compat_go_demo.png"), img)
    print(f"compat_go_demo: mean={img.mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
