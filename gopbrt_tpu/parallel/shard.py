"""SPMD rendering over a ``jax.sharding.Mesh``.

Replaces the reference's entire "distributed runtime" — the 16px film
tiles fanned over a channel to 64 goroutines with mutex-merged FilmTiles
(``pkg/pbrt/integrator.go:291-350``, ``pkg/pbrt/film.go:115-132``) — with
SPMD over a device mesh:

  * axis ``data``   shards the *pixel wavefront* (the tile analogue),
  * axis ``sample`` shards spp (independent sample batches per device),
  * the scene/BVH tables are replicated into each chip's HBM,
  * film accumulation is a single ``psum`` over ICI (the mutex analogue),
  * inverse-rendering gradients are psum'd the same way, overlapped with
    the backward sweep by XLA.

Determinism: the counter-based sampler (ops/rng.py) keys on global pixel
and sample ids, so any mesh shape produces bit-identical sample streams —
the multi-chip render equals the 1-chip render up to f32 psum ordering.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from gopbrt_tpu.models import camera as cam_mod
from gopbrt_tpu.models import film as film_mod
from gopbrt_tpu.models import render as render_mod
from gopbrt_tpu.models.scene import Scene


def make_mesh(data: int = 0, sample: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'sample') mesh; data=0 -> use all remaining."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == 0:
        data = n // sample
    assert data * sample == n, f"mesh {data}x{sample} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, sample)
    return Mesh(dev_array, ("data", "sample"))


def render_pass_sharded(
    mesh: Mesh,
    scene: Scene,
    camera: cam_mod.Camera,
    film: film_mod.Film,
    settings: render_mod.RenderSettings,
    sample_base: int,
):
    """One distributed pass: every device renders its pixel-shard for its
    sample-shard, film is psum'd across the whole mesh.

    film is replicated (psum-reduced); pixels shard over 'data'; the
    samples_per_pass spp of this pass shard over 'sample'.
    """
    n_data = mesh.shape["data"]
    spp_here = settings.samples_per_pass
    # each data-shard owns a contiguous band of image rows (the tile
    # decomposition, integrator.go:296-299 — but as an SPMD sharding)
    band_rows = -(-settings.height // n_data)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    def step(scene_, camera_, film_):
        local_film = film_mod.Film(
            rgb=jnp.zeros_like(film_.rgb), weight=jnp.zeros_like(film_.weight)
        )
        s_idx = jax.lax.axis_index("sample")
        row0 = (jax.lax.axis_index("data") * band_rows).astype(jnp.int32)
        for s in range(spp_here):
            sample_idx = (
                sample_base.astype(jnp.uint32)
                + (s_idx * spp_here + s).astype(jnp.uint32)
            )
            local_film = render_mod.render_wave_rows(
                scene_, camera_, local_film, settings, row0, band_rows,
                sample_idx,
            )
        rgb = jax.lax.psum(local_film.rgb, ("data", "sample"))
        weight = jax.lax.psum(local_film.weight, ("data", "sample"))
        return film_mod.Film(rgb=rgb, weight=weight)

    delta = step(scene, camera, film)
    return film_mod.merge(film, delta)


def render_sharded(
    mesh: Mesh,
    scene: Scene,
    camera: cam_mod.Camera,
    settings: render_mod.RenderSettings,
) -> jnp.ndarray:
    """Full distributed render (the multi-chip ``Render``)."""
    # pin inputs to the mesh's devices: the mesh may live on a different
    # backend than the default (e.g. a virtual-CPU validation mesh while the
    # default backend is a single TPU)
    rep = NamedSharding(mesh, P())
    scene, camera = jax.device_put((scene, camera), rep)
    film = jax.device_put(film_mod.new_film(settings.width, settings.height), rep)
    n_sample = mesh.shape["sample"]
    spp_per_pass = settings.samples_per_pass * n_sample
    n_passes = -(-settings.spp // spp_per_pass)
    fn = jax.jit(render_pass_sharded, static_argnames=("mesh", "settings"))
    for p in range(n_passes):
        film = fn(mesh, scene, camera, film, settings, jnp.uint32(p * spp_per_pass))
    return film_mod.develop(film)


# ---------------------------------------------------------------------------
# Differentiable / training step (inverse rendering, BASELINE config 5)
# ---------------------------------------------------------------------------


def make_train_step(
    mesh: Mesh,
    camera: cam_mod.Camera,
    settings: render_mod.RenderSettings,
    param_to_scene,
    optimizer,
):
    """Build a jitted SPMD gradient step for inverse rendering.

    param_to_scene(params) -> Scene splices optimisable leaves (e.g. albedo
    texture values, light intensities) into the scene pytree.  The loss is
    pixel MSE against a target image on each device's pixel shard; gradients
    psum over the mesh — the renderer's analogue of data-parallel training.
    """
    n_data = mesh.shape["data"]
    band_rows = -(-settings.height // n_data)
    # reverse-mode AD cannot unroll the compacted integrator's dynamic
    # while_loop — force the static fori_loop path (identical radiometry)
    settings = settings._replace(compaction=False)

    def local_loss(params, target, row0, s_idx):
        scene = param_to_scene(params)
        film_local = film_mod.new_film(settings.width, settings.height)
        for s in range(settings.samples_per_pass):
            sample_idx = (s_idx * settings.samples_per_pass + s).astype(
                jnp.uint32
            )
            film_local = render_mod.render_wave_rows(
                scene, camera, film_local, settings, row0, band_rows,
                sample_idx,
            )
        rgb = jax.lax.psum(film_local.rgb, ("data", "sample"))
        weight = jax.lax.psum(film_local.weight, ("data", "sample"))
        img = rgb / jnp.maximum(weight[..., None], 1e-8)
        return jnp.mean((img - target) ** 2)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    def sharded_grad(params, opt_state, target):
        s_idx = jax.lax.axis_index("sample")
        row0 = (jax.lax.axis_index("data") * band_rows).astype(jnp.int32)
        loss, grads = jax.value_and_grad(local_loss)(params, target, row0, s_idx)
        # Combine per-device partial gradients.  Under shard_map with
        # check_rep=False, the film-psum's transpose re-broadcasts the full
        # cotangent to every device, so a plain psum over-counts by the mesh
        # size — pmean gives exactly the single-device gradient (verified
        # against jax.grad in tests/test_sharding.py).  This all-reduce is
        # the renderer's "gradient all-reduce over ICI", overlapped with the
        # backward sweep by XLA.
        grads = jax.lax.pmean(grads, ("data", "sample"))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(sharded_grad)
    rep = NamedSharding(mesh, P())

    def train_step(params, opt_state, target):
        # pin to the mesh's devices (no-op when already there)
        params, opt_state, target = jax.device_put(
            (params, opt_state, target), rep
        )
        return jitted(params, opt_state, target)

    return train_step
