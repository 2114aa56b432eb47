"""Round-4 lab #6: decompose the backward (fit-step) cost at 512^2.

Phases, one process, honest sync:
  fwd       — plain forward render (the bench frame at 512)
  dfwd      — differentiable forward (detach+recompute path), loss only
  vag       — jax.value_and_grad of the loss (GEOMETRY params)
  step      — the full make_fit_step (adds optimizer + apply_updates)
  pack      — pack_shade alone (the in-graph (T, 32) rebuild)
  scat      — scatter-add microbench: the tri_shade gather's VJP shape
              ((R, 32) rows into a (T, 32) zeros table)
  vag-nosh  — value_and_grad with the packed-row gather DISABLED
              (tri_shade=None path: twelve field gathers; isolates how
              much the packed-row gather/scatter costs under AD)

Usage: python tools/r4lab6.py [--res 512] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.r4lab import _sync, timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench import build_scene
    from raytpu.config import Intersector, Quantize, RenderConfig
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.diff.fit import make_fit_step, render_loss
    from raytpu.diff.params import GEOMETRY, extract_params, pack_shade
    from raytpu.render.wavefront import block_order_perm, render_rays

    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--tris", type=float, default=1e6)
    args = p.parse_args()

    t0 = time.perf_counter()
    scene, true_tris = build_scene(args.tris)
    flat = scene.flatten(build_octree=False, build_clusters=True)
    print(f"setup {time.perf_counter() - t0:.1f}s tris={true_tris}",
          flush=True)

    res = args.res
    cfg = RenderConfig(width=res, height=res, max_reflections=0,
                       intersector=Intersector.PALLAS,
                       tile_pixels=res * res, quantize=Quantize.NONE)
    camera = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                    aspect=1.0)
    o, d = camera_rays(camera, res, res)
    perm = block_order_perm(res, res, 16)
    o = jax.device_put(o[perm])
    d = jax.device_put(d[perm])
    rr = o.shape[0]

    (target, t_fwd) = timed(
        jax.jit(lambda s_, oo, dd: render_rays(s_, cfg, oo, dd)),
        (flat, o, d), args.reps, "fwd")

    params = extract_params(flat, GEOMETRY)

    timed(jax.jit(lambda s_, pp, oo, dd, tt: render_loss(
        s_, cfg, pp, oo, dd, tt)), (flat, params, o, d, target),
        args.reps, "dfwd")

    vag = jax.jit(lambda s_, pp, oo, dd, tt: jax.value_and_grad(
        render_loss, argnums=2)(s_, cfg, pp, oo, dd, tt))
    timed(vag, (flat, params, o, d, target), args.reps, "vag")

    optimizer = optax.sgd(0.0)
    opt_state = optimizer.init(params)
    step = make_fit_step(flat, cfg, optimizer)
    timed(step, (params, opt_state, o, d, target), args.reps, "step")

    timed(jax.jit(pack_shade), (flat,), args.reps, "pack")

    t_tab = flat.tri_shade.shape[0]
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, t_tab, size=rr), jnp.int32)
    rows = jnp.ones((rr, 32), jnp.float32)

    def scat(ix, rw):
        return jnp.zeros((t_tab, 32), jnp.float32).at[ix].add(rw)

    timed(jax.jit(scat), (idx, rows), args.reps, "scat")

    # Twelve-field gather path (tri_shade=None): how much of vag is the
    # packed-row gather + its scatter VJP?
    flat_nosh = flat.replace(tri_shade=None)
    timed(jax.jit(lambda s_, pp, oo, dd, tt: jax.value_and_grad(
        render_loss, argnums=2)(s_, cfg, pp, oo, dd, tt)),
        (flat_nosh, params, o, d, target), args.reps, "vag-nosh")


if __name__ == "__main__":
    main()
