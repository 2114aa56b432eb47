"""Round-4 lab #3: decompose the fused kernel's per-tile fixed cost.

An "empty" query (every ray misses the root AABB: cap = 0, all rays
init-resolved, zero walk trips) isolates the per-tile prologue + grid
machinery; comparing ts 128/256/512 shows how it scales with tile count.
Then the same at one walk trip per tile (max_trips=1) gives the marginal
first-trip cost (DMA warm-up bubble included).

Usage: python tools/r4lab3.py [--tris 1e6] [--res 1024] [--reps 3]
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

    from bench import build_scene
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import nearest_hit_fused
    from raytpu.render.wavefront import block_order_perm

    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=float, default=1e6)
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    t0 = time.perf_counter()
    scene, true_tris = build_scene(args.tris)
    flat = scene.flatten(build_octree=False, build_clusters=True)
    print(f"setup {time.perf_counter() - t0:.1f}s tris={true_tris}",
          flush=True)

    camera = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                    aspect=1.0)
    origin, direction = camera_rays(camera, args.res, args.res)
    perm = block_order_perm(args.res, args.res, 16)
    origin = jax.device_put(origin[perm])
    direction = jax.device_put(direction[perm])
    rr = origin.shape[0]
    # Rays pointing straight up from above the scene: root AABB miss for
    # every ray -> zero-trip tiles.
    up_o = jnp.asarray(
        np.tile(np.array([[0.0, 100.0, 0.0]], np.float32), (rr, 1)))
    up_d = jnp.asarray(
        np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (rr, 1)))

    def q(ts, any_hit=False, max_trips=0, uvt_off=False):
        def go(s_, o, d):
            return nearest_hit_fused(
                s_, o, d, tile_size=ts, any_hit=any_hit,
                t_max=jnp.full((o.shape[0],), 200.0), phase1_trips=max_trips,
                return_iters=True)
        return jax.jit(go)

    for ts in (128, 256, 512):
        (out, t) = timed(q(ts), (flat, up_o, up_d), args.reps,
                         f"empty-ts{ts}")
        it = np.asarray(out[1])
        nt = it.shape[0]
        print(f"  tiles={nt} trips_sum={int(it.sum())} "
              f"us/tile={t * 1e6 / nt:.2f}", flush=True)
    for ts in (128, 256, 512):
        (out, t) = timed(q(ts, any_hit=True), (flat, up_o, up_d), args.reps,
                         f"emptyA-ts{ts}")
        it = np.asarray(out[1])
        nt = it.shape[0]
        print(f"  tiles={nt} trips_sum={int(it.sum())} "
              f"us/tile={t * 1e6 / nt:.2f}", flush=True)

    # Real primary rays for per-trip marginals at each ts.
    for ts in (128, 256, 512):
        (out, t) = timed(q(ts), (flat, origin, direction), args.reps,
                         f"prim-ts{ts}")
        it = np.asarray(out[1])
        nt = it.shape[0]
        print(f"  tiles={nt} trips_sum={int(it.sum())} "
              f"trips_mean={it.mean():.1f} us/tile={t * 1e6 / nt:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
