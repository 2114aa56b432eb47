"""Isolate the XLA-side costs around the fused kernel.

Times each piece separately in one process (tunnel timings vary wildly
ACROSS processes — only same-process comparisons are meaningful): ray
packing, the kernel with and without in-walk winner extraction (uvt), the
full wrapper, the shadow occlusion query, and whole frames.

Usage: python tools/epilab.py [--tris 1e6] [--res 1024] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, args, reps, name):
    t0 = time.perf_counter()
    out = fn(*args)
    for x in [t for t in __import__("jax").tree.leaves(out)
              if hasattr(t, "sum")]:
        np.asarray(x.sum() if x.dtype != bool else x.any())
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        for x in [t for t in __import__("jax").tree.leaves(out)
                  if hasattr(t, "sum")]:
            np.asarray(x.sum() if x.dtype != bool else x.any())
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name:10s} compile={compile_s:6.1f}s best={best * 1e3:8.2f}ms "
          f"times={[round(t * 1e3, 1) for t in times]}", flush=True)
    return out, best


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import ROWS, fused_tiles, nearest_hit_fused
    from raytpu.render.wavefront import block_order_perm

    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=float, default=1e6)
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    t0 = time.perf_counter()
    scene, true_tris = build_scene(args.tris)
    flat = scene.flatten(build_octree=False, build_clusters=True)
    cl = flat.clusters
    print(f"setup {time.perf_counter() - t0:.1f}s tris={true_tris}",
          flush=True)

    ts = 256
    camera = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                    aspect=1.0)
    origin, direction = camera_rays(camera, args.res, args.res)
    perm = block_order_perm(args.res, args.res, int(ts ** 0.5))
    origin = jax.device_put(origin[perm])
    direction = jax.device_put(direction[perm])
    rr = origin.shape[0]
    nt = rr // ts
    f32, i32 = jnp.float32, jnp.int32

    def pack(o, d):
        bits = lambda a: jax.lax.bitcast_convert_type(a, f32)
        return jnp.stack(
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             jnp.full((rr,), 3.4028235e38, f32),
             bits(jnp.full((rr,), -1, i32)),
             bits(jnp.full((rr,), -1, i32))]
            + [jnp.zeros((rr,), f32)] * (ROWS - 9),
            axis=0,
        )  # (ROWS, R)

    packed, _ = timed(jax.jit(pack), (origin, direction), args.reps, "pack")
    packed = jax.device_put(packed)

    kern = jax.jit(lambda p_, a, ro, b: fused_tiles(
        p_, a, ro, b, ts=ts, has_ignore=False, uvt=False))
    timed(kern, (packed, cl["aabb"], cl["root"], cl["block"]),
          args.reps, "kernel")

    kern_uvt = jax.jit(lambda p_, a, ro, b: fused_tiles(
        p_, a, ro, b, ts=ts, has_ignore=False, uvt=True))
    timed(kern_uvt, (packed, cl["aabb"], cl["root"], cl["block"]),
          args.reps, "kern-uvt")

    full = jax.jit(lambda s_, o, d: nearest_hit_fused(s_, o, d))
    (hit_full, _) = timed(full, (flat, origin, direction), args.reps, "full")

    # Shadow-query phase: exactly the wavefront's occlusion query — frag
    # positions toward the spotlight, per-ray t_max, ignore-triangle ids,
    # any_hit early-out.
    from raytpu.scene import lights as lights_mod

    def shadow(s_, o, d, h_tri, h_u, h_v, h_hit):
        safe = jnp.maximum(h_tri, 0)
        frag = (s_.tri_v1[safe] + s_.tri_e1[safe] * h_u[..., None]
                + s_.tri_e2[safe] * h_v[..., None])
        sdir, sdist = lights_mod.light_shadow_query(s_.lights, 0, frag)
        sdir = jnp.where(h_hit[..., None], sdir, jnp.float32(jnp.nan))
        return nearest_hit_fused(s_, frag, sdir, ignore_tri=h_tri,
                                 t_max=sdist, any_hit=True)

    timed(jax.jit(shadow),
          (flat, origin, direction, hit_full.tri, hit_full.u, hit_full.v,
           hit_full.hit),
          args.reps, "shadowq")

    # The whole bench frame (primary + shadow + shading) for reference.
    from raytpu.config import Intersector, Quantize, RenderConfig
    from raytpu.render.wavefront import render_rays

    cfg = RenderConfig(width=args.res, height=args.res, max_reflections=0,
                       intersector=Intersector.PALLAS, tile_pixels=32768,
                       quantize=Quantize.NONE)
    timed(jax.jit(lambda s_, o, d: render_rays(s_, cfg, o, d)),
          (flat, origin, direction), args.reps, "frame")

    # Frame with tile_pixels covering the whole ray set in ONE lax.map
    # body (no 32-way serialization of small XLA segments).
    cfg1 = RenderConfig(width=args.res, height=args.res, max_reflections=0,
                        intersector=Intersector.PALLAS,
                        tile_pixels=rr, quantize=Quantize.NONE)
    timed(jax.jit(lambda s_, o, d: render_rays(s_, cfg1, o, d)),
          (flat, origin, direction), args.reps, "frame1")


if __name__ == "__main__":
    main()
