"""Isolate the XLA-side costs around the fused kernel.

The kernel-only sweep (tools/kernsweep.py) measures ~103 ms for the walk
itself at 1M rays, but nearest_hit_fused measures ~180-290 ms — this tool
times the pieces outside the kernel: ray packing (stack + reshape +
transpose), the winner epilogue (slotgeo gather + exact (u,v,t) recompute),
and the full wrapper, so the pathological op can be pinned down.

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
        packed = jnp.stack(
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             jnp.full((rr,), 3.4028235e38, f32),
             bits(jnp.full((rr,), -1, i32)),
             bits(jnp.full((rr,), -1, i32))]
            + [jnp.zeros((rr,), f32)] * (ROWS - 9),
            axis=0,
        ).reshape(ROWS, nt, ts).transpose(1, 0, 2)
        return packed

    packed, _ = timed(jax.jit(pack), (origin, direction), args.reps, "pack")
    packed = jax.device_put(packed)

    kern = jax.jit(lambda p_, a, ro, b: fused_tiles(
        p_, a, ro, b, has_ignore=False))
    (bt, code, res, iters), _ = timed(
        kern, (packed, cl["aabb"], cl["root"], cl["block"]),
        args.reps, "kernel")
    code = jax.device_put(code)

    def epilogue(code_in, o, d):
        c = code_in.reshape(nt * ts)[:rr]
        hit = c >= 0
        safe = jnp.maximum(c, 0)
        sg = cl["slotgeo"][safe]
        tri = jnp.where(hit, jax.lax.bitcast_convert_type(sg[:, 9], i32), -1)
        v1, e1, e2 = sg[:, 0:3], sg[:, 3:6], sg[:, 6:9]
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        wx = dy * oz - dz * oy
        wy = dz * ox - dx * oz
        wz = dx * oy - dy * ox
        cross = lambda a, b: (
            a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1],
            a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2],
            a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0],
        )
        nx, ny, nz = cross(e2, e1)
        m1x, m1y, m1z = cross(v1, e2)
        m2x, m2y, m2z = cross(e1, v1)
        c0 = v1[:, 0] * nx + v1[:, 1] * ny + v1[:, 2] * nz
        det = dx * nx + dy * ny + dz * nz
        udet = (wx * -e2[:, 0] + wy * -e2[:, 1] + wz * -e2[:, 2]
                + dx * m1x + dy * m1y + dz * m1z)
        vdet = (wx * e1[:, 0] + wy * e1[:, 1] + wz * e1[:, 2]
                + dx * m2x + dy * m2y + dz * m2z)
        tdet = c0 - (ox * nx + oy * ny + oz * nz)
        sd = jnp.where(det == 0.0, f32(1.0), det)
        return tri, udet / sd, vdet / sd, tdet / sd

    timed(jax.jit(epilogue), (code, origin, direction), args.reps, "epilogue")

    # Gather alone: the (R, 16) slotgeo row gather.
    safe = jax.device_put(jnp.maximum(code.reshape(nt * ts)[:rr], 0))
    timed(jax.jit(lambda s: cl["slotgeo"][s]), (safe,), args.reps, "gather")

    full = jax.jit(lambda o, d: nearest_hit_fused(flat, o, d))
    (hit_full, _) = timed(full, (origin, direction), args.reps, "full")

    # Shadow-query phase: exactly the wavefront's occlusion query — frag
    # positions toward the spotlight, per-ray t_max, ignore-triangle ids,
    # any_hit early-out.
    from raytpu.scene import lights as lights_mod

    def shadow(o, d, h_tri, h_u, h_v, h_hit):
        safe = jnp.maximum(h_tri, 0)
        frag = (flat.tri_v1[safe] + flat.tri_e1[safe] * h_u[..., None]
                + flat.tri_e2[safe] * h_v[..., None])
        sdir, sdist = lights_mod.light_shadow_query(flat.lights, 0, frag)
        sdir = jnp.where(h_hit[..., None], sdir, jnp.float32(jnp.nan))
        return nearest_hit_fused(flat, frag, sdir, ignore_tri=h_tri,
                                 t_max=sdist, any_hit=True)

    timed(jax.jit(shadow),
          (origin, direction, hit_full.tri, hit_full.u, hit_full.v,
           hit_full.hit),
          args.reps, "shadowq")

    # The whole bench frame (primary + shadow + shading) for reference.
    from raytpu.config import Intersector, Quantize, RenderConfig
    from raytpu.render.wavefront import render_rays

    cfg = RenderConfig(width=args.res, height=args.res, max_reflections=0,
                       intersector=Intersector.PALLAS, tile_pixels=32768,
                       quantize=Quantize.NONE)
    timed(jax.jit(lambda o, d: render_rays(flat, cfg, o, d)),
          (origin, direction), args.reps, "frame")

    # Frame with tile_pixels covering the whole ray set in ONE lax.map
    # body (no 32-way serialization of small XLA segments).
    cfg1 = RenderConfig(width=args.res, height=args.res, max_reflections=0,
                        intersector=Intersector.PALLAS,
                        tile_pixels=rr, quantize=Quantize.NONE)
    timed(jax.jit(lambda o, d: render_rays(flat, cfg1, o, d)),
          (origin, direction), args.reps, "frame1")


if __name__ == "__main__":
    main()
