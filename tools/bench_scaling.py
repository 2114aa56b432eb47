"""Scaling-efficiency bench: rays/s on 1..N devices of a mesh.

BASELINE.md's scaling target is >= 90% rays/s efficiency from 1 host to 4
hosts.  On real multi-chip hardware this script measures it directly; on a
single-host checkout it runs on the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu) to
validate the mechanics — CPU-mesh numbers exercise the sharded program, not
real ICI bandwidth.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/bench_scaling.py --tris 2e5 --res 256

Prints one JSON line per device count plus a final efficiency summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=float, default=2e5)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--intersector", default="tiled")
    args = p.parse_args()

    import jax

    sys.argv = ["bench"]
    import bench as B

    from raytpu.config import Intersector, Quantize, RenderConfig
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.dist import make_mesh, render_rays_sharded, replicate_scene
    from raytpu.render.wavefront import block_order_perm

    scene, true_tris = B.build_scene(int(args.tris))
    flat = scene.flatten(build_octree=False, build_clusters=True)

    res = args.res
    cfg = RenderConfig(
        width=res, height=res, max_reflections=0,
        intersector=Intersector[args.intersector.upper()],
        tile_pixels=4096, quantize=Quantize.NONE,
    )
    cam = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                 aspect=1.0)
    o, d = camera_rays(cam, res, res)
    perm = block_order_perm(res, res, 16)
    o, d = o[perm], d[perm]
    rays = 2 * res * res

    devices = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    base = None
    for n in counts:
        mesh = make_mesh(devices=devices[:n])
        srep = replicate_scene(flat, mesh)
        fn = jax.jit(lambda s, oo, dd, mesh=mesh: render_rays_sharded(
            s, cfg, oo, dd, mesh))
        out = fn(srep, o, d)
        float(np.asarray(out.sum()))  # compile + settle
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(np.asarray(fn(srep, o, d).sum()))
            times.append(time.perf_counter() - t0)
        best = min(times)
        rps = rays / best
        if base is None:
            base = rps
        eff = rps / (base * n)
        print(json.dumps({
            "devices": n, "tris": true_tris, "best_ms": round(best * 1e3, 1),
            "rays_per_s": round(rps), "scaling_efficiency": round(eff, 3),
        }), flush=True)

    # Ring-sharded (>HBM) renderer mechanics at each mesh size: geometry +
    # shade tables sharded, rays rotating (dist/bigscene.py).  Wall-clock
    # on the virtual CPU mesh is still not an efficiency statement; this
    # records that the ppermute ring + sharded shading compiles and runs
    # at every N (r4 verdict artifact ask).
    from raytpu.dist.bigscene import (render_rays_ring,
                                      shard_scene_clusters,
                                      shard_scene_shade, strip_for_ring)

    stripped = strip_for_ring(flat)
    for n in counts:
        if n < 2:
            continue
        mesh = make_mesh(devices=devices[:n])
        shards = shard_scene_clusters(flat, mesh)
        shade = shard_scene_shade(flat, mesh)
        fn = jax.jit(lambda oo, dd, mesh=mesh, shards=shards, shade=shade:
                     render_rays_ring(stripped, cfg, oo, dd, mesh,
                                      shards=shards, shade=shade))
        float(np.asarray(fn(o, d).sum()))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(np.asarray(fn(o, d).sum()))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(json.dumps({
            "ring_devices": n, "tris": true_tris,
            "best_ms": round(best * 1e3, 1),
            "rays_per_s": round(rays / best),
        }), flush=True)


if __name__ == "__main__":
    main()
