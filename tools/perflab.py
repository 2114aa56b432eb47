"""Perf lab: phase-by-phase timing of the Pallas nearest-hit pipeline.

Runs the bench scene's primary rays directly through the intersector stack
(no shading) and times each phase separately on the real device:

  cull    — prepare_tiles (tile bounds + dense cluster cull)
  select  — select_candidates (compact + sort)
  kernel  — intersect_tiles (the fused Pallas kernel)
  full    — nearest_hit_pallas (everything incl. overflow tail cond)

Also reports the kernel's per-tile iteration statistics (clusters actually
tested), the single best predictor of VPU work.

Usage: python tools/perflab.py [--tris 1e6] [--res 1024] [--tile 256]
       [--maxc 256] [--reps 3] [--phases cull,select,kernel,full]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(out):
    # Force a device-to-host scalar copy: block_until_ready returns early on
    # the experimental axon tunnel platform (see docs/PERF.md), so timings
    # must sync through an actual transfer.
    import jax

    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "sum")]
    for x in leaves:
        np.asarray(x.sum() if x.dtype != bool else x.any())
    return out


def timed(fn, args, reps, name):
    t0 = time.perf_counter()
    out = _sync(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name:8s} compile={compile_s:7.1f}s best={best * 1e3:9.2f}ms "
          f"times={[round(t * 1e3, 1) for t in times]}")
    return out, best


def main():
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=float, default=1e6)
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--tile", type=int, default=256)
    p.add_argument("--maxc", type=int, default=256)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--recull", type=int, default=6)
    p.add_argument("--no-pretest", action="store_true")
    p.add_argument("--phases", type=str, default="cull,select,kernel,full")
    args = p.parse_args()
    phases = set(args.phases.split(","))

    from bench import build_scene
    from raytpu.accel.tiled import prepare_tiles, select_candidates
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.dispatch import nearest_hit_pallas
    from raytpu.kernels.intersect import intersect_tiles
    from raytpu.render.wavefront import block_order_perm

    t0 = time.perf_counter()
    scene, true_tris = build_scene(args.tris)
    flat = scene.flatten(build_octree=False, build_clusters=True)
    print(f"setup {time.perf_counter() - t0:.1f}s tris={true_tris} "
          f"clusters={flat.clusters['cluster_min'].shape[0]}")

    camera = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                    aspect=1.0)
    origin, direction = camera_rays(camera, args.res, args.res)
    perm = block_order_perm(args.res, args.res, max(1, int(args.tile ** 0.5)))
    origin = jax.device_put(origin[perm])
    direction = jax.device_put(direction[perm])
    r = origin.shape[0]
    print(f"rays={r} tiles={r // args.tile} tile={args.tile} maxc={args.maxc}")

    ts = args.tile
    maxc = args.maxc

    if "cull" in phases or "select" in phases or "kernel" in phases:
        cull_fn = jax.jit(lambda s, o, d: prepare_tiles(
            s, o, d, None, None, None, ts))
        (rays_t, cm), _ = timed(cull_fn, (flat, origin, direction),
                                args.reps, "cull")
        mask, entry = cm

        sel_fn = jax.jit(lambda m, e: select_candidates(m, e, maxc))
        (keys, cand, counts_raw), _ = timed(sel_fn, (mask, entry),
                                            args.reps, "select")
        cr = np.asarray(counts_raw)
        print(f"candidates/tile: mean={cr.mean():.1f} p50={np.median(cr):.0f} "
              f"p95={np.percentile(cr, 95):.0f} max={cr.max()} "
              f"overflow(> {maxc})={np.mean(cr > maxc) * 100:.2f}%")

    if "kernel" in phases:
        o, d, itri, imesh, tmax = rays_t
        counts = jnp.minimum(counts_raw, maxc)
        cl_block = flat.clusters["block"]

        kern = jax.jit(lambda c, ca, k, o_, d_, tm, it, im, b: intersect_tiles(
            c, ca, k, o_, d_, tm, it, im, b, cull=True, interpret=False))
        outs, best = timed(
            kern, (counts, cand, keys, o, d, tmax, itri, imesh, cl_block),
            args.reps, "kernel")
        iters = np.asarray(outs[4])
        tested = np.asarray(jnp.minimum(counts, iters))
        print(f"iters/tile: mean={iters.mean():.1f} p50={np.median(iters):.0f} "
              f"p95={np.percentile(iters, 95):.0f} max={iters.max()}")
        pair_tests = tested.sum() * ts * cl_block.shape[2]
        print(f"pair tests: {pair_tests / 1e9:.2f}G "
              f"({pair_tests / r:.0f}/ray) -> "
              f"{pair_tests / best / 1e12:.2f}T pairs/s in-kernel")

    if "full" in phases:
        full_fn = jax.jit(lambda s, o_, d_: nearest_hit_pallas(
            s, o_, d_, tile_size=ts, maxc=maxc))
        hit, best = timed(full_fn, (flat, origin, direction), args.reps,
                          "full")
        h = np.asarray(hit.hit)
        print(f"full: hit_frac={h.mean():.3f} "
              f"rays/s={r / best / 1e6:.1f}M (primary only)")

    if "fused" in phases:
        from raytpu.kernels.fused import nearest_hit_fused

        fused_fn = jax.jit(lambda s, o_, d_: nearest_hit_fused(
            s, o_, d_, tile_size=ts, recull_every=args.recull,
            pretest=not args.no_pretest, return_iters=True))
        (hit, iters), best = timed(fused_fn, (flat, origin, direction),
                                   args.reps, "fused")
        h = np.asarray(hit.hit)
        it = np.asarray(iters)
        print(f"fused: hit_frac={h.mean():.3f} "
              f"rays/s={r / best / 1e6:.1f}M (primary only)")
        print(f"trips/tile: mean={it.mean():.1f} p50={np.median(it):.0f} "
              f"p95={np.percentile(it, 95):.0f} max={it.max()}")

        # Shadow query from the *actual* primary hit points toward the
        # bench light — the second half of the headline frame's
        # intersection work (wavefront._light_result).
        def shadow(s, o_, d_):
            ht = nearest_hit_fused(s, o_, d_, tile_size=ts)
            frag = o_ + d_ * ht.t[:, None]
            lp = jnp.array([0.0, 30.0, 25.0], jnp.float32)
            sdir = lp - frag
            sdist = jnp.linalg.norm(sdir, axis=-1)
            sdir = sdir / sdist[:, None]
            sdir = jnp.where(ht.hit[:, None], sdir, jnp.nan)
            sh = nearest_hit_fused(
                s, frag, sdir, ignore_tri=ht.tri, tile_size=ts,
                any_hit=True, t_max=sdist)
            return sh.hit
        _, best_sh = timed(jax.jit(shadow), (flat, origin, direction),
                           args.reps, "prim+sh")
        print(f"shadow-only ~= {1e3 * (best_sh - best):.1f}ms")

    if "kern2" in phases:
        # The fused kernel alone on pre-packed tiles: isolates the in-VMEM
        # walk from ray packing (host-side stack) and the winner epilogue
        # (slotgeo gather + exact recompute).
        from raytpu.kernels.fused import ROWS, fused_tiles

        cl = flat.clusters
        f32 = jnp.float32
        i32 = jnp.int32
        rr = origin.shape[0]
        nt = rr // ts
        bits = lambda a: jax.lax.bitcast_convert_type(a, f32)
        packed = jnp.stack(
            [origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2],
             jnp.full((rr,), 3.4028235e38, f32),
             bits(jnp.full((rr,), -1, i32)),
             bits(jnp.full((rr,), -1, i32))]
            + [jnp.zeros((rr,), f32)] * (ROWS - 9),
            axis=0,
        ).reshape(ROWS, nt, ts).transpose(1, 0, 2)
        packed = jax.device_put(packed)

        k2 = jax.jit(lambda p, a, ro, b: fused_tiles(
            p, a, ro, b, has_ignore=False, mxu=True,
            recull_every=args.recull, pretest=not args.no_pretest))
        (bt, code, res, iters), best = timed(
            k2, (packed, cl["aabb"], cl["root"], cl["gblock"]),
            args.reps, "kern2")
        it = np.asarray(iters)
        print(f"kern2 trips/tile: mean={it.mean():.1f} "
              f"p50={np.median(it):.0f} p95={np.percentile(it, 95):.0f} "
              f"max={it.max()} rays/s={rr / best / 1e6:.1f}M")

    if "frame" in phases:
        from raytpu.config import Intersector, Quantize, RenderConfig
        from raytpu.render.wavefront import render_rays

        cfg = RenderConfig(
            width=args.res, height=args.res, max_reflections=0,
            intersector=Intersector.PALLAS, tile_pixels=32768,
            quantize=Quantize.NONE, cull_tile=ts)
        frame_fn = jax.jit(lambda s, o_, d_: render_rays(s, cfg, o_, d_))
        _, best_fr = timed(frame_fn, (flat, origin, direction), args.reps,
                           "frame")
        print(f"frame: {2 * r / best_fr / 1e6:.1f}M rays/s "
              f"(primary+shadow metric)")


if __name__ == "__main__":
    main()
