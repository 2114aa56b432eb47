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


def _sync(out):
    """ONE device-to-host scalar transfer for the whole pytree.

    Per-leaf np.asarray round-trips add a tunnel RPC (~10-30 ms) EACH and
    systematically inflate phases with more outputs — sum everything into
    one scalar on device first."""
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "sum")]
    total = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
    return float(np.asarray(total))


def _morton3_dev(x, y, z):
    """30-bit Morton interleave on device (uint32 in, uint32 out)."""
    import jax.numpy as jnp

    def spread(v):
        v = v.astype(jnp.uint32) & jnp.uint32(0x3FF)
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return (spread(x) << 2) | (spread(y) << 1) | spread(z)


def timed(fn, args, reps, name):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
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

    def pack_t(o, d):
        # Transpose-then-concat variant: contiguous row reads instead of
        # three stride-3 column slices per vector.
        extra = jnp.stack(
            [jnp.full((rr,), 3.4028235e38, f32)]
            + [jnp.zeros((rr,), f32)] * (ROWS - 7), axis=0)
        return jnp.concatenate([o.T, d.T, extra], axis=0)

    timed(jax.jit(pack_t), (origin, direction), args.reps, "packT")

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
                                 t_max=sdist, any_hit=True,
                                 return_iters=True)

    (sh_out, _) = timed(jax.jit(shadow),
                        (flat, origin, direction, hit_full.tri, hit_full.u,
                         hit_full.v, hit_full.hit),
                        args.reps, "shadowq")
    it = np.asarray(sh_out[1])
    print(f"  shadow trips mean/p95/max = {it.mean():.1f}/"
          f"{np.percentile(it, 95):.0f}/{it.max()} sum={int(it.sum())} "
          f"occluded={float(np.asarray(sh_out[0].hit).mean()):.3f}",
          flush=True)

    def shadow_knobs(s_, o, d, h_tri, h_u, h_v, h_hit, pretest, recull):
        safe = jnp.maximum(h_tri, 0)
        frag = (s_.tri_v1[safe] + s_.tri_e1[safe] * h_u[..., None]
                + s_.tri_e2[safe] * h_v[..., None])
        sdir, sdist = lights_mod.light_shadow_query(s_.lights, 0, frag)
        sdir = jnp.where(h_hit[..., None], sdir, jnp.float32(jnp.nan))
        return nearest_hit_fused(s_, frag, sdir, ignore_tri=h_tri,
                                 t_max=sdist, any_hit=True,
                                 pretest=pretest, recull_every=recull)

    # Morton-sorted shadow rays: re-tile by fragment position so each
    # kernel tile is a compact world cell whose converging beam to the
    # light overlaps few clusters — instead of inheriting the primary's
    # PIXEL tiles, whose world footprint explodes at grazing angles.
    def shadow_sorted(s_, o, d, h_tri, h_u, h_v, h_hit):
        safe = jnp.maximum(h_tri, 0)
        frag = (s_.tri_v1[safe] + s_.tri_e1[safe] * h_u[..., None]
                + s_.tri_e2[safe] * h_v[..., None])
        sdir, sdist = lights_mod.light_shadow_query(s_.lights, 0, frag)
        sdir = jnp.where(h_hit[..., None], sdir, jnp.float32(jnp.nan))
        cl_ = s_.clusters
        lo = cl_["root_min"]
        ext = jnp.maximum(cl_["root_max"] - lo, 1e-30)
        q = jnp.clip(((frag - lo) / ext) * 1023.0, 0.0, 1023.0).astype(
            jnp.uint32)
        key = _morton3_dev(q[:, 0], q[:, 1], q[:, 2])
        order = jnp.argsort(jnp.where(h_hit, key, jnp.uint32(0xFFFFFFFF)))
        tk = lambda a: jnp.take(a, order, axis=0)
        h = nearest_hit_fused(s_, tk(frag), tk(sdir), ignore_tri=tk(h_tri),
                              t_max=tk(sdist), any_hit=True,
                              return_iters=True)
        hit_s, iters = h
        unsort = lambda a: jnp.zeros_like(a).at[order].set(a)
        return jax.tree.map(unsort, hit_s), iters

    (sh2, _) = timed(jax.jit(shadow_sorted),
                     (flat, origin, direction, hit_full.tri, hit_full.u,
                      hit_full.v, hit_full.hit),
                     args.reps, "shadow-srt")
    it2 = np.asarray(sh2[1])
    print(f"  sorted trips mean/p95/max = {it2.mean():.1f}/"
          f"{np.percentile(it2, 95):.0f}/{it2.max()} sum={int(it2.sum())}",
          flush=True)
    same = float((np.asarray(sh2[0].hit) == np.asarray(sh_out[0].hit)).mean())
    print(f"  sorted hit parity vs unsorted: {same:.6f}", flush=True)

    # argsort cost alone (1M uint32).
    key0 = jnp.arange(rr, dtype=jnp.uint32)[::-1]
    timed(jax.jit(jnp.argsort), (key0,), args.reps, "argsort")

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
