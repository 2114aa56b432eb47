"""Round-4 lab #7: transposed (tlane) kernel vs row layout on the v5e.

Same-process: primary nearest-hit, reversed shadow occlusion, and whole
frames for both layouts.  (~25 ms of every sample is tunnel RPC — only
the deltas matter.)

Usage: python tools/r4lab7.py [--tris 1e6] [--res 1024] [--reps 4]
"""

from __future__ import annotations

import argparse
import dataclasses
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
    from raytpu.scene import lights as lights_mod

    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=float, default=1e6)
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()

    t0 = time.perf_counter()
    scene, true_tris = build_scene(args.tris)
    flat = scene.flatten(build_octree=False, build_clusters=True)
    print(f"setup {time.perf_counter() - t0:.1f}s tris={true_tris} "
          f"tblock={'tblock' in flat.clusters}", flush=True)

    camera = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                    aspect=1.0)
    origin, direction = camera_rays(camera, args.res, args.res)
    perm = block_order_perm(args.res, args.res, 16)
    origin = jax.device_put(origin[perm])
    direction = jax.device_put(direction[perm])

    def prim(layout, ts=256):
        return jax.jit(lambda s_, o, d: nearest_hit_fused(
            s_, o, d, layout=layout, tile_size=ts, return_iters=True))

    ref_tri = None
    outs = {}
    for layout in ("row", "t"):
        for ts in ((256, 128) if layout == "t" else (256,)):
            (h, t) = timed(prim(layout, ts), (flat, origin, direction),
                           args.reps, f"prim-{layout}-ts{ts}")
            if ref_tri is None:
                ref_tri = np.asarray(h[0].tri)
                outs["prim"] = h[0]
            else:
                mism = float((np.asarray(h[0].tri) != ref_tri).mean())
                print(f"  tri mismatch={mism * 100:.4f}%", flush=True)

    hp = outs["prim"]

    def shadow(layout, ts=256):
        def go(s_, h_tri, h_u, h_v, h_hit):
            safe = jnp.maximum(h_tri, 0)
            frag = (s_.tri_v1[safe] + s_.tri_e1[safe] * h_u[..., None]
                    + s_.tri_e2[safe] * h_v[..., None])
            sdir, sdist = lights_mod.light_shadow_query(s_.lights, 0, frag)
            lpos = s_.lights["position"][0]
            return nearest_hit_fused(
                s_, jnp.broadcast_to(lpos, frag.shape),
                jnp.where(h_hit[..., None], -sdir, jnp.float32(jnp.nan)),
                ignore_tri=h_tri, t_max=sdist, any_hit=True,
                cull="reverse", layout=layout, tile_size=ts,
                return_iters=True)
        return jax.jit(go)

    sargs = (flat, hp.tri, hp.u, hp.v, hp.hit)
    occ_ref = None
    for layout in ("row", "t"):
        for ts in ((256, 128) if layout == "t" else (256,)):
            (s_o, t) = timed(shadow(layout, ts), sargs, args.reps,
                             f"shad-{layout}-ts{ts}")
            hits = np.asarray(s_o[0].hit)
            if occ_ref is None:
                occ_ref = hits
            else:
                print(f"  occ mism={(hits != occ_ref).mean():.6f}",
                      flush=True)

    from raytpu.config import Intersector, Quantize, RenderConfig
    from raytpu.render.wavefront import render_rays

    rr = origin.shape[0]
    cfg = RenderConfig(width=args.res, height=args.res, max_reflections=0,
                       intersector=Intersector.PALLAS, tile_pixels=rr,
                       quantize=Quantize.NONE)
    imgs = {}
    for layout in ("t", "row"):
        # Frame-level layout control: drop tblock from the scene to force
        # the row path (the AUTO rule prefers tlane when baked).
        fl = flat if layout == "t" else flat.replace(
            clusters={k: v for k, v in flat.clusters.items()
                      if k != "tblock"})
        (img, t) = timed(jax.jit(lambda s_, o, d: render_rays(
            s_, cfg, o, d)), (fl, origin, direction), args.reps,
            f"frame-{layout}")
        imgs[layout] = np.asarray(img)
        print(f"  rays/s = {2 * rr / t / 1e6:.1f}M", flush=True)
    print("frame parity: max|diff| =",
          np.abs(imgs["t"] - imgs["row"]).max(), flush=True)


if __name__ == "__main__":
    main()
