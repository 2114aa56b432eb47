"""Round-4 lab #2: shadow-from-light reversal + tile-size sweep on the v5e.

Same-process comparisons only.  Measures the shadow occlusion query cast
forward (fragment->light) vs reversed (light->fragment, cull="reverse") at
ts 128/256, then whole frames with the reversal on/off.

Usage: python tools/r4lab2.py [--tris 1e6] [--res 1024] [--reps 3]
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

    prim = jax.jit(lambda s_, o, d: nearest_hit_fused(s_, o, d))
    (hp, _) = timed(prim, (flat, origin, direction), args.reps, "primary")

    def shadow(rev, ts):
        def go(s_, h_tri, h_u, h_v, h_hit):
            safe = jnp.maximum(h_tri, 0)
            frag = (s_.tri_v1[safe] + s_.tri_e1[safe] * h_u[..., None]
                    + s_.tri_e2[safe] * h_v[..., None])
            sdir, sdist = lights_mod.light_shadow_query(s_.lights, 0, frag)
            nanv = jnp.float32(jnp.nan)
            if rev:
                lpos = s_.lights["position"][0]
                return nearest_hit_fused(
                    s_, jnp.broadcast_to(lpos, frag.shape),
                    jnp.where(h_hit[..., None], -sdir, nanv),
                    ignore_tri=h_tri, t_max=sdist, any_hit=True,
                    cull="reverse", tile_size=ts, return_iters=True)
            return nearest_hit_fused(
                s_, frag, jnp.where(h_hit[..., None], sdir, nanv),
                ignore_tri=h_tri, t_max=sdist, any_hit=True,
                tile_size=ts, return_iters=True)
        return jax.jit(go)

    sargs = (flat, hp.tri, hp.u, hp.v, hp.hit)
    ref = None
    for rev in (False, True):
        for ts in (256, 128):
            (s_o, t) = timed(shadow(rev, ts), sargs, args.reps,
                             f"shad-{'rev' if rev else 'fwd'}-ts{ts}")
            it = np.asarray(s_o[1])
            hits = np.asarray(s_o[0].hit)
            if ref is None:
                ref = hits
            print(f"  trips mean/p95/max={it.mean():.1f}/"
                  f"{np.percentile(it, 95):.0f}/{it.max()} "
                  f"occ={hits.mean():.4f} mism={(hits != ref).mean():.6f}",
                  flush=True)

    from raytpu.config import Intersector, Quantize, RenderConfig
    from raytpu.render.wavefront import render_rays

    rr = origin.shape[0]
    cfg = RenderConfig(width=args.res, height=args.res, max_reflections=0,
                       intersector=Intersector.PALLAS, tile_pixels=rr,
                       quantize=Quantize.NONE)
    out = {}
    for rev in (True, False):
        c = dataclasses.replace(cfg, shadow_from_light=rev)
        (img, t) = timed(jax.jit(lambda s_, o, d, c=c: render_rays(
            s_, c, o, d)), (flat, origin, direction), args.reps,
            f"frame-rev{int(rev)}")
        out[rev] = np.asarray(img)
        print(f"  rays/s = {2 * rr / t / 1e6:.1f}M", flush=True)
    print("frame parity: max|diff| =",
          np.abs(out[True] - out[False]).max(), flush=True)


if __name__ == "__main__":
    main()
