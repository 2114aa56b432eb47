"""Round-4 kernel lab: prepick walk + cheap any_hit vs the classic walk.

One process (tunnel timings only compare same-process), honest one-scalar
sync.  Measures, on the bench workload (1M-tri heightfield, 1024 primary
rays + spotlight shadow rays):

1. a tiny hardware smoke of the prepick kernel (lowering check first —
   interpret mode does not validate Mosaic constraints),
2. primary nearest-hit: classic vs prepick at several (F, nbuf),
3. shadow occlusion: classic (cheap any_hit) vs prepick,
4. whole frames via RenderConfig.

Usage: python tools/r4lab.py [--tris 1e6] [--res 1024] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(out):
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "sum")]
    total = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
    return float(np.asarray(total))


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
    print(f"{name:18s} compile={compile_s:6.1f}s best={best * 1e3:8.2f}ms "
          f"times={[round(t * 1e3, 1) for t in times]}", flush=True)
    return out, best


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

    # --- 1. Hardware lowering smoke: tiny ray set through prepick ---
    rng = np.random.default_rng(0)
    o_s = jnp.asarray(rng.normal(0, 5, (512, 3)), jnp.float32)
    d_s = rng.normal(0, 1, (512, 3))
    d_s = jnp.asarray(d_s / np.linalg.norm(d_s, axis=1, keepdims=True),
                      jnp.float32)
    try:
        h_cl = nearest_hit_fused(flat, o_s, d_s, tile_size=256)
        h_pp = nearest_hit_fused(flat, o_s, d_s, tile_size=256,
                                 prepick=16, nbuf=4)
        same = float((np.asarray(h_pp.tri) == np.asarray(h_cl.tri)).mean())
        print(f"smoke: prepick vs classic tri parity = {same:.6f}",
              flush=True)
        h_ca = nearest_hit_fused(flat, o_s, d_s, tile_size=256,
                                 t_max=jnp.full((512,), 30.0), any_hit=True)
        h_pa = nearest_hit_fused(flat, o_s, d_s, tile_size=256,
                                 t_max=jnp.full((512,), 30.0), any_hit=True,
                                 prepick=16)
        same_a = float(
            (np.asarray(h_pa.hit) == np.asarray(h_ca.hit)).mean())
        print(f"smoke: any_hit parity = {same_a:.6f}", flush=True)
    except Exception as e:  # noqa: BLE001 — report lowering failures
        print(f"SMOKE FAILED: {type(e).__name__}: {e}", flush=True)
        return

    camera = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                    aspect=1.0)
    origin, direction = camera_rays(camera, args.res, args.res)
    perm = block_order_perm(args.res, args.res, 16)
    origin = jax.device_put(origin[perm])
    direction = jax.device_put(direction[perm])

    # --- 2. Primary query ---
    def prim(f, nb):
        return jax.jit(lambda s_, o, d: nearest_hit_fused(
            s_, o, d, prepick=f, nbuf=nb, return_iters=True))

    (h0, t_cl) = timed(prim(0, 4), (flat, origin, direction), args.reps,
                       "prim-classic")
    it0 = np.asarray(h0[1])
    print(f"  trips mean/p95/max={it0.mean():.1f}/"
          f"{np.percentile(it0, 95):.0f}/{it0.max()}", flush=True)
    hit_ref = np.asarray(h0[0].tri)
    best_prim = (None, t_cl)
    for f, nb in ((32, 2), (32, 4), (32, 8), (16, 4)):
        (h, t) = timed(prim(f, nb), (flat, origin, direction), args.reps,
                       f"prim-pp{f}-nb{nb}")
        mism = float((np.asarray(h[0].tri) != hit_ref).mean())
        it = np.asarray(h[1])
        print(f"  trips mean/p95={it.mean():.1f}/"
              f"{np.percentile(it, 95):.0f} mismatch={mism * 100:.4f}%",
              flush=True)
        if t < best_prim[1]:
            best_prim = ((f, nb), t)
    print(f"primary best: {best_prim}", flush=True)

    # --- 3. Shadow query ---
    from raytpu.scene import lights as lights_mod

    def shadow(f, nb):
        def go(s_, o, d, h_tri, h_u, h_v, h_hit):
            safe = jnp.maximum(h_tri, 0)
            frag = (s_.tri_v1[safe] + s_.tri_e1[safe] * h_u[..., None]
                    + s_.tri_e2[safe] * h_v[..., None])
            sdir, sdist = lights_mod.light_shadow_query(s_.lights, 0, frag)
            sdir = jnp.where(h_hit[..., None], sdir, jnp.float32(jnp.nan))
            return nearest_hit_fused(s_, frag, sdir, ignore_tri=h_tri,
                                     t_max=sdist, any_hit=True,
                                     prepick=f, nbuf=nb, return_iters=True)
        return jax.jit(go)

    hp = h0[0]
    sargs = (flat, origin, direction, hp.tri, hp.u, hp.v, hp.hit)
    (s0, t_s_cl) = timed(shadow(0, 4), sargs, args.reps, "shad-classic")
    its = np.asarray(s0[1])
    print(f"  trips mean/p95/max={its.mean():.1f}/"
          f"{np.percentile(its, 95):.0f}/{its.max()} "
          f"occ={float(np.asarray(s0[0].hit).mean()):.3f}", flush=True)
    occ_ref = np.asarray(s0[0].hit)
    best_sh = (None, t_s_cl)
    for f, nb in ((48, 4), (96, 4), (96, 8), (48, 8)):
        (s_o, t) = timed(shadow(f, nb), sargs, args.reps,
                         f"shad-pp{f}-nb{nb}")
        mism = float((np.asarray(s_o[0].hit) != occ_ref).mean())
        it = np.asarray(s_o[1])
        print(f"  trips mean/p95={it.mean():.1f}/"
              f"{np.percentile(it, 95):.0f} mismatch={mism * 100:.4f}%",
              flush=True)
        if t < best_sh[1]:
            best_sh = ((f, nb), t)
    print(f"shadow best: {best_sh}", flush=True)

    # --- 4. Whole frames ---
    import dataclasses

    from raytpu.config import Intersector, Quantize, RenderConfig
    from raytpu.render.wavefront import render_rays

    rr = origin.shape[0]
    cfg0 = RenderConfig(width=args.res, height=args.res, max_reflections=0,
                        intersector=Intersector.PALLAS, tile_pixels=rr,
                        quantize=Quantize.NONE)
    timed(jax.jit(lambda s_, o, d: render_rays(s_, cfg0, o, d)),
          (flat, origin, direction), args.reps, "frame-classic")
    pf, pnb = best_prim[0] or (32, 4)
    cfg1 = dataclasses.replace(cfg0, cull_prepick=pf, cull_nbuf=pnb)
    timed(jax.jit(lambda s_, o, d: render_rays(s_, cfg1, o, d)),
          (flat, origin, direction), args.reps, f"frame-pp{pf}-nb{pnb}")


if __name__ == "__main__":
    main()
