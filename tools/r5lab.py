"""Round-5 kernel lab: subcluster (csize 64/32) tlane walk + plane cull A/B.

Same-process sweep on the bench workload (1M-tri heightfield, 1024^2,
camera (0,28,34)) — cross-process timings drift up to 2x on the tunnel, so
every comparison here shares one process.  Two query shapes, exactly the
frame's composition:

  * primary nearest:  camera rays, block-order perm, tile 256
  * reversed shadow:  any_hit from the LIGHT toward primary hit points
                      (cull="reverse", t_max = light distance) — the
                      wavefront's opaque-spot shadow query shape

Phases:
  1. hardware smoke test: tiny scene, subk in (1,2,4) x plane on/off must
     match the tiled backend exactly (Mosaic lowering check — interpret
     mode does not validate layout constraints).
  2. sweep: per bake (csize 128 / 64 / 32), nearest + shadow with plane
     on/off; r4 defaults (cs128 tlane nearest / row shadow) as baseline.
  3. trips: per-config mean/p95 walk trips (return_iters) for the writeup.

Usage: python tools/r5lab.py [--skip-smoke] [--csizes 128,64,32]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def sync(x):
    return float(np.asarray(x if not isinstance(x, tuple) else x[0]).sum())


def timeit(fn, reps=3):
    import jax
    out = fn()
    s = sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = sync(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts), s


def smoke():
    import jax.numpy as jnp
    from scenes import sphere_and_plane_scene
    from raytpu.accel.tiled import nearest_hit_tiled
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import nearest_hit_fused

    cam = Camera(position=(0.0, 16.0, 32.0), aspect=1.0)
    o, d = camera_rays(cam, 32, 32)
    for cs in (128, 64, 32):
        flat = sphere_and_plane_scene(reflect=0.3).flatten(
            build_octree=False, cluster_size=cs)
        base = nearest_hit_tiled(flat, o, d)
        bh = np.asarray(base.hit)
        for plane in (False, True):
            h = nearest_hit_fused(flat, o, d, layout="t", plane=plane,
                                  interpret=False)
            np.testing.assert_array_equal(np.asarray(h.hit), bh)
            np.testing.assert_array_equal(np.asarray(h.tri), np.asarray(base.tri))
            np.testing.assert_allclose(np.asarray(h.t)[bh],
                                       np.asarray(base.t)[bh], rtol=1e-5)
            ha = nearest_hit_fused(flat, o, d, any_hit=True,
                                   t_max=jnp.full((o.shape[0],), 25.0),
                                   layout="t", plane=plane, interpret=False)
            ba = nearest_hit_tiled(flat, o, d,
                                   t_max=jnp.full((o.shape[0],), 25.0),
                                   any_hit=True)
            np.testing.assert_array_equal(np.asarray(ha.hit),
                                          np.asarray(ba.hit))
            print(f"smoke cs={cs} plane={plane} OK", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-smoke", action="store_true")
    ap.add_argument("--csizes", default="128,64,32")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--tris", type=float, default=1e6)
    ap.add_argument("--trips", action="store_true",
                    help="also record per-config walk-trip stats")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    if not args.skip_smoke:
        smoke()

    from bench import build_scene
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import nearest_hit_fused
    from raytpu.render.wavefront import block_order_perm

    scene, ntris = build_scene(args.tris)
    res = args.res
    cam = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                 aspect=1.0)
    o, d = camera_rays(cam, res, res)
    perm = block_order_perm(res, res, 16)
    o = jax.device_put(o[perm])
    d = jax.device_put(d[perm])
    light_pos = np.asarray([0.0, 30.0, 25.0], np.float32)

    results = {}
    for cs in [int(x) for x in args.csizes.split(",")]:
        t0 = time.perf_counter()
        flat = scene.flatten(build_octree=False, cluster_size=cs)
        print(f"\n=== csize {cs} (bake {time.perf_counter()-t0:.0f}s, "
              f"leaves {flat.clusters['cluster_min'].shape[0]}, "
              f"blocks {flat.clusters['block'].shape[0]}) ===", flush=True)

        # --- primary nearest ---
        planes = (False, True)
        hit0 = None
        for plane in planes:
            q = jax.jit(lambda oo, dd, plane=plane: nearest_hit_fused(
                flat, oo, dd, tile_size=256, layout="t", plane=plane,
                interpret=False))
            dt, _ = timeit(lambda: q(o, d).t)
            h = q(o, d)
            if hit0 is None:
                hit0 = h
            else:
                np.testing.assert_array_equal(np.asarray(h.tri),
                                              np.asarray(hit0.tri))
            results[(cs, "nearest", plane)] = dt
            print(f"  nearest tlane plane={plane}: {dt*1e3:8.1f} ms",
                  flush=True)

        # --- reversed shadow any_hit (shared origin at the light) ---
        hnp = np.asarray(hit0.hit)
        t_np = np.asarray(hit0.t)
        frag = np.asarray(o) + t_np[:, None] * np.asarray(d)
        vec = frag - light_pos
        dist = np.linalg.norm(vec, axis=-1)
        sdir = vec / np.maximum(dist[:, None], 1e-20)
        sdir = np.where(hnp[:, None], sdir, np.nan).astype(np.float32)
        dist = np.where(hnp, dist, 0.0).astype(np.float32)
        so = jax.device_put(np.broadcast_to(light_pos, frag.shape).copy())
        sd = jax.device_put(sdir)
        st = jax.device_put(dist)
        itri = jax.device_put(np.asarray(hit0.tri, np.int32))

        shadow_cfgs = [("row", False)] + [("t", p) for p in planes]
        for layout, plane in shadow_cfgs:
            if layout == "row" and cs != 128:
                # row treats blocks as 128-clusters; still test for A/B
                pass
            q = jax.jit(lambda soo, sdd, stt, ii, layout=layout,
                        plane=plane: nearest_hit_fused(
                            flat, soo, sdd, ignore_tri=ii, tile_size=256,
                            t_max=stt, any_hit=True, cull="reverse",
                            layout=layout, plane=plane,
                            interpret=False).hit)
            dt, occ = timeit(lambda: q(so, sd, st, itri))
            results[(cs, f"shadow_{layout}", plane)] = dt
            print(f"  shadow {layout:>3} plane={plane}: {dt*1e3:8.1f} ms "
                  f"(occluded {occ:.0f})", flush=True)

        if args.trips:
            for plane in planes:
                _, it = nearest_hit_fused(
                    flat, o, d, tile_size=256, layout="t", plane=plane,
                    return_iters=True, interpret=False)
                it = np.asarray(it)
                print(f"  trips nearest plane={plane}: mean {it.mean():.1f}"
                      f" p95 {np.percentile(it, 95):.0f}", flush=True)
                _, it = nearest_hit_fused(
                    flat, so, sd, ignore_tri=itri, tile_size=256,
                    t_max=st, any_hit=True, cull="reverse", layout="t",
                    plane=plane, return_iters=True, interpret=False)
                it = np.asarray(it)
                print(f"  trips shadow  plane={plane}: mean {it.mean():.1f}"
                      f" p95 {np.percentile(it, 95):.0f}", flush=True)

    print("\n=== summary (ms) ===")
    for k in sorted(results, key=str):
        print(f"  {k}: {results[k]*1e3:.1f}")


if __name__ == "__main__":
    main()
