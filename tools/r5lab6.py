"""Round-5 lab 6: isolate the shadow-clearance overhead (+127 ms/frame).

Components timed separately, same process, drift-robust protocol:

  1. clearance_spot sweep alone (NCB^2 interval test, lax.map chunks)
  2. tri_block gather alone (1M scalar rows)
  3. own_block_entry_exit alone (gathers + slab)
  4. reversed shadow query, no shift (reference)
  5. reversed shadow query with a precomputed binary shift applied
  6. 1M scalar gather from a small (NCB,) table (gather cost scale)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from raytpu.accel.shadowcull import (clearance_spot,
                                         own_block_entry_exit)
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import nearest_hit_fused
    from raytpu.render.wavefront import block_order_perm

    sync = lambda x: float(np.asarray(x).sum())
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    scene, _ = build_scene(1e6)
    res = 1024
    cam = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                 aspect=1.0)
    o, d = camera_rays(cam, res, res)
    perm = block_order_perm(res, res, 16)
    o = jax.device_put(o[perm])
    d = jax.device_put(d[perm])
    light_pos = np.asarray([0.0, 30.0, 25.0], np.float32)

    flat = scene.flatten(build_octree=False, cluster_size=128)
    cl = flat.clusters
    print(f"bakes done (blocks {cl['block'].shape[0]})", flush=True)

    h = nearest_hit_fused(flat, o, d, tile_size=256, layout="t",
                          plane=True, gate=False, interpret=False)
    hnp = np.asarray(h.hit)
    t_np = np.where(hnp, np.asarray(h.t), 0.0)
    frag = np.asarray(o) + t_np[:, None] * np.asarray(d)
    vec = frag - light_pos
    dist = np.linalg.norm(vec, axis=-1)
    sdir = np.where(hnp[:, None], vec / np.maximum(dist[:, None], 1e-20),
                    np.nan).astype(np.float32)
    dist = np.where(hnp, dist, 0.0).astype(np.float32)
    so = jax.device_put(np.broadcast_to(light_pos, frag.shape).copy())
    sd = jax.device_put(sdir)
    st = jax.device_put(dist)
    itri = jax.device_put(np.asarray(h.tri, np.int32))
    tri_j = jax.device_put(np.asarray(h.tri, np.int32))

    variants = {}

    cs_fn = jax.jit(lambda lp: clearance_spot(cl, lp))
    variants["clearance sweep"] = lambda: sync(
        cs_fn(jnp.asarray(light_pos)))

    tb_fn = jax.jit(lambda t: cl["tri_block"][jnp.clip(t, 0, 10 ** 7)])
    variants["tri_block gather"] = lambda: sync(tb_fn(tri_j))

    oe_fn = jax.jit(lambda t, oo, dd: own_block_entry_exit(
        cl, cl["tri_block"], t, oo, dd)[1])
    variants["own entry/exit"] = lambda: sync(oe_fn(tri_j, so, sd))

    dvals_np = None

    q_fn = jax.jit(lambda oo, sdd, stt, ii: nearest_hit_fused(
        flat, oo, sdd, ignore_tri=ii, tile_size=256, t_max=stt,
        any_hit=True, cull="reverse", layout="row",
        interpret=False).hit)
    variants["shadow noshift"] = lambda: sync(q_fn(so, sd, st, itri))

    # Precompute the binary shift on HOST (isolates the QUERY cost
    # under shifted origins from the shift computation cost).
    dvals = np.asarray(clearance_spot(cl, jnp.asarray(light_pos)))
    b_id, t_en, _ = own_block_entry_exit(
        cl, cl["tri_block"], tri_j, so, sd)
    t_en = np.maximum(np.asarray(t_en), 0.0)
    clear_ray = dvals[np.asarray(b_id)] >= t_en
    tmin = np.where(hnp & clear_ray,
                    np.clip(t_en * (1 - 1e-4) - 1e-4, 0, None),
                    0.0).astype(np.float32)
    print(f"clear fraction: {clear_ray[hnp].mean():.3f}  "
          f"mean tmin: {tmin[hnp].mean():.1f}  mean dist: "
          f"{dist[hnp].mean():.1f}", flush=True)
    so2 = jax.device_put((np.asarray(so) + tmin[:, None]
                          * np.asarray(sd)).astype(np.float32))
    st2 = jax.device_put((dist - tmin).astype(np.float32))
    variants["shadow shifted"] = lambda: sync(q_fn(so2, sd, st2, itri))

    small = jax.device_put(np.arange(cl["block"].shape[0],
                                     dtype=np.float32))
    bid_j = jax.device_put(np.asarray(b_id, np.int32))
    sg_fn = jax.jit(lambda t, i: t[i])
    variants["scalar gather 1M"] = lambda: sync(sg_fn(small, bid_j))

    print("compiling", flush=True)
    for name, fn in variants.items():
        t0 = time.perf_counter()
        fn()
        print(f"  compiled {name} ({time.perf_counter()-t0:.0f}s)",
              flush=True)

    rounds = 5
    times = {k: [] for k in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
        print(f"round {r} done", flush=True)

    print("\n=== min / median ms over rounds ===")
    for name in variants:
        ts = sorted(times[name])
        ms = [f"{t*1e3:.0f}" for t in times[name]]
        print(f"  {name:18s}: min {ts[0]*1e3:7.1f}  med "
              f"{ts[len(ts)//2]*1e3:7.1f}   all {ms}")


if __name__ == "__main__":
    main()
