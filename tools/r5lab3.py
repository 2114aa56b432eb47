"""Round-5 lab 3: drift-robust A/B of the subcluster/plane/gate matrix.

Labs 1-2 disagreed by up to 2.1x on IDENTICAL configs (cs128 gated
nearest: 187 vs 303 ms; cs64 ungated: 389 vs 184 ms), with measurements
taken right after a compile inflated in both runs — the tunnel's timing
drifts within a process, not just across processes.  Protocol fix:

  phase 1: compile EVERY variant (call + sync), no timing;
  phase 2: R interleaved rounds over all variants, one timed call each,
           per-variant MIN across rounds — drift hits all variants
           equally instead of whichever compiled last.
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

    flats = {}
    for cs in (128, 64, 32):
        flats[cs] = scene.flatten(build_octree=False, cluster_size=cs)
    print("bakes done", flush=True)

    # Shadow ray set off a quick cs128 query.
    h = nearest_hit_fused(flats[128], o, d, tile_size=256, layout="t",
                          plane=False, gate=False, interpret=False)
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

    variants = {}

    def add_nearest(name, cs, gate, plane, layout="t"):
        flat = flats[cs]
        fn = jax.jit(lambda oo, dd: nearest_hit_fused(
            flat, oo, dd, tile_size=256, layout=layout, plane=plane,
            gate=gate, interpret=False).t)
        variants[name] = lambda: sync(fn(o, d))

    def add_shadow(name, cs, layout, gate, plane):
        flat = flats[cs]
        fn = jax.jit(lambda: nearest_hit_fused(
            flat, so, sd, ignore_tri=itri, tile_size=256, t_max=st,
            any_hit=True, cull="reverse", layout=layout, plane=plane,
            gate=gate, interpret=False).hit)
        variants[name] = lambda: sync(fn())

    add_nearest("N cs128 base(r4)", 128, False, False)
    add_nearest("N cs128 plane", 128, False, True)
    add_nearest("N cs128 gate+plane", 128, True, True)
    add_nearest("N cs64 plain", 64, False, False)
    add_nearest("N cs64 gate+plane", 64, True, True)
    add_nearest("N cs32 gate+plane", 32, True, True)
    add_shadow("S cs128 row(r4)", 128, "row", True, False)
    add_shadow("S cs128 t", 128, "t", False, False)
    add_shadow("S cs128 t+plane", 128, "t", False, True)
    add_shadow("S cs64 t gate+plane", 64, "t", True, True)
    add_shadow("S cs32 t gate+plane", 32, "t", True, True)

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
        print(f"  {name:22s}: min {ts[0]*1e3:7.1f}  med "
              f"{ts[len(ts)//2]*1e3:7.1f}   all {ms}")


if __name__ == "__main__":
    main()
