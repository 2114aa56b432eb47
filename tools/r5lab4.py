"""Round-5 lab 4: 3D-flattened cull tables + frame-level clearance A/B.

r5lab3 isolated a ~2.6x tlane regression to the 4D VMEM cull-table blocks
(the unchanged row kernel ran FASTER than r4 in the same process).  The
tables now ride as flat 3D rows; this lab re-runs the drift-robust
protocol (compile all, interleaved timed rounds, per-variant min) on:

  * nearest: cs128 {plain, plane}, cs64 {plane, gate+plane}
  * shadow:  row baseline, tlane+plane
  * FRAME:   the full bench wavefront (primary + reversed shadow +
    shading) with shadow_clearance on/off — the per-block clearance shift
    is the round's main shadow lever and only shows at frame level.
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
    from raytpu.config import Intersector, Quantize, RenderConfig
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import nearest_hit_fused
    from raytpu.render.wavefront import block_order_perm, render_rays

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

    flats = {cs: scene.flatten(build_octree=False, cluster_size=cs)
             for cs in (128, 64)}
    print("bakes done", flush=True)

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

    def add_nearest(name, cs, gate, plane):
        flat = flats[cs]
        fn = jax.jit(lambda oo, dd: nearest_hit_fused(
            flat, oo, dd, tile_size=256, layout="t", plane=plane,
            gate=gate, interpret=False).t)
        variants[name] = lambda: sync(fn(o, d))

    def add_shadow(name, cs, layout, gate, plane):
        flat = flats[cs]
        fn = jax.jit(lambda: nearest_hit_fused(
            flat, so, sd, ignore_tri=itri, tile_size=256, t_max=st,
            any_hit=True, cull="reverse", layout=layout, plane=plane,
            gate=gate, interpret=False).hit)
        variants[name] = lambda: sync(fn())

    def add_frame(name, cs, clearance):
        flat = flats[cs]
        cfg = RenderConfig(width=res, height=res, max_reflections=0,
                           intersector=Intersector.PALLAS,
                           tile_pixels=res * res, quantize=Quantize.NONE,
                           shadow_clearance=clearance)
        fn = jax.jit(lambda s, oo, dd: render_rays(s, cfg, oo, dd))
        variants[name] = lambda: sync(fn(flat, o, d))

    add_nearest("N cs128 plain", 128, False, False)
    add_nearest("N cs128 plane", 128, False, True)
    add_nearest("N cs64 plane", 64, False, True)
    add_nearest("N cs64 gate+plane", 64, True, True)
    add_shadow("S cs128 row", 128, "row", True, False)
    add_shadow("S cs128 t+plane", 128, "t", False, True)
    add_frame("F cs128 clear=0", 128, False)
    add_frame("F cs128 clear=1", 128, True)

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
        print(f"  {name:20s}: min {ts[0]*1e3:7.1f}  med "
              f"{ts[len(ts)//2]*1e3:7.1f}   all {ms}")


if __name__ == "__main__":
    main()
