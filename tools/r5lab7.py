"""Round-5 lab 7: row-kernel plane cull on the shadow query + frame A/B.

Short drift-robust run: does the block-level plane cull pay on the
reversed shadow query (the frame's bigger half, row layout) and at frame
level?  Plus the final-defaults frame as the BENCH_r05 preview.
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

    flat = scene.flatten(build_octree=False, cluster_size=128)
    print("bake done", flush=True)

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

    variants = {}

    def add_shadow(name, plane):
        fn = jax.jit(lambda plane=plane: nearest_hit_fused(
            flat, so, sd, ignore_tri=itri, tile_size=256, t_max=st,
            any_hit=True, cull="reverse", layout="row", plane=plane,
            interpret=False).hit)
        variants[name] = lambda fn=fn: sync(fn())

    add_shadow("S row plane=0", False)
    add_shadow("S row plane=1", True)

    for name, plane in (("F frame", True),):
        cfg = RenderConfig(width=res, height=res, max_reflections=0,
                           intersector=Intersector.PALLAS,
                           tile_pixels=res * res, quantize=Quantize.NONE)
        fn = jax.jit(lambda s, oo, dd, cfg=cfg: render_rays(s, cfg, oo,
                                                            dd))
        variants[name] = lambda fn=fn: sync(fn(flat, o, d))

    print("compiling", flush=True)
    for name, fn in variants.items():
        t0 = time.perf_counter()
        fn()
        print(f"  compiled {name} ({time.perf_counter()-t0:.0f}s)",
              flush=True)

    rounds = 6
    times = {k: [] for k in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)

    print("\n=== min / median ms over rounds ===")
    for name in variants:
        ts = sorted(times[name])
        ms = [f"{t*1e3:.0f}" for t in times[name]]
        print(f"  {name:14s}: min {ts[0]*1e3:7.1f}  med "
              f"{ts[len(ts)//2]*1e3:7.1f}   all {ms}")


if __name__ == "__main__":
    main()
