"""Round-5 lab 17: in-kernel winner-row resolve — device frame A/B.

Chained (select-eps, RPC-free) device slopes for:
  frame_rows:   render_rays, kernel-resolved shade rows (sblock bake)
  frame_gather: render_rays, classic XLA tri_shade gather (sblock popped)
  near_rows:    nearest query with return_rows=True
  near:         nearest query without rows
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from raytpu.config import Intersector, Quantize, RenderConfig
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import nearest_hit_fused
    from raytpu.render.wavefront import block_order_perm, render_rays

    sync = lambda x: float(np.asarray(x))
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    scene, _ = build_scene(1e6)
    res = 1024
    cam = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                 aspect=1.0)
    o, d = camera_rays(cam, res, res)
    perm = block_order_perm(res, res, 16)
    o = jax.device_put(o[perm])
    d = jax.device_put(d[perm])
    flat = scene.flatten(build_octree=False, cluster_size=128)
    cl2 = dict(flat.clusters)
    cl2.pop("sblock")
    flat_ng = flat.replace(clusters=cl2)
    print("bake done", flush=True)

    cfg = RenderConfig(width=res, height=res, max_reflections=0,
                       intersector=Intersector.PALLAS,
                       tile_pixels=res * res, quantize=Quantize.NONE)

    def chain(fn, n):
        @jax.jit
        def go(fl, oo, dd):
            def step(acc, _):
                eps = jax.lax.select(acc == jnp.float32(-1.234e-35),
                                    jnp.float32(1e-30), jnp.float32(0.0))
                return acc + fn(fl, oo + eps, dd), None

            acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return acc

        return go

    def frame(fl, oo, dd):
        return render_rays(fl, cfg, oo, dd)[0, 0]

    def near_rows(fl, oo, dd):
        h, rows = nearest_hit_fused(fl, oo, dd, tile_size=256, layout="t",
                                    plane=True, return_rows=True)
        return h.t[0] + rows[0, 0]

    def near(fl, oo, dd):
        h = nearest_hit_fused(fl, oo, dd, tile_size=256, layout="t",
                              plane=True)
        return h.t[0]

    variants = {}
    for n in (1, 4):
        variants[f"frame_rows_c{n}"] = (chain(frame, n), flat)
        variants[f"frame_gather_c{n}"] = (chain(frame, n), flat_ng)
        variants[f"near_rows_c{n}"] = (chain(near_rows, n), flat)
        variants[f"near_c{n}"] = (chain(near, n), flat)

    for name, (fn, fl) in variants.items():
        sync(fn(fl, o, d))
        print(f"compiled {name}", flush=True)

    times = {k: np.inf for k in variants}
    for r_i in range(10):
        for name, (fn, fl) in variants.items():
            t0 = time.perf_counter()
            sync(fn(fl, o, d))
            times[name] = min(times[name], time.perf_counter() - t0)
        print(f"round {r_i}: " + " ".join(
            f"{k}={v*1e3:.1f}" for k, v in times.items()), flush=True)
    print("FINAL: " + " ".join(
        f"{k}={v*1e3:.1f}ms" for k, v in times.items()), flush=True)
    for m in ("frame_rows", "frame_gather", "near_rows", "near"):
        per = (times[f"{m}_c4"] - times[f"{m}_c1"]) / 3.0
        print(f"device-true {m}: {per*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
