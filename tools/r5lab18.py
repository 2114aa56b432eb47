"""Round-5 lab 18: post-rows knob sweep (chained, RPC-free).

With the in-kernel row resolve the device frame is ~all walk: near 36.8
+ shad 29.6 + resolve 8.5 + ~2.6 residual.  Re-sweep the knobs whose
tradeoffs the resolve changed: ts=512 halves the per-tile fixed costs
(prologue + resolve pick chain) at ~1.1x total trips; ngrp=3 deepens the
walk ring; kc=2 re-test with cheap keyed picks.
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
    print("bake done", flush=True)

    def chain(cfg, n):
        @jax.jit
        def go(fl, oo, dd):
            def step(acc, _):
                eps = jax.lax.select(acc == jnp.float32(-1.234e-35),
                                    jnp.float32(1e-30), jnp.float32(0.0))
                return acc + render_rays(fl, cfg, oo + eps, dd)[0, 0], None

            acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return acc

        return go

    def mkcfg(**kw):
        return RenderConfig(width=res, height=res, max_reflections=0,
                            intersector=Intersector.PALLAS,
                            tile_pixels=res * res, quantize=Quantize.NONE,
                            **kw)

    variants = {}
    for n in (1, 4):
        variants[f"base_c{n}"] = chain(mkcfg(), n)
        variants[f"ts512_c{n}"] = chain(mkcfg(cull_tile=512), n)
        variants[f"kc2_c{n}"] = chain(mkcfg(cull_chunk=2), n)

    for name, fn in variants.items():
        sync(fn(flat, o, d))
        print(f"compiled {name}", flush=True)

    times = {k: np.inf for k in variants}
    for r_i in range(10):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            sync(fn(flat, o, d))
            times[name] = min(times[name], time.perf_counter() - t0)
        print(f"round {r_i}: " + " ".join(
            f"{k}={v*1e3:.1f}" for k, v in times.items()), flush=True)
    print("FINAL: " + " ".join(
        f"{k}={v*1e3:.1f}ms" for k, v in times.items()), flush=True)
    for m in ("base", "ts512", "kc2"):
        per = (times[f"{m}_c4"] - times[f"{m}_c1"]) / 3.0
        print(f"device-true frame {m}: {per*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
