"""Round-5 lab 5: decompose the frame gap + re-test binary clearance.

r5lab4: frame (primary+shadow+shading) = 439 ms while its isolated
queries sum to ~233 ms — ~200 ms unexplained.  Same-process phases:

  1. primary query raw (reference)
  2. frame, no lights (primary + shading only)
  3. frame, full, clearance off
  4. frame, full, clearance on (BINARY t_min after the r5lab4 fix)
  5. frame, full, shadow_from_light off (unreversed control)
  6. shading-gather microbench: one (1M, 32) row gather + combine
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
    import copy

    scene_nolight = copy.copy(scene)
    scene_nolight = type(scene)(objects=scene.objects, lights=[])
    res = 1024
    cam = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                 aspect=1.0)
    o, d = camera_rays(cam, res, res)
    perm = block_order_perm(res, res, 16)
    o = jax.device_put(o[perm])
    d = jax.device_put(d[perm])

    flat = scene.flatten(build_octree=False, cluster_size=128)
    try:
        flat_nl = scene_nolight.flatten(build_octree=False,
                                        cluster_size=128)
    except Exception as e:
        flat_nl = None
        print(f"no-light flatten failed: {e}", flush=True)
    print("bakes done", flush=True)

    def cfgf(**kw):
        kw.setdefault("width", res)
        kw.setdefault("height", res)
        kw.setdefault("max_reflections", 0)
        kw.setdefault("intersector", Intersector.PALLAS)
        kw.setdefault("tile_pixels", res * res)
        kw.setdefault("quantize", Quantize.NONE)
        return RenderConfig(**kw)

    variants = {}

    qfn = jax.jit(lambda oo, dd: nearest_hit_fused(
        flat, oo, dd, tile_size=256, layout="t", plane=True,
        gate=False, interpret=False).t)
    variants["primary query"] = lambda: sync(qfn(o, d))

    if flat_nl is not None:
        cfg_nl = cfgf()
        fn_nl = jax.jit(lambda s, oo, dd: render_rays(s, cfg_nl, oo, dd))
        variants["frame no-light"] = lambda: sync(fn_nl(flat_nl, o, d))

    for name, kw in (
        ("frame clear=0", dict(shadow_clearance=False)),
        ("frame clear=1", dict(shadow_clearance=True)),
        ("frame unrev", dict(shadow_clearance=False,
                             shadow_from_light=False)),
    ):
        cfg = cfgf(**kw)
        fn = jax.jit(lambda s, oo, dd, cfg=cfg: render_rays(s, cfg, oo, dd))
        variants[name] = lambda fn=fn: sync(fn(flat, o, d))

    ids = jax.device_put(
        np.random.default_rng(0).integers(
            0, flat.tri_shade.shape[0], size=res * res).astype(np.int32))
    gfn = jax.jit(lambda t, i: t[i].sum(axis=-1))
    variants["row gather 1M"] = lambda: sync(gfn(flat.tri_shade, ids))

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
        print(f"  {name:16s}: min {ts[0]*1e3:7.1f}  med "
              f"{ts[len(ts)//2]*1e3:7.1f}   all {ms}")


if __name__ == "__main__":
    main()
