"""Round-5 lab 15: whole-frame device decomposition + chain linearity.

Lab 14's device-true slopes say the two intersection queries are only
~29 ms of a ~117 ms device frame — the frame's majority would then be
shading/wavefront/pack overhead, not the walks.  Verify:

1. Chain linearity: near at chain 1/2/4/8 (slopes must agree; rules out
   XLA CSE/hoisting of the chained calls).  The chain dependency uses a
   runtime select, which the algebraic simplifier cannot fold away.
2. Whole-frame chain: render_rays(cfg) c1/c8 => device frame slope.
3. Query slopes in the same process => frame - near - shad = residual
   (pack + shading + light sum + combine).
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np

INF = 3.4028235e38


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
    light_pos = np.asarray([0.0, 30.0, 25.0], np.float32)
    flat = scene.flatten(build_octree=False, cluster_size=128)
    print("bake done", flush=True)

    cfg = RenderConfig(width=res, height=res, max_reflections=0,
                       intersector=Intersector.PALLAS,
                       tile_pixels=res * res, quantize=Quantize.NONE)

    h = nearest_hit_fused(flat, o, d, tile_size=256, layout="t",
                          plane=True)
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

    def chain(fn, n, out_scalar):
        # All big arrays ride as explicit jit args (closure-captured
        # device arrays become embedded HLO constants and blow the
        # tunnel's remote-compile size limit).
        @jax.jit
        def go(fl, *args):
            def step(acc, _):
                # Runtime-select perturbation: never true, never foldable.
                eps = jax.lax.select(acc == jnp.float32(-1.234e-35),
                                    jnp.float32(1e-30), jnp.float32(0.0))
                out = fn(fl, args[0] + eps, *args[1:])
                return acc + out_scalar(out), None

            acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return acc

        return go

    def near(fl, oo, dd):
        return nearest_hit_fused(fl, oo, dd, tile_size=256,
                                 layout="t", plane=True)

    def shad(fl, oo, dd, it, tm):
        return nearest_hit_fused(fl, oo, dd, ignore_tri=it, t_max=tm,
                                 any_hit=True, cull="reverse",
                                 tile_size=256)

    def frame(fl, oo, dd):
        return render_rays(fl, cfg, oo, dd)

    variants = {}
    for n in (1, 2, 4, 8):
        variants[f"near_c{n}"] = (
            chain(near, n, lambda h: h.t[0]), (flat, o, d))
    for n in (1, 8):
        variants[f"shad_c{n}"] = (
            chain(shad, n, lambda h: h.t[0]), (flat, so, sd, itri, st))
        variants[f"frame_c{n}"] = (
            chain(frame, n, lambda img: img[0, 0]), (flat, o, d))

    for name, (fn, args) in variants.items():
        sync(fn(*args))
        print(f"compiled {name}", flush=True)

    times = {k: np.inf for k in variants}
    for r_i in range(10):
        for name, (fn, args) in variants.items():
            t0 = time.perf_counter()
            sync(fn(*args))
            times[name] = min(times[name], time.perf_counter() - t0)
        print(f"round {r_i}: " + " ".join(
            f"{k}={v*1e3:.1f}" for k, v in times.items()), flush=True)
    print("FINAL: " + " ".join(
        f"{k}={v*1e3:.1f}ms" for k, v in times.items()), flush=True)
    nr = times
    print(f"near slopes: c2-c1={(nr['near_c2']-nr['near_c1'])*1e3:.2f} "
          f"(c4-c2)/2={(nr['near_c4']-nr['near_c2'])/2*1e3:.2f} "
          f"(c8-c4)/4={(nr['near_c8']-nr['near_c4'])/4*1e3:.2f}",
          flush=True)
    for q in ("shad", "frame"):
        per = (times[f"{q}_c8"] - times[f"{q}_c1"]) / 7.0
        print(f"device-true {q}: {per*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
