"""Round-5 lab 14: RPC-free production-query timing (scan-chained x8).

Times the REAL nearest_hit_fused paths (tlane+plane nearest, row any_hit
reversed shadow) as (chain8 - chain1)/7 device slopes.  Run twice — once
on the keyed-pick working tree, once on the stashed baseline — to A/B
the pick change without cross-process RPC noise.
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
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import nearest_hit_fused
    from raytpu.render.wavefront import block_order_perm

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

    h = nearest_hit_fused(flat, o, d, tile_size=256, layout="t",
                          plane=True)
    hnp = np.asarray(h.hit)
    t_np = np.where(hnp, np.asarray(h.t), 0.0)
    print(f"hits={hnp.mean():.3f} tsum={t_np.sum():.1f}", flush=True)
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

    def chain(fn, n):
        @jax.jit
        def go(*args):
            def step(acc, _):
                out = fn(args[0] + acc * 0.0, *args[1:])
                return acc + out.t[0], None

            acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return acc

        return go

    near = functools.partial(nearest_hit_fused, flat, tile_size=256,
                             layout="t", plane=True)
    shad = functools.partial(
        lambda oo, dd: nearest_hit_fused(
            flat, oo, dd, ignore_tri=itri, t_max=st, any_hit=True,
            cull="reverse", tile_size=256))

    variants = {}
    for n in (1, 8):
        variants[f"near_c{n}"] = (chain(lambda oo: near(oo, d), n), (o,))
        variants[f"shad_c{n}"] = (chain(lambda oo: shad(oo, sd), n), (so,))

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
    for q in ("near", "shad"):
        per = (times[f"{q}_c8"] - times[f"{q}_c1"]) / 7.0
        print(f"device-true {q}: {per*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
