"""Round-5 lab 10: serial-overhead hypothesis — bigger clusters + cost split.

Lab 9 found the walk is bound by SERIAL per-trip/per-pick overhead
(full == nomt == nodma at matched trips; cost scales with picks at
~1.6us/pick + ~4.4us/iter on that process), NOT by VPU compute or DMA.
If true, the r5 subcluster direction (smaller leaves, tighter culling)
was backwards: BIGGER clusters buy fewer picks/trips and the extra
(C, TS) VPU work rides free.

1. Production nearest + shadow queries at cluster_size {128, 256, 512}
   (tlane + fitted plane; plane rows are per-block at subk == 1).
2. Stripped-kernel modes 'empty' (no pick, no dma, no test: pure loop)
   and 'nopick' (sequential prefilled ids: dma + test, no argmin) to
   split the ~4.4us/iter term.
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
    for cs in (128, 256, 512):
        flats[cs] = scene.flatten(build_octree=False, cluster_size=cs)
        print(f"bake cs={cs} done", flush=True)

    # Shadow-query inputs from the cs128 primary result (fixed across
    # variants; the reversed-from-light form wavefront uses).
    h = nearest_hit_fused(flats[128], o, d, tile_size=256, layout="t",
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
    print("shadow inputs ready", flush=True)

    variants = {}

    def addq(name, cs, shadow=False, **kw):
        flat = flats[cs]
        if shadow:
            fn = jax.jit(functools.partial(
                nearest_hit_fused, any_hit=True, cull="reverse",
                interpret=False, **kw))

            def run(fn=fn, flat=flat):
                return fn(flat, so, sd, ignore_tri=itri, t_max=st).t
        else:
            fn = jax.jit(functools.partial(
                nearest_hit_fused, interpret=False, **kw))

            def run(fn=fn, flat=flat):
                return fn(flat, o, d).t

        variants[name] = run

    for cs in (128, 256, 512):
        addq(f"near_cs{cs}", cs, tile_size=256, layout="t", plane=True)
        addq(f"shad_cs{cs}", cs, shadow=True, tile_size=256)
    addq("near_cs256_ts512", 256, tile_size=512, layout="t", plane=True)
    addq("near_cs512_ts512", 512, tile_size=512, layout="t", plane=True)
    addq("shad_cs256_ts512", 256, shadow=True, tile_size=512)

    for name, fn in variants.items():
        sync(fn())
        print(f"compiled {name}", flush=True)

    times = {k: np.inf for k in variants}
    for r_i in range(8):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            sync(fn())
            times[name] = min(times[name], time.perf_counter() - t0)
        print(f"round {r_i}: " + " ".join(
            f"{k}={v*1e3:.1f}" for k, v in times.items()), flush=True)
    print("FINAL: " + " ".join(
        f"{k}={v*1e3:.1f}ms" for k, v in times.items()), flush=True)


if __name__ == "__main__":
    main()
