"""Round-5 lab 2: isolate the pl.when gate cost in the tlane walk.

r5lab1 found the gated tlane kernel ~2.7x SLOWER on nearest queries than
the r4 ungated tlane (187 ms vs 69 ms cross-process) while the unchanged
row kernel ran fine — prime suspect: the per-trip/per-sibling pl.when
branches (r4 already measured a branch around the uvt update costing more
than it saved).  Same-process A/B: gate on/off x plane x csize on the
bench workload's primary-nearest and reversed-shadow queries.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def sync(x):
    return float(np.asarray(x).sum())


def timeit(fn, reps=3):
    fn()
    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import nearest_hit_fused
    from raytpu.render.wavefront import block_order_perm

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
        t0 = time.perf_counter()
        flats[cs] = scene.flatten(build_octree=False, cluster_size=cs)
        print(f"bake cs={cs}: {time.perf_counter()-t0:.0f}s", flush=True)

    def nearest(cs, gate, plane):
        flat = flats[cs]
        q = jax.jit(lambda oo, dd: nearest_hit_fused(
            flat, oo, dd, tile_size=256, layout="t", plane=plane,
            gate=gate, interpret=False).t)
        dt = timeit(lambda: q(o, d))
        print(f"  nearest cs={cs} gate={int(gate)} plane={int(plane)}: "
              f"{dt*1e3:7.1f} ms", flush=True)
        return dt

    # r4-equivalent baseline first: cs128 ungated, no plane.
    nearest(128, False, False)
    nearest(128, True, False)
    nearest(128, False, True)
    for cs in (64, 32):
        for gate in (False, True):
            for plane in (False, True):
                nearest(cs, gate, plane)

    # Shadow (reversed, shared origin at the light) off the cs128 hits.
    flat = flats[128]
    h = nearest_hit_fused(flat, o, d, tile_size=256, layout="t",
                          plane=False, gate=False, interpret=False)
    hnp = np.asarray(h.hit)
    frag = np.asarray(o) + np.asarray(h.t)[:, None] * np.asarray(d)
    vec = frag - light_pos
    dist = np.linalg.norm(vec, axis=-1)
    sdir = np.where(hnp[:, None], vec / np.maximum(dist[:, None], 1e-20),
                    np.nan).astype(np.float32)
    dist = np.where(hnp, dist, 0.0).astype(np.float32)
    so = jax.device_put(np.broadcast_to(light_pos, frag.shape).copy())
    sd = jax.device_put(sdir)
    st = jax.device_put(dist)
    itri = jax.device_put(np.asarray(h.tri, np.int32))

    def shadow(cs, layout, gate, plane):
        flat = flats[cs]
        q = jax.jit(lambda: nearest_hit_fused(
            flat, so, sd, ignore_tri=itri, tile_size=256, t_max=st,
            any_hit=True, cull="reverse", layout=layout, plane=plane,
            gate=gate, interpret=False).hit)
        dt = timeit(q)
        print(f"  shadow cs={cs} {layout} gate={int(gate)} "
              f"plane={int(plane)}: {dt*1e3:7.1f} ms", flush=True)

    shadow(128, "row", True, False)   # r4 default shadow path
    shadow(128, "t", False, False)
    shadow(128, "t", False, True)
    for cs in (64, 32):
        for gate in (False, True):
            shadow(cs, "t", gate, True)
        shadow(cs, "t", False, False)


if __name__ == "__main__":
    main()
