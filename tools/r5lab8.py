"""Round-5 lab 8: VPU dtype roofline + tlane-era knob re-sweep.

Three questions, one process, matched-round protocol (compile all, then
interleaved timed rounds, per-variant MIN — tools/r5lab3 discipline):

1. **VPU elementwise throughput, f32 vs bf16** — is packed bf16 a real
   2x ALU lever on this v5e, or do bf16 elementwise ops run at the f32
   rate?  Decides whether the "2x-packed bf16 pair math with exact
   refinement" redesign (docs/PERF.md r5 close-out) has any ceiling to
   offer before we invest in it.
2. **tlane tile-size sweep** — ts was pinned at 256 by a ROW-kernel-era
   sweep (r3); the transposed layout moved all per-ray state to
   lane-major (1, TS) vregs, which changes the ts tradeoff (smaller
   tiles = tighter beams = fewer feasible clusters, and the per-ray
   state cost no longer scales with TS/8 sublanes).  Also chunk_k.
3. **Winner-extraction cost** — nearest walk with uvt=False (same walk,
   no one-hot sums) vs the production uvt=True: how much of a trip is
   the 4-quantity extraction today?
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def vpu_microbench():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sync = lambda x: float(np.asarray(x).sum())

    def make(dtype, k, shape, grid=64):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            a = x * 0.5 + 0.25
            for _ in range(k):
                a = a * x + x
            o_ref[:] = a

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=[pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(shape, dtype),
            )(x)

        x = jnp.full(shape, 1.0000001, dtype)
        return run, x

    grid = 64
    res = {}
    for name, dtype, shape in (
        ("f32", jnp.float32, (256, 256)),
        ("bf16", jnp.bfloat16, (256, 256)),
        ("bf16_big", jnp.bfloat16, (512, 256)),
    ):
        runs = {}
        for k in (64, 256):
            fn, x = make(dtype, k, shape, grid)
            sync(fn(x))  # compile
            runs[k] = (fn, x)
        times = {k: np.inf for k in runs}
        for _ in range(12):
            for k, (fn, x) in runs.items():
                t0 = time.perf_counter()
                sync(fn(x))
                times[k] = min(times[k], time.perf_counter() - t0)
        # Per-op cost from the k-delta (subtracts launch + load/store).
        dk = 256 - 64
        dt = times[256] - times[64]
        elems = shape[0] * shape[1] * grid
        ops_per_s = dk * elems / dt
        res[name] = ops_per_s
        print(f"vpu {name:9s} shape={shape} t64={times[64]*1e3:.3f}ms "
              f"t256={times[256]*1e3:.3f}ms "
              f"-> {ops_per_s/1e9:.1f} G fma/s", flush=True)
    print(f"bf16/f32 ratio: {res['bf16']/res['f32']:.2f} "
          f"(big: {res['bf16_big']/res['f32']:.2f})", flush=True)


def walk_sweep():
    import jax

    from bench import build_scene
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import _pack_rays, fused_tiles, nearest_hit_fused
    from raytpu.render.wavefront import block_order_perm

    sync = lambda x: float(np.asarray(x).sum())
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

    variants = {}

    def add(name, **kw):
        kw.setdefault("layout", "t")
        kw.setdefault("plane", True)
        fn = jax.jit(functools.partial(
            nearest_hit_fused, interpret=False, **kw))

        def run(fn=fn):
            h = fn(flat, o, d)
            return h.t

        variants[name] = run

    for ts in (128, 256, 512):
        add(f"near_ts{ts}", tile_size=ts)
    for kc in (2, 4):
        add(f"near_kc{kc}", tile_size=256, chunk_k=kc)
    add("near_ts128_kc2", tile_size=128, chunk_k=2)

    # uvt off: same walk, no winner extraction (direct fused_tiles call).
    cl = flat.clusters

    def nouvt(ts=256):
        import jax.numpy as jnp
        f32, i32 = jnp.float32, jnp.int32
        r = o.shape[0]
        nt = r // ts
        packed = _pack_rays(o.astype(f32), d.astype(f32),
                            jnp.full((r,), -1, i32),
                            jnp.full((r,), -1, i32),
                            jnp.full((r,), 3.4e38, f32), nt, ts)
        t, code, _, _, _, _ = fused_tiles(
            packed, cl["aabb"], cl["root"], cl["tblock"],
            saabb=cl.get("sub_aabb"), splane=cl.get("sub_plane"),
            ts=ts, cull=True, any_hit=False, has_ignore=False,
            uvt=False, layout="t", plane=True, gate=False)
        return t

    variants["near_nouvt"] = jax.jit(nouvt)

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
    import jax

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    if "sweep" in sys.argv:
        walk_sweep()
    else:
        vpu_microbench()
        walk_sweep()
