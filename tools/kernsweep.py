"""Kernel config sweep: time fused_tiles variants on the bench workload.

Packs the bench scene's primary-ray tiles once, then times the fused kernel
under a grid of static configs (mxu on/off, matmul precision, pretest,
recull cadence, tile size) with honest device-to-host sync.  Prints one
line per config; use this to pick RenderConfig defaults.

Usage: python tools/kernsweep.py [--tris 1e6] [--res 1024] [--reps 3]
       [--configs name1,name2,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

UVT = False

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = {
    # name: (mxu, precision, pretest, recull, ts, max_trips)
    "vpu": (False, None, False, 0, 256, 0),
    "vpu-re6": (False, None, False, 6, 256, 0),
    "vpu-pre": (False, None, True, 0, 256, 0),
    "vpu-pre-re6": (False, None, True, 6, 256, 0),
    "mxu-hi": (True, "highest", False, 0, 256, 0),
    "mxu-def": (True, "default", False, 0, 256, 0),
    "vpu-ts128": (False, None, False, 0, 128, 0),
    "vpu-ts512": (False, None, False, 0, 512, 0),
    "vpu-ts512-pre": (False, None, True, 0, 512, 0),
    # Budgeted walks: what fraction of rays is individually resolved
    # after B trips?  (Sizes the two-phase compaction driver.)
    "vpu-b4": (False, None, False, 0, 256, 4),
    "vpu-b8": (False, None, False, 0, 256, 8),
    "vpu-pre-b6": (False, None, True, 0, 256, 6),
}

# (mxu, precision, pretest, recull, ts, max_trips, ngrp, kc)
CONFIGS = {k: v + (4, 1) for k, v in CONFIGS.items()}
CONFIGS.update({
    "vpu-g2": (False, None, False, 0, 256, 0, 2, 1),
    "vpu-ts512g2": (False, None, False, 0, 512, 0, 2, 1),
    "vpu-g2k2": (False, None, False, 0, 256, 0, 2, 2),
    "vpu-g2k4": (False, None, False, 0, 256, 0, 2, 4),
    "vpu-ts128g2k2": (False, None, False, 0, 128, 0, 2, 2),
})
# r4 layouts: the transposed (C, TS) tlane kernel (tools/r4lab7 has the
# fuller comparison incl. shadow queries and frames).
CONFIGS = {k: v + ("row",) for k, v in CONFIGS.items()}
CONFIGS.update({
    "tlane-g2": (False, None, False, 0, 256, 0, 2, 1, "t"),
    "tlane-ts128": (False, None, False, 0, 128, 0, 2, 1, "t"),
})


def pack(origin, direction, ts):
    import jax
    import jax.numpy as jnp

    from raytpu.kernels.fused import ROWS

    f32, i32 = jnp.float32, jnp.int32
    rr = origin.shape[0]
    bits = lambda a: jax.lax.bitcast_convert_type(a, f32)
    packed = jnp.stack(
        [origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         jnp.full((rr,), 3.4028235e38, f32),
         bits(jnp.full((rr,), -1, i32)),
         bits(jnp.full((rr,), -1, i32))]
        + [jnp.zeros((rr,), f32)] * (ROWS - 9),
        axis=0,
    )  # (ROWS, R) — the kernel layout, tiles are column slices
    return jax.device_put(packed)


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401

    from bench import build_scene
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels import fused as fused_mod
    from raytpu.render.wavefront import block_order_perm

    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=float, default=1e6)
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--csize", type=int, default=128)
    p.add_argument("--uvt", action="store_true",
                   help="in-kernel winner (u, v, id) extraction on")
    p.add_argument("--configs", type=str, default=",".join(CONFIGS))
    args = p.parse_args()
    global UVT
    UVT = args.uvt

    names = args.configs.split(",")
    need_gblock = any(CONFIGS[n][0] for n in names)
    t0 = time.perf_counter()
    scene, true_tris = build_scene(args.tris)
    flat = scene.flatten(build_octree=False, build_clusters=True,
                         build_gblock=need_gblock, cluster_size=args.csize)
    cl = flat.clusters
    print(f"setup {time.perf_counter() - t0:.1f}s tris={true_tris} "
          f"clusters={cl['cluster_min'].shape[0]}", flush=True)

    camera = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                    aspect=1.0)
    origin, direction = camera_rays(camera, args.res, args.res)
    rr = origin.shape[0]

    packs = {}
    ref_bt = None
    for name in names:
        (mxu, prec, pretest, recull, ts, max_trips, ngrp, kc,
         layout) = CONFIGS[name]
        if ts not in packs:
            perm = block_order_perm(args.res, args.res, int(ts ** 0.5))
            packs[ts] = pack(jax.device_put(origin[perm]),
                             jax.device_put(direction[perm]), ts)
        packed = packs[ts]
        fn = jax.jit(lambda p_, a, ro, b, mxu=mxu, prec=prec,
                     pretest=pretest, recull=recull, mt=max_trips,
                     ng=ngrp, ts=ts, kc=kc, lay=layout: fused_mod.fused_tiles(
                         p_, a, ro, b, ts=ts, has_ignore=False, mxu=mxu,
                         mxu_precision=prec or "highest",
                         pretest=pretest, recull_every=recull,
                         max_trips=mt, ngrp=ng, chunk_k=kc, uvt=UVT,
                         layout=lay))
        block = cl["gblock" if mxu else
                   ("tblock" if layout == "t" else "block")]
        t0 = time.perf_counter()
        bt, code, uvt, res, iters = fn(packed, cl["aabb"], cl["root"], block)
        float(np.asarray(bt.sum()))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            bt, code, uvt, res, iters = fn(packed, cl["aabb"], cl["root"],
                                           block)
            float(np.asarray(bt.sum()))
            times.append(time.perf_counter() - t0)
        best = min(times)
        it = np.asarray(iters)
        hits = float((np.asarray(code) >= 0).mean())
        tot_trips = int(it.sum())
        resolved_frac = float(np.asarray(res).mean())
        print(f"{name:12s} compile={compile_s:6.1f}s best={best * 1e3:8.2f}ms"
              f" rays/s={rr / best / 1e6:6.1f}M trips(mean/p95/max)="
              f"{it.mean():.1f}/{np.percentile(it, 95):.0f}/{it.max()}"
              f" sum={tot_trips} us/trip={best * 1e6 / max(tot_trips, 1):.2f}"
              f" hit={hits:.3f} resolved={resolved_frac:.3f}", flush=True)
        if max_trips:
            continue  # budgeted results are partial; skip the ref compare
        if ref_bt is None:
            ref_bt = (np.asarray(bt), np.asarray(code), CONFIGS[name][4])
        elif CONFIGS[name][4] == ref_bt[2]:
            # Same tile size → same ray order: results must agree (up to
            # MXU rounding flipping edge-grazing winners).
            mism = float((np.asarray(code) != ref_bt[1]).mean())
            dt = np.abs(np.asarray(bt) - ref_bt[0])
            print(f"             vs ref: code mismatch={mism * 100:.4f}% "
                  f"max|dt|={dt.max():.2e}", flush=True)


if __name__ == "__main__":
    main()
