"""Round-4 lab #4: bisect the ~40 ns/ray zero-walk floor of the fused kernel.

Standalone mini-kernels over the same (ROWS, R) ray pack and grid as the
real kernel, adding one suspected cost bucket at a time:

  k0: read rays, write constant outputs          (grid + IO floor)
  k1: + lane-major prologue (finite/cap math)    (the cheap part)
  k2: + (TS,1) state inits and fin_c             (column-layout per-ray ops)
  k3: + epilogue relayouts (TS,1) -> (1,TS) outs (the suspected hot spot)
  k4: + entry grid + 2 picks                     (cull floor)

Usage: python tools/r4lab4.py [--res 1024] [--reps 3]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.r4lab import _sync, timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import build_scene
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import ROWS, _entry_grid, _tile_bounds_lm
    from raytpu.render.wavefront import block_order_perm

    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--tris", type=float, default=1e6)
    args = p.parse_args()

    scene, _ = build_scene(args.tris)
    flat = scene.flatten(build_octree=False, build_clusters=True)
    cl = flat.clusters
    aabb_tab = cl["aabb"]
    root_tab = cl["root"]
    nc = cl["block"].shape[0]
    nc8 = aabb_tab.shape[2]
    print(f"setup done nc={nc}", flush=True)

    ts = 256
    camera = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                    aspect=1.0)
    origin, direction = camera_rays(camera, args.res, args.res)
    perm = block_order_perm(args.res, args.res, 16)
    origin = np.asarray(origin)[perm]
    direction = np.asarray(direction)[perm]
    rr = origin.shape[0]
    f32, i32 = jnp.float32, jnp.int32
    INF = 3.4028235e38

    packed = jnp.asarray(np.concatenate(
        [origin.T, direction.T,
         np.full((1, rr), INF, np.float32),
         np.zeros((ROWS - 7, rr), np.float32)], axis=0))
    packed = jax.device_put(packed)
    nt = rr // ts

    def kern(root_ref, rays, aabb, out_t, out_code, out_res,
             bt_ref, bc_ref, rs_ref, ent, *, level):
        row = lambda r: rays[r:r + 1, :]
        oxr, oyr, ozr = row(0), row(1), row(2)
        dxr, dyr, dzr = row(3), row(4), row(5)
        tmax_in = row(6)
        if level >= 1:
            finite = (jnp.isfinite(oxr) & jnp.isfinite(oyr)
                      & jnp.isfinite(ozr) & jnp.isfinite(dxr)
                      & jnp.isfinite(dyr) & jnp.isfinite(dzr))
            margin = root_ref[0, 6]
            t_en = jnp.full((1, ts), -INF, f32)
            t_ex = jnp.full((1, ts), INF, f32)
            for k, dk, okr in ((0, dxr, oxr), (1, dyr, oyr), (2, dzr, ozr)):
                safe_d = jnp.where(dk == 0.0, f32(1e-30), dk)
                t1 = (root_ref[0, k] - margin - okr) / safe_d
                t2 = (root_ref[0, 3 + k] + margin - okr) / safe_d
                t_en = jnp.maximum(t_en, jnp.minimum(t1, t2))
                t_ex = jnp.minimum(t_ex, jnp.maximum(t1, t2))
            root_hit = (t_en <= t_ex) & (t_ex >= 0.0)
            cap = jnp.where(root_hit, t_ex * f32(1.0 + 1e-5) + margin,
                            f32(0.0))
            cap = jnp.where(jnp.isfinite(cap), cap, f32(0.0))
            tmax_lm = jnp.minimum(tmax_in, cap)
        if level >= 2:
            tmax0 = tmax_lm.reshape(ts, 1)
            col = lambda r: rays[r, :].reshape(ts, 1)
            ox, oy, oz = col(0), col(1), col(2)
            dx, dy, dz = col(3), col(4), col(5)
            fin_c = (jnp.isfinite(ox) & jnp.isfinite(oy) & jnp.isfinite(oz)
                     & jnp.isfinite(dx) & jnp.isfinite(dy) & jnp.isfinite(dz))
            bt_ref[:, :] = tmax0
            bc_ref[:, :] = jnp.full((ts, 1), -1, i32)
            rs_ref[:, :] = (~fin_c | ~(tmax0 > 0.0)).astype(f32)
        if level >= 4:
            row_io = jax.lax.broadcasted_iota(i32, (8, nc8), 0)
            col_io = jax.lax.broadcasted_iota(i32, (8, nc8), 1)
            flat_io = row_io * nc8 + col_io
            valid_col = flat_io < nc
            tile_tmax = jnp.max(tmax_lm)
            ent[:, :] = _entry_grid(
                aabb, valid_col,
                _tile_bounds_lm(finite, (oxr, oyr, ozr), (dxr, dyr, dzr)),
                tile_tmax)
            for _ in range(2):
                e = ent[:, :]
                v = jnp.min(e)
                k = jnp.min(jnp.where(e == v, flat_io, i32(nc)))
                # consume v so the pick is not dead code
                ent[:, :] = jnp.where(flat_io == k, INF, e + 0.0 * v)
        if level >= 3:
            out_t[0, 0, :] = bt_ref[:, :][:, 0]
            out_code[0, 0, :] = bc_ref[:, :][:, 0]
            out_res[0, 0, :] = (rs_ref[:, :] > 0.0).astype(i32)[:, 0]
        else:
            out_t[0, 0, :] = jnp.zeros((1, ts), f32)[0, :]
            out_code[0, 0, :] = jnp.zeros((1, ts), i32)[0, :]
            out_res[0, 0, :] = jnp.zeros((1, ts), i32)[0, :]

    def run(level):
        outs = pl.pallas_call(
            functools.partial(kern, level=level),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((ROWS, ts), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, 8, nc8), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nt, 1, ts), f32),
                jax.ShapeDtypeStruct((nt, 1, ts), i32),
                jax.ShapeDtypeStruct((nt, 1, ts), i32),
            ],
            scratch_shapes=[
                pltpu.VMEM((ts, 1), f32),
                pltpu.VMEM((ts, 1), i32),
                pltpu.VMEM((ts, 1), f32),
                pltpu.VMEM((8, nc8), f32),
            ],
        )(root_tab, packed, aabb_tab)
        return outs

    for level in (0, 1, 2, 3, 4):
        fn = jax.jit(functools.partial(run, level))
        timed(fn, (), args.reps, f"k{level}")


if __name__ == "__main__":
    main()
