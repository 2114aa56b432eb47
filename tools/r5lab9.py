"""Round-5 lab 9: walk-time decomposition — DMA vs compute vs overhead.

A stripped copy of the tlane walk (no uvt/plane/subk/gate/ignore) with a
fixed trip budget (max_trips, no settle-dependent early exit variance
across modes) and three modes:

- full:  DMA + Möller–Trumbore + strict-min update (the real walk)
- nomt:  DMA + waits + picks, but the MT pass replaced by a 2-op touch
         of the buffer (measures the DMA/pick/loop floor)
- nodma: picks + MT on a stale buffer, no DMA start/wait (measures the
         compute ceiling with zero memory traffic)

All modes run the identical pick/entry-grid/loop structure and the same
trip count (trips = min(feasible, MAXT) per tile — settle is disabled),
so mode deltas isolate exactly one term.  Matched-round protocol.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np

INF = 3.4028235e38
MAXT = 6


def make_kernel(mode: str, ngrp: int, kc: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from raytpu.core.intersect import det_space_accept

    def kern(root_ref, rays, aabb, block_hbm, out_t, out_it,
             ent, bt_ref, qk, qv, buf, sem):
        from raytpu.kernels.fused import _finite_and_cap_lm, _tile_bounds_lm, _entry_grid

        ts = rays.shape[1]
        c = buf.shape[2]
        f32, i32 = jnp.float32, jnp.int32
        nc8 = aabb.shape[2]
        nc = nc8 * 8

        row = lambda r: rays[r:r + 1, :]
        oxr, oyr, ozr = row(0), row(1), row(2)
        dxr, dyr, dzr = row(3), row(4), row(5)
        tmax_in = row(6)
        finite, tmax0 = _finite_and_cap_lm(
            root_ref, (oxr, oyr, ozr), (dxr, dyr, dzr), tmax_in)
        tile_tmax = jnp.max(tmax0)

        row_io = jax.lax.broadcasted_iota(i32, (8, nc8), 0)
        col_io = jax.lax.broadcasted_iota(i32, (8, nc8), 1)
        flat_io = row_io * nc8 + col_io
        valid_col = flat_io < nc

        ent[:, :] = _entry_grid(
            aabb, valid_col,
            _tile_bounds_lm(finite, (oxr, oyr, ozr), (dxr, dyr, dzr)),
            tile_tmax)

        def pick():
            e = ent[:, :]
            v = jnp.min(e)
            k = jnp.min(jnp.where(e == v, flat_io, i32(nc)))
            ent[:, :] = jnp.where(flat_io == k, INF, e)
            return v, k

        def pick_group(grp):
            for j in range(kc):
                v_j, k_j = pick()
                k_safe = jnp.minimum(k_j, i32(nc - 1))
                qk[grp * kc + j] = k_safe
                qv[grp * kc + j] = v_j
                if mode != "nodma":
                    pltpu.make_async_copy(
                        block_hbm.at[k_safe], buf.at[grp * kc + j],
                        sem.at[grp * kc + j]).start()

        for g in range(ngrp):
            pick_group(g)

        wx = dyr * ozr - dzr * oyr
        wy = dzr * oxr - dxr * ozr
        wz = dxr * oyr - dyr * oxr
        bt_ref[:, :] = tmax0

        def body(state):
            i, cur_v = state
            grp = jax.lax.rem(i, ngrp)
            if mode != "nodma":
                for j in range(kc):
                    pltpu.make_async_copy(
                        block_hbm.at[qk[grp * kc + j]],
                        buf.at[grp * kc + j],
                        sem.at[grp * kc + j]).wait()
            for j in range(kc):
                gt = jnp.transpose(buf[grp * kc + j])  # (C, 32)
                if mode == "nomt":
                    bt_ref[:, :] = jnp.minimum(
                        bt_ref[:, :],
                        jnp.max(gt[:, 0:1]) * 0.0 + tmax0)
                else:
                    col = lambda q: gt[:, q:q + 1]
                    nx, ny, nz = col(0), col(1), col(2)
                    det = dxr * nx + dyr * ny + dzr * nz
                    udet = (wx * col(6) + wy * col(7) + wz * col(8)
                            + dxr * col(3) + dyr * col(4) + dzr * col(5))
                    vdet = (wx * col(12) + wy * col(13) + wz * col(14)
                            + dxr * col(9) + dyr * col(10) + dzr * col(11))
                    tdet = col(15) - (oxr * nx + oyr * ny + ozr * nz)
                    ok = det_space_accept(det, udet, vdet, tdet, True)
                    dist = jnp.where(ok, tdet / det, INF)
                    mint = jnp.min(dist, axis=0, keepdims=True)
                    bt_ref[:, :] = jnp.minimum(bt_ref[:, :], mint)

            nxt = jax.lax.rem(i + 1, ngrp)
            v_next = qv[nxt * kc]
            pick_group(grp)
            return i + 1, v_next

        def cond(state):
            return (state[1] < INF) & (state[0] < MAXT)

        iters, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), qv[0]))
        if mode != "nodma":
            for slot in range(ngrp * kc):
                pltpu.make_async_copy(block_hbm.at[qk[slot]],
                                      buf.at[slot], sem.at[slot]).wait()
        out_t[0, 0, :] = bt_ref[:, :][0, :]
        out_it[0, 0, 0] = iters

    return kern


def run_variant(flat, packed, mode, ngrp=2, kc=1, ts=256):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cl = flat.clusters
    aabb, root, block = cl["aabb"], cl["root"], cl["tblock"]
    nt = packed.shape[1] // ts
    nc8 = aabb.shape[2]
    csize = block.shape[2]
    f32, i32 = jnp.float32, jnp.int32
    kern = make_kernel(mode, ngrp, kc)

    @jax.jit
    def go(packed, aabb, root, block):
        return pl.pallas_call(
            kern,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((16, ts), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, 8, nc8), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nt, 1, ts), f32),
                jax.ShapeDtypeStruct((nt, 1, 1), i32),
            ],
            scratch_shapes=[
                pltpu.VMEM((8, nc8), f32),
                pltpu.VMEM((1, ts), f32),
                pltpu.SMEM((ngrp * kc,), i32),
                pltpu.SMEM((ngrp * kc,), f32),
                pltpu.VMEM((ngrp * kc, 32, csize), f32),
                pltpu.SemaphoreType.DMA((ngrp * kc,)),
            ],
        )(root, packed, aabb, block)

    return go


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import _pack_rays
    from raytpu.render.wavefront import block_order_perm

    sync = lambda x: float(np.asarray(x).sum())
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    scene, _ = build_scene(1e6)
    res = 1024
    cam = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                 aspect=1.0)
    o, d = camera_rays(cam, res, res)
    perm = block_order_perm(res, res, 16)
    o = jnp.asarray(o[perm])
    d = jnp.asarray(d[perm])
    flat = scene.flatten(build_octree=False, cluster_size=128)
    print("bake done", flush=True)

    ts = 256
    r = o.shape[0]
    f32, i32 = jnp.float32, jnp.int32
    packed = jax.device_put(np.asarray(_pack_rays(
        o.astype(f32), d.astype(f32), jnp.full((r,), -1, i32),
        jnp.full((r,), -1, i32), jnp.full((r,), INF, f32),
        r // ts, ts)))

    variants = {}
    for mode in ("full", "nomt", "nodma"):
        variants[mode] = run_variant(flat, packed, mode)
    for kc in (2, 4):
        variants[f"full_kc{kc}"] = run_variant(flat, packed, "full", kc=kc)
        variants[f"nomt_kc{kc}"] = run_variant(flat, packed, "nomt", kc=kc)
    variants["full_ngrp4"] = run_variant(flat, packed, "full", ngrp=4)

    outs = {}
    for name, fn in variants.items():
        t, it = fn(packed, flat.clusters["aabb"], flat.clusters["root"],
                   flat.clusters["tblock"])
        sync(t)
        outs[name] = int(np.asarray(it).sum())
        print(f"compiled {name} trips={outs[name]}", flush=True)

    times = {k: np.inf for k in variants}
    for r_i in range(8):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            sync(fn(packed, flat.clusters["aabb"], flat.clusters["root"],
                    flat.clusters["tblock"])[0])
            times[name] = min(times[name], time.perf_counter() - t0)
        print(f"round {r_i}: " + " ".join(
            f"{k}={v*1e3:.1f}" for k, v in times.items()), flush=True)
    print("FINAL: " + " ".join(
        f"{k}={v*1e3:.1f}ms(trips={outs[k]})" for k, v in times.items()),
        flush=True)


if __name__ == "__main__":
    main()
