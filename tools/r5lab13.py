"""Round-5 lab 13: RPC-free walk decomposition via in-jit chaining.

Every prior lab's absolute numbers ride a tunnel RPC term that inflates
under host load (a pytest suite ran concurrently with labs 9-12).  Here
each variant is invoked CHAIN times inside ONE jit (a trivial scalar
dependency serializes the calls), so

    per_invocation_device_time = (t_chain8 - t_chain1) / 7

with RPC and all per-call host costs cancelled.  Modes (MAXT=6 fixed
trips, settle off, kc=1, ngrp=2, cs=128, ts=256 => 24576 iters/invoc):

  noloop:   per-tile prologue only (entry grid + bounds), no walk loop
  empty6:   prologue + 6 empty loop iterations
  pickonly6: + argmin picks
  nomt6:    + DMA/wait/transpose/touch (no MT math)
  full6:    + the real Möller–Trumbore + min-update
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

INF = 3.4028235e38
MAXT = 6


def make_kernel(mode: str, ngrp: int = 2):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from raytpu.core.intersect import det_space_accept

    do_pick = mode in ("full", "nomt", "pickonly")
    do_dma = mode in ("full", "nomt")
    do_test = mode == "full"
    do_touch = mode == "nomt"
    do_loop = mode != "noloop"

    def kern(root_ref, rays, aabb, block_hbm, out_t, out_it,
             ent, bt_ref, qk, qv, buf, sem):
        from raytpu.kernels.fused import (_entry_grid, _finite_and_cap_lm,
                                          _tile_bounds_lm)

        ts = rays.shape[1]
        f32, i32 = jnp.float32, jnp.int32
        nc8 = aabb.shape[2]
        nc = nc8 * 8

        row = lambda r: rays[r:r + 1, :]
        oxr, oyr, ozr = row(0), row(1), row(2)
        dxr, dyr, dzr = row(3), row(4), row(5)
        finite, tmax0 = _finite_and_cap_lm(
            root_ref, (oxr, oyr, ozr), (dxr, dyr, dzr), row(6))
        row_io = jax.lax.broadcasted_iota(i32, (8, nc8), 0)
        col_io = jax.lax.broadcasted_iota(i32, (8, nc8), 1)
        flat_io = row_io * nc8 + col_io
        valid_col = flat_io < nc
        ent[:, :] = _entry_grid(
            aabb, valid_col,
            _tile_bounds_lm(finite, (oxr, oyr, ozr), (dxr, dyr, dzr)),
            jnp.max(tmax0))
        bt_ref[:, :] = tmax0

        def pick():
            e = ent[:, :]
            v = jnp.min(e)
            k = jnp.min(jnp.where(e == v, flat_io, i32(nc)))
            ent[:, :] = jnp.where(flat_io == k, INF, e)
            return v, k

        def fill_slot(grp):
            if do_pick:
                v_j, k_j = pick()
                qk[grp] = jnp.minimum(k_j, i32(nc - 1))
            if do_dma:
                pltpu.make_async_copy(block_hbm.at[qk[grp]],
                                      buf.at[grp], sem.at[grp]).start()

        if do_loop:
            for g in range(ngrp):
                fill_slot(g)

            wx = dyr * ozr - dzr * oyr
            wy = dzr * oxr - dxr * ozr
            wz = dxr * oyr - dyr * oxr

            def body(i, _):
                grp = jax.lax.rem(i, ngrp)
                if do_dma:
                    pltpu.make_async_copy(block_hbm.at[qk[grp]],
                                          buf.at[grp], sem.at[grp]).wait()
                if do_test:
                    gt = jnp.transpose(buf[grp])
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
                elif do_touch:
                    gt = jnp.transpose(buf[grp])
                    bt_ref[:, :] = jnp.minimum(
                        bt_ref[:, :], jnp.max(gt[:, 0:1]) * 0.0 + tmax0)
                elif not do_dma and not do_pick:
                    qk[grp] = qk[grp] + 1
                fill_slot(grp)
                return 0

            jax.lax.fori_loop(0, MAXT, body, 0)
            if do_dma:
                for slot in range(ngrp):
                    pltpu.make_async_copy(block_hbm.at[qk[slot]],
                                          buf.at[slot], sem.at[slot]).wait()
        out_t[0, 0, :] = bt_ref[:, :][0, :]
        out_it[0, 0, 0] = jnp.int32(MAXT)

    return kern


def build(flat, nt, ts, mode, chain, ngrp=2):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cl = flat.clusters
    aabb, root, block = cl["aabb"], cl["root"], cl["tblock"]
    nc8 = aabb.shape[2]
    csize = block.shape[2]
    f32, i32 = jnp.float32, jnp.int32
    kern = make_kernel(mode, ngrp)

    def once(packed):
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
                pltpu.SMEM((ngrp,), i32),
                pltpu.SMEM((ngrp,), f32),
                pltpu.VMEM((ngrp, 32, csize), f32),
                pltpu.SemaphoreType.DMA((ngrp,)),
            ],
        )(root, packed, aabb, block)

    @jax.jit
    def go(packed):
        def step(acc, _):
            t, _it = once(packed + acc * 0.0)
            return acc + t[0, 0, 0], None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=chain)
        return acc

    return go


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import _pack_rays
    from raytpu.render.wavefront import block_order_perm

    sync = lambda x: float(np.asarray(x))
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
    nt = r // ts
    f32, i32 = jnp.float32, jnp.int32
    packed = jax.device_put(np.asarray(_pack_rays(
        o.astype(f32), d.astype(f32), jnp.full((r,), -1, i32),
        jnp.full((r,), -1, i32), jnp.full((r,), INF, f32), nt, ts)))

    modes = ("noloop", "empty", "pickonly", "nomt", "full")
    variants = {}
    for m in modes:
        for chain in (1, 8):
            variants[f"{m}_c{chain}"] = build(flat, nt, ts, m, chain)

    for name, fn in variants.items():
        sync(fn(packed))
        print(f"compiled {name}", flush=True)

    times = {k: np.inf for k in variants}
    for r_i in range(12):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            sync(fn(packed))
            times[name] = min(times[name], time.perf_counter() - t0)
        print(f"round {r_i}: " + " ".join(
            f"{k}={v*1e3:.1f}" for k, v in times.items()), flush=True)
    print("FINAL: " + " ".join(
        f"{k}={v*1e3:.1f}ms" for k, v in times.items()), flush=True)
    print("\nPer-invocation device time ((c8-c1)/7):")
    for m in modes:
        per = (times[f"{m}_c8"] - times[f"{m}_c1"]) / 7.0
        print(f"  {m:9s} {per*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
