"""Round-5 lab 12: tiles-per-grid-step — amortize the ~29us/step overhead.

Lab 11 (fixed 6 trips/tile): an EMPTY loop shell costs 118ms of base's
151ms => the walk is bound by per-grid-step overhead (~29us/step at 4096
steps on that process), not by picks (0.45us), MT (0.4us), transpose
(0.15us) or DMA.  Test: run TPS tiles' complete walks inside ONE grid
step (fori over tiles; per-tile prologue + settle-driven while loop as
usual).  grid=(NT/TPS,) => per-step overhead divides by TPS.

Prototype walk = production-equivalent nearest (pick order, settle,
strict-min, plane off, uvt off) with best_t output only; checked against
nearest_hit_fused's t for exact agreement.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np

INF = 3.4028235e38


def build(flat, nt, ts, tps, ngrp=2):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from raytpu.core.intersect import det_space_accept

    cl = flat.clusters
    aabb, root, block = cl["aabb"], cl["root"], cl["tblock"]
    nc8 = aabb.shape[2]
    nc = block.shape[0]
    csize = block.shape[2]
    f32, i32 = jnp.float32, jnp.int32

    def kern(root_ref, rays, aabb_ref, block_hbm, out_t,
             ent, bt_ref, rs_ref, qk, qv, buf, sem):
        from raytpu.kernels.fused import (_entry_grid, _finite_and_cap_lm,
                                          _tile_bounds_lm)

        row_io = jax.lax.broadcasted_iota(i32, (8, nc8), 0)
        col_io = jax.lax.broadcasted_iota(i32, (8, nc8), 1)
        flat_io = row_io * nc8 + col_io
        valid_col = flat_io < nc

        def one_tile(t_i, _):
            c0 = pl.multiple_of(t_i * ts, ts)
            row = lambda r: rays[r:r + 1, pl.ds(c0, ts)]
            oxr, oyr, ozr = row(0), row(1), row(2)
            dxr, dyr, dzr = row(3), row(4), row(5)
            finite, tmax0 = _finite_and_cap_lm(
                root_ref, (oxr, oyr, ozr), (dxr, dyr, dzr), row(6))
            ent[:, :] = _entry_grid(
                aabb_ref, valid_col,
                _tile_bounds_lm(finite, (oxr, oyr, ozr),
                                (dxr, dyr, dzr)),
                jnp.max(tmax0))

            def pick():
                e = ent[:, :]
                v = jnp.min(e)
                k = jnp.min(jnp.where(e == v, flat_io, i32(nc)))
                ent[:, :] = jnp.where(flat_io == k, INF, e)
                return v, k

            def fill(grp):
                v_j, k_j = pick()
                k_safe = jnp.minimum(k_j, i32(nc - 1))
                qk[grp] = k_safe
                qv[grp] = v_j
                pltpu.make_async_copy(block_hbm.at[k_safe],
                                      buf.at[grp], sem.at[grp]).start()

            for g in range(ngrp):
                fill(g)

            wx = dyr * ozr - dzr * oyr
            wy = dzr * oxr - dxr * ozr
            wz = dxr * oyr - dyr * oxr
            bt_ref[:, :] = tmax0
            rs_ref[:, :] = (~finite | ~(tmax0 > 0.0)).astype(f32)

            def body(state):
                i, cur_v = state
                grp = jax.lax.rem(i, ngrp)
                pltpu.make_async_copy(block_hbm.at[qk[grp]],
                                      buf.at[grp], sem.at[grp]).wait()
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

                nxt = jax.lax.rem(i + 1, ngrp)
                v_next = qv[nxt]
                resolved = ((rs_ref[:, :] > 0.0)
                            | (bt_ref[:, :] <= v_next))
                rs_ref[:, :] = resolved.astype(f32)
                fill(grp)
                settled = jnp.all(resolved)
                return i + 1, jnp.where(settled, INF, v_next)

            jax.lax.while_loop(lambda st: st[1] < INF, body,
                               (jnp.int32(0), qv[0]))
            for slot in range(ngrp):
                pltpu.make_async_copy(block_hbm.at[qk[slot]],
                                      buf.at[slot], sem.at[slot]).wait()
            out_t[0, 0, pl.ds(c0, ts)] = bt_ref[:, :][0, :]
            return 0

        jax.lax.fori_loop(0, tps, one_tile, 0)

    @jax.jit
    def go(packed):
        return pl.pallas_call(
            kern,
            grid=(nt // tps,),
            in_specs=[
                pl.BlockSpec((1, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((16, tps * ts), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, 8, nc8), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, tps * ts), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt // tps, 1, tps * ts), f32),
            scratch_shapes=[
                pltpu.VMEM((8, nc8), f32),
                pltpu.VMEM((1, ts), f32),
                pltpu.VMEM((1, ts), f32),
                pltpu.SMEM((ngrp,), i32),
                pltpu.SMEM((ngrp,), f32),
                pltpu.VMEM((ngrp, 32, csize), f32),
                pltpu.SemaphoreType.DMA((ngrp,)),
            ],
        )(root, packed, aabb, block)

    return go


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import _pack_rays, nearest_hit_fused
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
    nt = r // ts
    f32, i32 = jnp.float32, jnp.int32
    packed = jax.device_put(np.asarray(_pack_rays(
        o.astype(f32), d.astype(f32), jnp.full((r,), -1, i32),
        jnp.full((r,), -1, i32), jnp.full((r,), INF, f32), nt, ts)))

    variants = {}
    for tps in (1, 4, 16, 64):
        variants[f"tps{tps}"] = (build(flat, nt, ts, tps), tps)

    # Reference result for correctness.
    href = nearest_hit_fused(flat, jax.device_put(o), jax.device_put(d),
                             tile_size=ts, layout="t", plane=False)
    tref = np.where(np.asarray(href.hit), np.asarray(href.t), INF)

    for name, (fn, tps) in variants.items():
        out = np.asarray(fn(packed)).reshape(-1)[:r]
        # best_t: INF-capped tmax on miss equals INF here.
        ok = np.allclose(np.minimum(out, INF), tref, rtol=0, atol=0)
        print(f"compiled {name} exact={ok} "
              f"maxdiff={np.max(np.abs(np.minimum(out, INF) - tref))}",
              flush=True)

    times = {k: np.inf for k in variants}
    for r_i in range(10):
        for name, (fn, tps) in variants.items():
            t0 = time.perf_counter()
            sync(fn(packed))
            times[name] = min(times[name], time.perf_counter() - t0)
        print(f"round {r_i}: " + " ".join(
            f"{k}={v*1e3:.1f}" for k, v in times.items()), flush=True)
    print("FINAL: " + " ".join(
        f"{k}={v*1e3:.1f}ms" for k, v in times.items()), flush=True)


if __name__ == "__main__":
    main()
