"""Fused nearest-hit Pallas kernel: per-tile front-to-back cluster testing.

One grid step per ray tile.  The tile's rays live in VMEM for the whole
search; sorted candidate clusters (computed by the XLA cull,
accel/tiled.py::prepare_tiles) stream in from HBM as packed (12, C) geometry
blocks with double-buffered DMA; each is tested with a dense (TS, C)
Möller–Trumbore (identical arithmetic to core/intersect.py::moller_trumbore)
and a strict-min update.  The tile stops — *its own* early exit, unlike the
lockstep XLA backend — as soon as every ray's best hit distance is <= the
next cluster's conservative entry bound, the exact-correct analog of the
reference's sorted-leaf early stop (MeshOctree.cs:281-306).

This kernel is the TPU-native replacement for the reference's innermost hot
loops (RayExtensions.cs:13-75 Möller–Trumbore; MeshOctree.cs:288-304 leaf
scan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.4028235e38


def _intersect_kernel(
    # SMEM per-tile scalars
    cnt_ref,  # (1, 1) i32 candidate count (<= maxc)
    cand_ref,  # (1, MAXC) i32 cluster ids, front-to-back
    keys_ref,  # (1, MAXC) f32 conservative entry bounds
    # VMEM per-tile ray blocks (1, TS)
    ox, oy, oz, dx, dy, dz, tmax, itri, imesh,
    # HBM cluster tables
    geom_hbm,  # (NC, 12, C) f32
    ids_hbm,  # (NC, 2, C) i32
    # VMEM outputs (1, TS)
    out_t, out_u, out_v, out_tri, out_iters,
    # scratch
    geom_buf,  # (2, 12, C) f32
    ids_buf,  # (2, 2, C) i32
    sem,  # DMA semaphores (2, 2)
    *,
    cull: bool,
):
    ts = ox.shape[2]
    c = geom_buf.shape[2]
    count = cnt_ref[0, 0, 0]
    maxc = cand_ref.shape[2]

    # Rays as (TS, 1) columns: the pairwise test is (TS rays, C triangles).
    col = lambda ref: ref[0, 0, :].reshape(ts, 1)
    oxc, oyc, ozc = col(ox), col(oy), col(oz)
    dxc, dyc, dzc = col(dx), col(dy), col(dz)
    itric, imeshc = col(itri), col(imesh)

    def make_dma(slot, ci):
        k = cand_ref[0, 0, ci]
        return (
            pltpu.make_async_copy(geom_hbm.at[k], geom_buf.at[slot],
                                  sem.at[slot, 0]),
            pltpu.make_async_copy(ids_hbm.at[k], ids_buf.at[slot],
                                  sem.at[slot, 1]),
        )

    @pl.when(count > 0)
    def _():
        for dma in make_dma(0, 0):
            dma.start()

    def body(state):
        ci, _settled, bt, bu, bv, btri = state
        slot = jax.lax.rem(ci, 2)
        nslot = jax.lax.rem(ci + 1, 2)

        @pl.when(ci + 1 < count)
        def _():
            for dma in make_dma(nslot, ci + 1):
                dma.start()

        for dma in make_dma(slot, ci):
            dma.wait()

        g = geom_buf[slot]  # (12, C)
        ids = ids_buf[slot]  # (2, C)
        row = lambda i: g[i:i + 1, :]  # (1, C)
        v1x, v1y, v1z = row(0), row(1), row(2)
        e1x, e1y, e1z = row(3), row(4), row(5)
        e2x, e2y, e2z = row(6), row(7), row(8)

        # Möller–Trumbore on (TS, C) — exactly core/intersect.py semantics
        # (no determinant epsilon; inf/NaN fail the acceptance tests).
        tx, ty, tz = oxc - v1x, oyc - v1y, ozc - v1z
        px = dyc * e2z - dzc * e2y
        py = dzc * e2x - dxc * e2z
        pz = dxc * e2y - dyc * e2x
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        det = px * e1x + py * e1y + pz * e1z
        inv = 1.0 / det
        dd = (qx * e2x + qy * e2y + qz * e2z) * inv
        uu = (px * tx + py * ty + pz * tz) * inv
        vv = (qx * dxc + qy * dyc + qz * dzc) * inv
        ok = (uu >= 0.0) & (vv >= 0.0) & (dd >= 0.0) & (uu + vv <= 1.0)
        if cull:
            snx, sny, snz = row(9), row(10), row(11)
            ok &= (snx * dxc + sny * dyc + snz * dzc) <= 0.0
        tid = ids[0:1, :]  # (1, C)
        tmesh = ids[1:2, :]
        ok &= (tid >= 0) & (tid != itric) & (tmesh != imeshc)

        dist = jnp.where(ok, dd, INF)
        mint = jnp.min(dist, axis=1, keepdims=True)  # (TS, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        # First (lowest Morton slot) among equals — matches the XLA argmin.
        pick = jnp.min(jnp.where(dist == mint, lane, c), axis=1, keepdims=True)
        onehot = lane == pick

        def sel(a):
            return jnp.sum(jnp.where(onehot, a, jnp.zeros_like(a)), axis=1,
                           keepdims=True)

        upd = mint < bt
        bt = jnp.where(upd, mint, bt)
        bu = jnp.where(upd, sel(uu), bu)
        bv = jnp.where(upd, sel(vv), bv)
        btri = jnp.where(upd, sel(jnp.broadcast_to(tid, dist.shape)), btri)

        nxt = ci + 1
        next_entry = jnp.where(
            nxt < count, keys_ref[0, 0, jnp.minimum(nxt, maxc - 1)], INF
        )
        settled = jnp.all(bt <= next_entry)
        return nxt, settled, bt, bu, bv, btri

    def cond(state):
        ci, settled = state[0], state[1]
        return (ci < count) & jnp.logical_not(settled)

    bt0 = col(tmax)
    z = jnp.zeros((ts, 1), jnp.float32)
    init = (jnp.int32(0), count == 0, bt0, z, z,
            jnp.full((ts, 1), -1, jnp.int32))
    ci_f, _, bt, bu, bv, btri = jax.lax.while_loop(cond, body, init)

    # Drain: on early exit (settled) the prefetch for cluster ci_f is still
    # in flight — every started DMA must be waited before the kernel ends.
    @pl.when((ci_f < count) & (ci_f > 0))
    def _():
        for dma in make_dma(jax.lax.rem(ci_f, 2), ci_f):
            dma.wait()

    out_t[0, 0, :] = bt[:, 0]
    out_u[0, 0, :] = bu[:, 0]
    out_v[0, 0, :] = bv[:, 0]
    out_tri[0, 0, :] = btri[:, 0]
    out_iters[0, 0, 0] = ci_f  # clusters actually tested (diagnostics)


@functools.partial(
    jax.jit,
    static_argnames=("cull", "interpret"),
)
def intersect_tiles(counts, cand, keys, o, d, tmax, itri, imesh, geom, ids,
                    cull: bool = True, interpret: bool = False):
    """Run the fused kernel over (NT, TS) ray tiles.

    ``counts`` (NT,) i32; ``cand``/``keys`` (NT, MAXC); ``o``/``d`` (NT, TS, 3);
    ``tmax`` (NT, TS) f32; ``itri``/``imesh`` (NT, TS) i32; ``geom``/``ids``
    the packed cluster tables.  Returns (t, u, v, tri) each (NT, TS).
    """
    nt, ts = tmax.shape
    maxc = cand.shape[1]
    csize = geom.shape[2]

    # Per-tile operands are (NT, 1, X) with (1, 1, X) blocks so the last two
    # block dims equal the array dims (the Mosaic block-shape constraint).
    ray_spec = pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem_vec = pl.BlockSpec((1, 1, maxc), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)

    f32 = jnp.float32
    i32 = jnp.int32
    outs = pl.pallas_call(
        functools.partial(_intersect_kernel, cull=cull),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            smem_vec,
            smem_vec,
            *([ray_spec] * 9),
            hbm,
            hbm,
        ],
        out_specs=[ray_spec] * 4 + [
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, 1, ts), f32),
            jax.ShapeDtypeStruct((nt, 1, ts), f32),
            jax.ShapeDtypeStruct((nt, 1, ts), f32),
            jax.ShapeDtypeStruct((nt, 1, ts), i32),
            jax.ShapeDtypeStruct((nt, 1, 1), i32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 12, csize), f32),
            pltpu.VMEM((2, 2, csize), i32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(
        counts.reshape(nt, 1, 1).astype(i32),
        cand.reshape(nt, 1, maxc).astype(i32),
        keys.reshape(nt, 1, maxc).astype(f32),
        o[..., 0].reshape(nt, 1, ts), o[..., 1].reshape(nt, 1, ts),
        o[..., 2].reshape(nt, 1, ts),
        d[..., 0].reshape(nt, 1, ts), d[..., 1].reshape(nt, 1, ts),
        d[..., 2].reshape(nt, 1, ts),
        tmax.reshape(nt, 1, ts),
        itri.reshape(nt, 1, ts).astype(i32),
        imesh.reshape(nt, 1, ts).astype(i32),
        geom,
        ids,
    )
    return tuple(a.reshape(nt, ts) for a in outs[:4]) + (
        outs[4].reshape(nt),  # clusters tested per tile
    )
