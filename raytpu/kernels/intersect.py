"""Fused nearest-hit Pallas kernel: per-tile front-to-back cluster testing.

One grid step per ray tile.  The tile's rays live in VMEM for the whole
search; sorted candidate clusters (computed by the XLA cull,
accel/tiled.py::prepare_tiles) stream in from HBM as packed (24, C) blocks
(16 triple-product geometry rows + 2 bitcast id rows, accel/clusters.py)
with pipelined DMA; each is tested with a dense (TS, C) Möller–Trumbore in
triple-product form (same u/v/t as core/intersect.py::moller_trumbore up to
fp32 rounding, ~30% fewer VPU ops) and a strict-min update.  The tile stops — *its own* early exit, unlike the
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
NBUF = 4  # DMA pipeline depth (clusters in flight)


def _intersect_kernel(
    # SMEM per-tile scalars
    cnt_ref,  # (1, 1) i32 candidate count (<= maxc)
    cand_ref,  # (1, MAXC) i32 cluster ids, front-to-back
    keys_ref,  # (1, MAXC) f32 conservative entry bounds
    # VMEM per-tile ray blocks (1, TS)
    ox, oy, oz, dx, dy, dz, tmax, itri, imesh,
    # HBM cluster table
    block_hbm,  # (NC, 24, C) f32
    # VMEM outputs (1, TS)
    out_t, out_u, out_v, out_tri, out_iters,
    # scratch
    buf,  # (NBUF, 24, C) f32
    sem,  # DMA semaphores (NBUF,)
    *,
    cull: bool,
    any_hit: bool,
):
    ts = ox.shape[2]
    c = buf.shape[2]
    count = cnt_ref[0, 0, 0]
    maxc = cand_ref.shape[2]

    # Rays as (TS, 1) columns: the pairwise test is (TS rays, C triangles).
    col = lambda ref: ref[0, 0, :].reshape(ts, 1)
    oxc, oyc, ozc = col(ox), col(oy), col(oz)
    dxc, dyc, dzc = col(dx), col(dy), col(dz)
    itric, imeshc = col(itri), col(imesh)
    # Per-ray w = d x o, hoisted out of the cluster loop (the triple-product
    # factorization moves all per-pair cross products into bake time).
    wxc = dyc * ozc - dzc * oyc
    wyc = dzc * oxc - dxc * ozc
    wzc = dxc * oyc - dyc * oxc

    def make_dma(slot, ci):
        k = cand_ref[0, 0, ci]
        return pltpu.make_async_copy(block_hbm.at[k], buf.at[slot],
                                     sem.at[slot])

    # Prime the pipeline: up to NBUF clusters in flight.
    for j in range(NBUF):
        @pl.when(j < count)
        def _():
            make_dma(j, j).start()

    def body(state):
        ci, _settled, bt, bu, bv, btri = state
        slot = jax.lax.rem(ci, NBUF)

        make_dma(slot, ci).wait()

        g = buf[slot]  # (24, C)
        row = lambda i: g[i:i + 1, :]  # (1, C)
        nx, ny, nz = row(0), row(1), row(2)

        # Möller–Trumbore in triple-product form (accel/clusters.py): the
        # same u/v/t up to fp32 rounding, with every per-pair cross product
        # folded into baked per-triangle vectors.  No determinant epsilon;
        # inf/NaN fail the acceptance tests, like core/intersect.py.
        det = dxc * nx + dyc * ny + dzc * nz
        inv = 1.0 / det
        udet = (wxc * row(6) + wyc * row(7) + wzc * row(8)
                + dxc * row(3) + dyc * row(4) + dzc * row(5))
        vdet = (wxc * row(12) + wyc * row(13) + wzc * row(14)
                + dxc * row(9) + dyc * row(10) + dzc * row(11))
        tdet = row(15) - (oxc * nx + oyc * ny + ozc * nz)
        uu = udet * inv
        vv = vdet * inv
        dd = tdet * inv
        ok = (uu >= 0.0) & (vv >= 0.0) & (dd >= 0.0) & (uu + vv <= 1.0)
        if cull:
            # Backface test via the determinant: det = d·(e2 x e1) and the
            # face normal is normalize(cross(e2, e1))
            # (TracerModelProcessor.cs:199-203), so sign(det) ==
            # sign(dot(snormal, d)) — no extra dot product needed.
            ok &= det <= 0.0
        tid = jax.lax.bitcast_convert_type(row(16), jnp.int32)  # (1, C)
        tmesh = jax.lax.bitcast_convert_type(row(17), jnp.int32)
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

        @pl.when(nxt + (NBUF - 1) < count)
        def _():
            make_dma(slot, nxt + (NBUF - 1)).start()

        if any_hit:
            # Occlusion query: stop as soon as every ray found *some* hit
            # inside its bound (best < its initial tmax) or is provably
            # clear (entry bound beyond its tmax).
            next_entry = jnp.where(
                nxt < count, keys_ref[0, 0, jnp.minimum(nxt, maxc - 1)], INF
            )
            resolved = (bt < col(tmax)) | (col(tmax) <= next_entry)
            settled = jnp.all(resolved)
        else:
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

    # Drain: on early exit (settled) prefetches for clusters ci_f..ci_f+NBUF-1
    # can still be in flight — every started DMA must be waited before the
    # kernel ends.
    for j in range(NBUF):
        @pl.when((ci_f + j < count) & (ci_f > 0))
        def _():
            make_dma(jax.lax.rem(ci_f + j, NBUF), ci_f + j).wait()

    out_t[0, 0, :] = bt[:, 0]
    out_u[0, 0, :] = bu[:, 0]
    out_v[0, 0, :] = bv[:, 0]
    out_tri[0, 0, :] = btri[:, 0]
    out_iters[0, 0, 0] = ci_f  # clusters actually tested (diagnostics)


@functools.partial(
    jax.jit,
    static_argnames=("cull", "any_hit", "interpret"),
)
def intersect_tiles(counts, cand, keys, o, d, tmax, itri, imesh, block,
                    cull: bool = True, any_hit: bool = False,
                    interpret: bool = False):
    """Run the fused kernel over (NT, TS) ray tiles.

    ``counts`` (NT,) i32; ``cand``/``keys`` (NT, MAXC); ``o``/``d`` (NT, TS, 3);
    ``tmax`` (NT, TS) f32; ``itri``/``imesh`` (NT, TS) i32; ``block`` the
    packed (NC, 24, C) cluster table.  Returns (t, u, v, tri, iters).
    """
    nt, ts = tmax.shape
    maxc = cand.shape[1]
    csize = block.shape[2]

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
        functools.partial(_intersect_kernel, cull=cull, any_hit=any_hit),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            smem_vec,
            smem_vec,
            *([ray_spec] * 9),
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
            pltpu.VMEM((NBUF, 24, csize), f32),
            pltpu.SemaphoreType.DMA((NBUF,)),
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
        block,
    )
    return tuple(a.reshape(nt, ts) for a in outs[:4]) + (
        outs[4].reshape(nt),  # clusters tested per tile
    )
