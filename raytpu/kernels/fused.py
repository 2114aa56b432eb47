"""Fully-fused nearest-hit Pallas kernel: cull + walk + intersect in VMEM.

The production TPU intersector (the XLA-side cull/select of
accel/tiled.py remains as the exact non-TPU fallback).  One grid step
per ray tile; everything happens on-chip:

1. **Tile bounds** — origin AABB + direction interval box reduced from the
   tile's rays (non-finite rays excluded), plus the per-ray root-AABB t cap.
2. **In-kernel cull** — the conservative interval slab test of
   accel/tiled.py::cull_clusters runs over the cluster-AABB table held
   resident in VMEM, producing a per-tile entry-bound grid in scratch.
3. **Chunked argmin walk** — each loop trip extracts the K nearest
   remaining clusters from the entry grid (K x (argmin + clear), ~NC
   element ops each), streams their packed geometry blocks from HBM
   through a two-group pipeline (group g+1's K DMAs are in flight while
   group g runs K statically-unrolled dense triple-product
   Möller–Trumbore passes in ascending entry order with a strict-min
   update of (best_t, best_code)).  The tile settles exactly when every
   ray's best hit precedes the next group's first entry bound — the
   reference's sorted-leaf early stop (MeshOctree.cs:281-306) with exact
   nearest-hit semantics and NO candidate cap: no top-k, no overflow
   tail, no lockstep fallback.  Chunking amortizes the per-trip overhead
   (DMA waits, settle check, loop bookkeeping) over K clusters of VPU
   work; the walk order and hit results are identical to the K=1 walk.
   (A Morton-range variant — one pick anchoring a contiguous K-range in a
   single DMA — measured 2.3x SLOWER: the anchor's Morton neighbors are
   rarely the next-nearest candidates, so trips did not shrink.)
4. **Per-ray slab pretest** (``pretest``) — before a picked cluster's
   Möller–Trumbore pass runs, a ~40-op per-ray slab test against the
   cluster's own AABB (rows 18-23 of its DMA block, margin-expanded)
   checks whether ANY unresolved ray could still improve on it; if not,
   the whole (TS, C) test is skipped via ``lax.cond``.  The tile-level
   cull is conservative over the beam, so many walked clusters intersect
   no individual ray — skipping them is exact.
5. **In-kernel winner-row resolve** (``rows``, tlane) — after the walk
   settles, the tile loops its UNIQUE winner blocks (typically 2-4),
   DMAs each block's cluster-ordered shade rows (``sblock`` bake,
   double-buffered) and extracts every ray's packed (32,)-float row via
   a one-hot MXU contraction (three bf16 limbs per f32 channel; exactly
   one nonzero product per output element => bit-exact reassembly).
   Replaces the XLA-side ``tri_shade[tri]`` gather, which measured ~59 ms
   per 1M rays — half the device frame (tools/r5lab16).
6. **Periodic re-cull** (``recull_every``) — every few trips the entry
   grid is rebuilt from the *unresolved* rays only (resolved rays stop
   inflating the tile bounds) and pruned against their current best
   distances.  Entries only ever tighten (grow), so pick order stays
   nondecreasing and the settle proof is unaffected; consumed clusters
   are excluded via a ``done`` grid.  This attacks lockstep-tile
   conservatism head-on: once the bulk of a tile resolves, the walk
   continues with the narrow unresolved beam instead of the full tile.

The Möller–Trumbore quantities come from either ~31 VPU elementwise ops
(exact triple-product path) or, with ``mxu=True``, one (TS, 16) @ (16, 4C)
MXU matmul per cluster — all four det-space quantities are linear in
(d, w, o, 1) (see accel/clusters.py gblock).  DMA waits for a trip's K
slots are hoisted ahead of its tests (one fence point per trip).

Versus the r1 XLA pipeline (cull + top-maxc select + kernel): the dense
(tiles, clusters) mask/entry arrays never touch HBM, the pathological XLA
select (334 ms of a 433 ms frame at 1M tris/1M rays) disappears, and the
acceptance test runs in det-multiplied space (no per-pair reciprocal; one
divide only for the hit distance).  With ``uvt`` (the nearest-hit default)
the winner's (udet, vdet, det, triangle id) ride along in scratch via
one-hot row sums per trip and (u, v) fall out of one division per ray at
drain — no host-side gather or recompute epilogue (the old (R, 16) row
gather alone cost as much as half the walk at 1M rays).  ``any_hit``
occlusion queries skip all of it and return just the boolean + bounded t.

This kernel is the TPU-native replacement for the reference's innermost hot
loops (RayExtensions.cs:13-75 Möller–Trumbore; MeshOctree.cs:288-353 leaf
scan + sorted traversal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu.accel.traverse import Hit

INF = 3.4028235e38
# DMA pipeline depth in chunk groups (groups g+1.. in flight).  2 measured
# ~5% faster than 4 on v5e at ts=256/kc=1: one group of lookahead hides the
# HBM latency and deeper prefetch only wastes picks at settle.
NGRP = 2
ROWS = 16  # packed ray rows (o, d, tmax, itri, imesh, pad)

# ---- Keyed picks -----------------------------------------------------------
# The RPC-free walk decomposition (tools/r5lab13, v5e) attributed ~40% of a
# walk trip to the argmin pick: TWO full-grid reduce->scalar chains (min of
# the entries, then min of the matching ids) plus the clear pass, each ending
# in a slow vector->scalar transfer.  The keyed pick folds the cluster id
# into the LOW MANTISSA BITS of its entry bound: for non-negative f32, the
# int32 bit pattern orders exactly like the float, so ONE int-min reduce
# yields (floored entry, id) together and one scalar AND recovers each.
#
# Soundness: clearing the low ``kbits`` mantissa bits only LOWERS an entry
# (by < 2^(kbits-23) relative, ~0.1% at 8k clusters), so every decoded pick
# value remains a TRUE lower bound on any hit in that cluster, the pick
# order stays nondecreasing in the floored keys, and the settle proof
# (best_t <= v_next <= every untested cluster's true entry) is unaffected —
# rays settle at most one trip later when best_t lands inside the floored
# gap.  Exact-tie winners across clusters may resolve by a different pick
# order than the unkeyed argmin (same documented tie freedom as chunk_k).
# Infeasible/INF entries keep exponent 0xFF and decode back to INF; consumed
# cells are cleared to INT32_MAX (> any INF key) and decode to INF too.
_KEY_INF = 0x7F800000  # bit pattern of +inf
_KEY_CLEAR = 0x7FFFFFFF


def _key_bits(n_ids: int) -> int:
    """Low-bit width reserved for ids 0..n_ids-1 (and the all-ones dummy)."""
    b = 1
    while (1 << b) < n_ids + 1:
        b += 1
    return b


def _make_keys(grid_f32, flat_io, kbits: int):
    """Fold grid cell ids into the low mantissa bits of the f32 entries."""
    bits = jax.lax.bitcast_convert_type(grid_f32, jnp.int32)
    return (bits & ~((1 << kbits) - 1)) | flat_io


# Mosaic has no SCALAR bitcast, so picked keys are never decoded back to
# f32 — the walk carries entry bounds as int32 keys end-to-end and every
# comparison runs in key space, exact for non-negative floats:
#   b <= v_floor      <=>  bitcast(b) <= (key & ~low_mask)     (vectors)
#   v == INF/drained  <=>  key >= _KEY_INF                     (scalar int)
# Resolved-lane sentinels (-INF) bitcast to a NEGATIVE int, which compares
# below every non-negative key — exactly the order the masks need.


def _f32_bits(x):
    """Vector bitcast f32 -> int32 (key-space compare operand)."""
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _tile_bounds_lm(m, o_rows, d_rows):
    """Origin AABB + direction interval box over the rays in mask ``m``.

    All inputs are (1, TS) lane-major rows (see the kernel prologue layout
    note: a (TS, 1) op costs ~16x more at 1/128 lane utilization)."""
    f32 = jnp.float32
    oxr, oyr, ozr = o_rows
    dxr, dyr, dzr = d_rows
    mbig = jnp.where(m, f32(0.0), f32(INF))

    def bmin(a):
        return jnp.min(jnp.where(m, a, f32(0.0)) + mbig)

    def bmax(a):
        return jnp.max(jnp.where(m, a, f32(0.0)) - mbig)

    any_m = jnp.max(m.astype(f32)) > 0.0
    om = [jnp.where(any_m, bmin(a), f32(0.0)) for a in (oxr, oyr, ozr)]
    oM = [jnp.where(any_m, bmax(a), f32(0.0)) for a in (oxr, oyr, ozr)]
    dm = [jnp.where(any_m, bmin(a), f32(1.0)) for a in (dxr, dyr, dzr)]
    dM = [jnp.where(any_m, bmax(a), f32(1.0)) for a in (dxr, dyr, dzr)]
    return om, oM, dm, dM, any_m


def _finite_and_cap_lm(root_ref, o_rows, d_rows, tmax_in):
    """Finite-ray mask + per-ray root-AABB-capped t bound, lane-major.

    The prepare_tiles-parity prologue shared by ALL walk kernels (classic
    / prepick / tlane): the rescue and phase-2 exactness contracts rely on
    every kernel computing bit-identical caps, so there is exactly one
    copy of this arithmetic.  Returns ((1, TS) finite, (1, TS) capped
    tmax)."""
    f32 = jnp.float32
    oxr, oyr, ozr = o_rows
    dxr, dyr, dzr = d_rows
    ts = oxr.shape[1]
    finite = (
        jnp.isfinite(oxr) & jnp.isfinite(oyr) & jnp.isfinite(ozr)
        & jnp.isfinite(dxr) & jnp.isfinite(dyr) & jnp.isfinite(dzr)
    )
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
    cap = jnp.where(root_hit, t_ex * f32(1.0 + 1e-5) + margin, f32(0.0))
    cap = jnp.where(jnp.isfinite(cap), cap, f32(0.0))
    return finite, jnp.minimum(tmax_in, cap)


def _entry_grid(aabb, valid_col, bounds, wcap, plane=None):
    """Conservative entry bounds for the beam with bounds from
    ``_tile_bounds_lm``.

    Division-free interval slab test (accel/tiled.py::cull_clusters):
    per axis, the conservative entry/exit of t >= 0 with t*d in
    [s_lo, s_hi] for some d in [d_lo, d_hi]; only per-tile scalar
    reciprocals.  ``wcap``: prune clusters whose entry cannot beat any
    of the masked rays' current best (INF entry = infeasible).

    ``plane`` (optional, rows ``n xyz, d0, eps`` — the fitted-plane bake
    of accel/clusters.py): additionally intersect with the conservative
    interval of t where a beam ray can lie within the cluster's
    eps-thickened plane.  Same case analysis as a slab axis, with the
    per-cluster direction-dot interval [g_lo, g_hi] playing d and the
    eps-padded offset interval [A, B] playing s — for near-planar
    clusters this interval is FAR tighter than the AABB slab, raising
    entries (faster per-ray resolution, better ordering) and killing
    feasibility outright for beams that only graze the cluster's empty
    AABB corners.  Exact: any triangle point of the cluster satisfies
    |p.n - d0| <= eps by construction, so the combined t_lo remains a
    true lower bound on any hit distance in the cluster."""
    f32 = jnp.float32
    o_min, o_max, d_min, d_max, any_m = bounds
    shape = valid_col.shape
    t_lo = jnp.zeros(shape, f32)
    t_hi = jnp.full(shape, INF, f32)
    for k in range(3):
        d_lo = d_min[k]
        d_hi = d_max[k]
        inv_hi = 1.0 / jnp.where(d_hi == 0.0, f32(1.0), d_hi)
        inv_lo = 1.0 / jnp.where(d_lo == 0.0, f32(1.0), d_lo)
        hi_pos = d_hi > 0.0
        lo_pos = d_lo > 0.0
        lo_neg = d_lo < 0.0
        hi_neg = d_hi < 0.0

        s_lo = aabb[k] - o_max[k]
        s_hi = aabb[3 + k] - o_min[k]
        pos = s_lo > 0.0
        neg = s_hi < 0.0

        lo_k = jnp.where(
            pos,
            jnp.where(hi_pos, s_lo * inv_hi, INF),
            jnp.where(neg, jnp.where(lo_neg, s_hi * inv_lo, INF),
                      f32(0.0)),
        )
        hi_same = jnp.where(lo_pos, s_hi * inv_lo,
                            jnp.where(hi_neg, s_lo * inv_hi, INF))
        hi_k = jnp.where(pos, jnp.where(lo_pos, s_hi * inv_lo, INF),
                         jnp.where(neg,
                                   jnp.where(hi_neg, s_lo * inv_hi, INF),
                                   hi_same))
        t_lo = jnp.maximum(t_lo, lo_k)
        t_hi = jnp.minimum(t_hi, hi_k)
    if plane is not None:
        n3 = (plane[0], plane[1], plane[2])
        d0 = plane[3]
        eps = plane[4]
        g_lo = jnp.zeros(shape, f32)
        g_hi = jnp.zeros(shape, f32)
        o_dlo = jnp.zeros(shape, f32)
        o_dhi = jnp.zeros(shape, f32)
        for k in range(3):
            a = n3[k] * d_min[k]
            b = n3[k] * d_max[k]
            g_lo = g_lo + jnp.minimum(a, b)
            g_hi = g_hi + jnp.maximum(a, b)
            c1 = n3[k] * o_min[k]
            c2 = n3[k] * o_max[k]
            o_dlo = o_dlo + jnp.minimum(c1, c2)
            o_dhi = o_dhi + jnp.maximum(c1, c2)
        A = (d0 - o_dhi) - eps  # target interval of t*(d.n)
        B = (d0 - o_dlo) + eps
        inv_ghi = 1.0 / jnp.where(g_hi == 0.0, f32(1.0), g_hi)
        inv_glo = 1.0 / jnp.where(g_lo == 0.0, f32(1.0), g_lo)
        hi_pos = g_hi > 0.0
        lo_pos = g_lo > 0.0
        lo_neg = g_lo < 0.0
        hi_neg = g_hi < 0.0
        pos = A > 0.0
        neg = B < 0.0
        lo_p = jnp.where(
            pos,
            jnp.where(hi_pos, A * inv_ghi, INF),
            jnp.where(neg, jnp.where(lo_neg, B * inv_glo, INF),
                      f32(0.0)),
        )
        hi_same = jnp.where(lo_pos, B * inv_glo,
                            jnp.where(hi_neg, A * inv_ghi, INF))
        hi_p = jnp.where(pos, jnp.where(lo_pos, B * inv_glo, INF),
                         jnp.where(neg,
                                   jnp.where(hi_neg, A * inv_ghi, INF),
                                   hi_same))
        t_lo = jnp.maximum(t_lo, lo_p)
        t_hi = jnp.minimum(t_hi, hi_p)
    feasible = (t_lo <= t_hi) & (t_lo < INF) & (t_lo < wcap) & valid_col
    return jnp.where(feasible & any_m, t_lo, INF)


def _fused_kernel(
    root_ref,  # (1, 8) SMEM: root_min xyz, root_max xyz, margin, pad
    rays,      # (ROWS, TS) VMEM packed rays (column slice of (ROWS, R))
    aabb,      # (6, 8, NC8) VMEM cluster AABBs (min xyz, max xyz planes)
    *args,     # [splane (5, 8, NC8)] block_hbm, outputs, scratch:
               # block_hbm (NC, 24, C) ANY packed cluster geometry;
               # out_t, out_code, out_uvt, out_res, out_iters;
               # ent  (8, NC8) VMEM: remaining entry bounds
               # done (8, NC8) VMEM: 1.0 where the cluster was picked
               # bt/bc/rs/bu/bv/bd/bi (TS, 1) VMEM per-ray state
               # qk, qv (NGRP*K,) SMEM DMA queue; buf; sem
    cull: bool,
    any_hit: bool,
    nc: int,
    k_chunk: int,
    ngrp: int = NGRP,
    has_ignore: bool = True,
    mxu: bool = False,
    mxu_precision: str = "highest",
    recull_every: int = 0,
    pretest: bool = False,
    max_trips: int = 0,
    uvt: bool = False,
    use_plane: bool = False,
):
    i_arg = 0
    splane = None
    if use_plane:
        splane = args[0]
        i_arg = 1
    (block_hbm, out_t, out_code, out_uvt, out_res, out_iters,
     ent, done, bt_ref, bc_ref, rs_ref, bu_ref, bv_ref, bd_ref, bi_ref,
     qk, qv, buf, sem) = args[i_arg:]

    ts = rays.shape[1]
    nc8 = aabb.shape[2]
    c = buf.shape[2] // 4 if mxu else buf.shape[2]
    f32 = jnp.float32
    i32 = jnp.int32

    # Per-ray prologue math runs in lane-major (1, TS) layout — a (TS, 1)
    # vector occupies TS/8 vregs at 1/128 lane utilization, so the same op
    # costs 16x more there; only the quantities the per-cluster test
    # broadcasts against (1, C) triangle rows need the (TS, 1) layout.
    row = lambda r: rays[r:r + 1, :]  # (1, TS)
    oxr, oyr, ozr = row(0), row(1), row(2)
    dxr, dyr, dzr = row(3), row(4), row(5)
    tmax_in = row(6)

    col = lambda r: rays[r, :].reshape(ts, 1)
    ox, oy, oz = col(0), col(1), col(2)
    dx, dy, dz = col(3), col(4), col(5)
    itri = jax.lax.bitcast_convert_type(col(7), i32)
    imesh = jax.lax.bitcast_convert_type(col(8), i32)

    # ---- Finite mask + per-ray root-AABB t cap (shared helper) ----
    finite, tmax_lm = _finite_and_cap_lm(
        root_ref, (oxr, oyr, ozr), (dxr, dyr, dzr), tmax_in)
    margin = root_ref[0, 6]  # also used by the slab pretest below
    tile_tmax = jnp.max(tmax_lm)
    # One relayout into the walk's column shape.
    tmax0 = tmax_lm.reshape(ts, 1)

    # ---- In-kernel cull: entry-bound grid over all clusters ----
    row_io = jax.lax.broadcasted_iota(i32, (8, nc8), 0)
    col_io = jax.lax.broadcasted_iota(i32, (8, nc8), 1)
    flat_io = row_io * nc8 + col_io
    valid_col = flat_io < nc  # padding columns are never feasible

    pl_rows = (tuple(splane[j] for j in range(5)) if use_plane else None)

    def entry_grid(m, wcap):
        return _entry_grid(aabb, valid_col,
                           _tile_bounds_lm(m, (oxr, oyr, ozr),
                                           (dxr, dyr, dzr)), wcap,
                           plane=pl_rows)

    kbits = _key_bits(8 * nc8)
    ent[:, :] = _make_keys(entry_grid(finite, tile_tmax), flat_io, kbits)
    done[:, :] = jnp.zeros((8, nc8), f32)

    # ---- Chunked argmin walk with an ngrp-deep DMA pipeline ----
    NG = ngrp
    kc = min(k_chunk, nc)

    def pick():
        """Extract (key, cluster) of the nearest remaining cluster.

        Keyed single-reduce argmin (see the module-level keyed-pick note):
        one int-min over the key grid replaces the old value-min + id-min
        pair of reduce->scalar chains.  Returns the raw int32 key (entry
        bound in the high bits) and the cluster id."""
        ik = ent[:, :]
        kv = jnp.min(ik)
        picked = ik == kv  # keys are unique (id in the low bits)
        ent[:, :] = jnp.where(picked, i32(_KEY_CLEAR), ik)
        # Mark consumed so a later re-cull cannot resurrect it.
        done[:, :] = jnp.where(picked, f32(1.0), done[:, :])
        return kv, kv & ((1 << kbits) - 1)

    def start_dma(slot, k):
        pltpu.make_async_copy(block_hbm.at[k], buf.at[slot],
                              sem.at[slot]).start()

    def wait_dma(slot, k):
        pltpu.make_async_copy(block_hbm.at[k], buf.at[slot],
                              sem.at[slot]).wait()

    def pick_group(grp):
        """Fill group ``grp``'s K queue slots with the next-nearest picks
        (ascending entry; INF-padded past the end) and launch their DMAs.

        Every slot gets a DMA — exhausted picks (v == INF) fetch a real
        cluster as a dummy so the consumer side needs no conditional waits.
        No mask is needed on the consumer side: re-testing any real cluster
        is idempotent under the strict-min update (see test_cluster), so a
        dummy slot can only re-confirm existing bests.  The waste is
        bounded by the final partial group."""
        for j in range(kc):
            v_j, k_j = pick()
            k_safe = jnp.minimum(k_j, i32(nc - 1))
            qk[grp * kc + j] = k_safe
            qv[grp * kc + j] = v_j
            start_dma(grp * kc + j, k_safe)

    for g in range(NG):
        pick_group(g)

    # Per-ray w = d x o, hoisted out of the cluster loop.
    wx = dy * oz - dz * oy
    wy = dz * ox - dx * oz
    wz = dx * oy - dy * ox

    lane_row = jax.lax.broadcasted_iota(i32, (1, c), 1)

    if mxu:
        # Ray matrix for the MXU path: [d, w, o, 1, pad] per ray; all four
        # Möller–Trumbore quantities are linear in these 10 values, so one
        # (TS, 16) @ (16, 4C) matmul per cluster computes them (see
        # accel/clusters.py gblock packing).
        ones = jnp.ones((ts, 1), f32)
        zeros = jnp.zeros((ts, 1), f32)
        rmat = jnp.concatenate(
            [dx, dy, dz, wx, wy, wz, ox, oy, oz, ones] + [zeros] * 6,
            axis=1,
        )  # (TS, 16)

    def test_cluster(grp, j):
        """One (TS, C) Möller–Trumbore pass against queue slot (grp, j).

        Returns (dist (TS, C), code (1, C)): per-pair hit distance (INF on
        reject) and the global slot code.  No per-cluster reduction — the
        trip body reduces all K clusters at once.  Past-the-end slots carry
        dummy re-fetches of a real cluster; re-testing any cluster is
        harmless (the MT test is exact and the strict-min update only ever
        takes candidates below each ray's cap), so no validity mask is
        needed.  Cluster padding rows are all-zero => det == 0 => rejected
        by the det sign test, so no triangle-id >= 0 check is needed
        either."""
        slot = grp * kc + j
        k_i = qk[slot]
        g = buf[slot]  # (24, C) exact / (24, 4C) mxu
        if mxu:
            # One MXU matmul yields all four det-space quantities for the
            # whole cluster: R (TS, 16) @ G (16, 4C) -> [det|udet|vdet|tdet]
            # column blocks.  f32 inputs with preferred f32 accumulate.
            # Mosaic lowers only DEFAULT (one bf16 pass — flips ~half the
            # winners, unusable) and HIGHEST (x6 bf16 passes, near-exact);
            # HIGH (x3) is not implemented in the Pallas TPU lowering.
            out = jnp.dot(rmat, g[0:16, :], preferred_element_type=f32,
                          precision={
                              "default": jax.lax.Precision.DEFAULT,
                              "highest": jax.lax.Precision.HIGHEST,
                          }[mxu_precision])
            det = out[:, 0:c]
            udet = out[:, c:2 * c]
            vdet = out[:, 2 * c:3 * c]
            tdet = out[:, 3 * c:4 * c]
        else:
            row = lambda r: g[r:r + 1, :]  # (1, C)
            nx, ny, nz = row(0), row(1), row(2)

            # Möller–Trumbore in triple-product form, acceptance in
            # det-multiplied space (no per-pair reciprocal).  Division only
            # for the hit distance of accepted pairs.
            det = dx * nx + dy * ny + dz * nz
            udet = (wx * row(6) + wy * row(7) + wz * row(8)
                    + dx * row(3) + dy * row(4) + dz * row(5))
            vdet = (wx * row(12) + wy * row(13) + wz * row(14)
                    + dx * row(9) + dy * row(10) + dz * row(11))
            tdet = row(15) - (ox * nx + oy * ny + oz * nz)
        # Shared det-space acceptance (core/intersect.py — one definition
        # for this kernel and the ring's dense fallback).
        from raytpu.core.intersect import (det_space_accept,
                                           det_space_accept_within)

        if any_hit:
            # Occlusion query: no distance, no winner — one det-space
            # bound check and an any-reduce.  Skips the per-pair divide,
            # the min-reduce and all best_t/best_code bookkeeping (the
            # boolean is the entire contract — nearest_hit docstring).
            okw = det_space_accept_within(det, udet, vdet, tdet, tmax0,
                                          cull)
            if has_ignore:
                if mxu:
                    ids = jax.lax.bitcast_convert_type(g[16:17, :], i32)
                    tid = ids[:, 0:c]
                    tmesh = ids[:, c:2 * c]
                else:
                    tid = jax.lax.bitcast_convert_type(g[16:17, :], i32)
                    tmesh = jax.lax.bitcast_convert_type(g[17:18, :], i32)
                okw &= (tid != itri) & (tmesh != imesh)
            return jnp.any(okw, axis=1, keepdims=True), None, None

        ok = det_space_accept(det, udet, vdet, tdet, cull)

        if has_ignore:
            if mxu:
                ids = jax.lax.bitcast_convert_type(g[16:17, :], i32)
                tid = ids[:, 0:c]
                tmesh = ids[:, c:2 * c]
            else:
                tid = jax.lax.bitcast_convert_type(g[16:17, :], i32)
                tmesh = jax.lax.bitcast_convert_type(g[17:18, :], i32)
            ok &= (tid != itri) & (tmesh != imesh)

        dist = jnp.where(ok, tdet / det, INF)
        code = k_i * c + lane_row  # (1, C)
        if not uvt:
            return dist, code, None
        if mxu:
            tid_i = jax.lax.bitcast_convert_type(g[16:17, :], i32)[:, 0:c]
        else:
            tid_i = jax.lax.bitcast_convert_type(g[16:17, :], i32)
        # Triangle id as an exact f32 VALUE (ids < 2^24 — asserted at bake
        # time): lets the winner extraction below ride the same one-hot
        # float sums as the det-space quantities.
        return dist, code, (udet, vdet, det, tid_i.astype(f32))

    # Per-ray reciprocal directions for the slab pretest, hoisted — in
    # LANE-MAJOR (1, TS) layout: a (TS, 1) f32 vector occupies TS/8 vregs
    # at 1/128 lane utilization, so a (TS, 1) slab test costs nearly as
    # much as the full (TS, C) Möller–Trumbore pass it is meant to skip;
    # the same test on (1, TS) is ~16x cheaper (see the prologue note).
    inv_d_lm = [1.0 / jnp.where(dk == 0.0, f32(1e-30), dk)
                for dk in (dxr, dyr, dzr)]
    o_lm = (oxr, oyr, ozr)

    def slab_viable(g, cap_lm):
        """Scalar: can this cluster improve any unresolved ray's best?

        Exact per-ray slab test against the cluster's own AABB (rows 18-23
        of the DMA'd block, margin-expanded), ~36 lane-major (1, TS) VPU
        ops — ~6% of the (TS, C) Möller–Trumbore pass it can skip.  The
        tile-level cull is conservative over the whole beam, so many walked
        clusters intersect *no* individual ray, and once best_t tightens,
        clusters behind every unresolved ray's hit cannot improve either.
        Skipping is exact: a skipped cluster has no triangle hit closer
        than best_t for any unresolved ray, and resolved rays are final.
        ``cap_lm`` (1, TS): -INF for resolved rays, min(best_t, tmax)
        otherwise.  NaN (dead) lanes compare false throughout."""
        t_en = jnp.full((1, ts), -INF, f32)
        t_ex = jnp.full((1, ts), INF, f32)
        for k in range(3):
            mn_k = jnp.max(g[18 + k:19 + k, :]) - margin
            mx_k = jnp.max(g[21 + k:22 + k, :]) + margin
            t1 = (mn_k - o_lm[k]) * inv_d_lm[k]
            t2 = (mx_k - o_lm[k]) * inv_d_lm[k]
            t_en = jnp.maximum(t_en, jnp.minimum(t1, t2))
            t_ex = jnp.minimum(t_ex, jnp.maximum(t1, t2))
        viable_r = (t_en <= t_ex) & (t_ex >= 0.0) & (t_en < cap_lm)
        return jnp.max(viable_r.astype(f32)) > 0.0

    bt_ref[:, :] = tmax0
    bc_ref[:, :] = jnp.full((ts, 1), -1, i32)
    if uvt:
        bu_ref[:, :] = jnp.zeros((ts, 1), f32)
        bv_ref[:, :] = jnp.zeros((ts, 1), f32)
        bd_ref[:, :] = jnp.ones((ts, 1), f32)
        bi_ref[:, :] = jnp.full((ts, 1), -1.0, f32)
    # Non-finite rays have cap == 0 => tmax0 <= 0 covers them, except a
    # non-finite tmax_in propagates NaN — fold both into the resolved init
    # (NaN slab math in slab_viable is also caught by ~resolved).
    fin_c = (
        jnp.isfinite(ox) & jnp.isfinite(oy) & jnp.isfinite(oz)
        & jnp.isfinite(dx) & jnp.isfinite(dy) & jnp.isfinite(dz)
    )
    rs_ref[:, :] = (~fin_c | ~(tmax0 > 0.0)).astype(f32)

    def body(state):
        i, cur_v = state
        grp = jax.lax.rem(i, NG)

        # Wait the whole group's DMAs up front (one fence point per trip
        # instead of a wait interleaved before every test), then run each
        # slot's test behind its slab pretest: the Möller–Trumbore pass is
        # skipped outright when no unresolved ray can improve.
        for j in range(kc):
            wait_dma(grp * kc + j, qk[grp * kc + j])
        if pretest:
            # One relayout per trip into lane-major; per-slot caps within a
            # trip are then 2-vreg ops.  Using the trip-entry best_t for
            # every slot of the trip is conservative (it only ever skips
            # less than a per-slot refresh would) — still exact.
            bt_lm = bt_ref[:, :].reshape(1, ts)
            res_lm = rs_ref[:, :].reshape(1, ts)
            cap_lm = jnp.where(res_lm > 0.0, -INF,
                               jnp.minimum(bt_lm, tmax_lm))
        for j in range(kc):
            g = buf[grp * kc + j]

            def do_test(j=j):
                if any_hit:
                    fnd, _, _ = test_cluster(grp, j)
                    bc_ref[:, :] = jnp.where(fnd, 0, bc_ref[:, :])
                    return
                dist, code, quants = test_cluster(grp, j)
                mint = jnp.min(dist, axis=1, keepdims=True)  # (TS, 1)
                # Lowest slot code among equals (ties within a cluster
                # resolve by lane order; across trips the strict-min keeps
                # the earlier — lower-entry — hit).
                win = dist == mint
                pc = jnp.min(jnp.where(win, code, i32(2 ** 30)),
                             axis=1, keepdims=True)
                bt = bt_ref[:, :]
                upd = mint < bt
                bt_ref[:, :] = jnp.where(upd, mint, bt)
                bc_ref[:, :] = jnp.where(upd, pc, bc_ref[:, :])
                if uvt:
                    # Winner extraction: one-hot (code == pc) row sums pull
                    # the winning pair's det-space quantities + triangle id
                    # out of the (TS, C) pass, so NO host-side gather or
                    # recompute is needed afterwards (the old epilogue's
                    # (R, 16) slotgeo gather alone cost as much as half the
                    # walk at 1M rays).  Unconditional: gating on "any ray
                    # improved" (pl.when) measured slower — the branch cost
                    # outweighs the rare skip.
                    one = (code == pc).astype(f32)  # exactly one lane/ray
                    ud, vd, dd, ti = quants
                    sums = lambda q: jnp.sum(one * q, axis=1, keepdims=True)
                    bu_ref[:, :] = jnp.where(upd, sums(ud), bu_ref[:, :])
                    bv_ref[:, :] = jnp.where(upd, sums(vd), bv_ref[:, :])
                    bd_ref[:, :] = jnp.where(upd, sums(dd), bd_ref[:, :])
                    bi_ref[:, :] = jnp.where(upd, sums(ti), bi_ref[:, :])

            if pretest:
                pl.when(slab_viable(g, cap_lm))(do_test)
            else:
                do_test()

        nxt = jax.lax.rem(i + 1, NG)
        v_next = qv[nxt * kc]
        vn = v_next & ~((1 << kbits) - 1)  # floored bound, id bits stripped
        best_t = bt_ref[:, :]
        # A ray is resolved once its best hit provably precedes every
        # untested cluster (entries are picked in nondecreasing order, and
        # a re-cull only ever *raises* a remaining cluster's entry, so
        # v_next lower-bounds everything still untested).  Resolution is
        # final: monotone, and proved against the entries in force at the
        # time.  Comparisons run in key space (module keyed-pick note).
        if any_hit:
            # Occlusion query: resolved = found *some* hit inside the
            # bound, or provably clear.
            res_new = (bc_ref[:, :] >= 0) | (_f32_bits(tmax0) <= vn)
        else:
            res_new = _f32_bits(best_t) <= vn
        resolved = (rs_ref[:, :] > 0.0) | res_new
        rs_ref[:, :] = resolved.astype(f32)

        if recull_every:
            @pl.when(jax.lax.rem(i + 1, recull_every) == 0)
            def _recull():
                # Rebuild the entry grid from the *unresolved* beam only:
                # settled rays stop inflating the tile bounds, so entries
                # tighten, far clusters fall out (entry >= every unresolved
                # ray's current best), and the walk settles sooner.
                # Consumed clusters stay consumed (``done``).
                wcap = jnp.max(jnp.where(
                    ~resolved, jnp.minimum(best_t, tmax0), f32(-INF)))
                unresolved_r = rs_ref[:, :].reshape(1, ts) <= 0.0
                grid = entry_grid(finite & unresolved_r, wcap)
                ent[:, :] = jnp.where(done[:, :] > 0.0, i32(_KEY_CLEAR),
                                      _make_keys(grid, flat_io, kbits))

        # Refill this group with the next K picks (to be tested at i+NG).
        pick_group(grp)

        settled = jnp.all(resolved)
        cur_next = jnp.where(settled, i32(_KEY_CLEAR), v_next)
        return i + 1, cur_next

    def cond(state):
        # ``max_trips`` bounds the walk (two-phase driver: phase 1 runs on
        # a budget, survivors re-tile into phase 2); 0 = walk to settle.
        # Drained/settled keys carry an INF exponent => >= _KEY_INF.
        live = state[1] < _KEY_INF
        if max_trips:
            live &= state[0] < max_trips
        return live

    iters, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), qv[0]))
    best_t = bt_ref[:, :]
    best_code = bc_ref[:, :]

    # Drain: every started-but-unconsumed DMA must be waited.  Every queue
    # slot of both groups has a DMA in flight (dummy fetches included), so
    # the drain is unconditional.
    for slot in range(NG * kc):
        wait_dma(slot, qk[slot])

    if any_hit:
        # Cheap mode never tracked distances; report t = 0 for hits so the
        # caller's ``t < sdist`` occlusion check holds (only the boolean is
        # contractually meaningful — nearest_hit docstring).
        out_t[0, 0, :] = jnp.where(best_code >= 0, f32(0.0), best_t)[:, 0]
    else:
        out_t[0, 0, :] = best_t[:, 0]
    out_code[0, 0, :] = best_code[:, 0]
    if uvt:
        # Winner (u, v) by ONE division per ray from the extracted
        # det-space quantities — the same values and rounding the old
        # host-side epilogue recomputed from its slotgeo gather.  No-hit
        # rays carry det=1 / udet=vdet=0 / tid=-1 from init.
        hitm = best_code >= 0
        safe_det = jnp.where(hitm, bd_ref[:, :], f32(1.0))
        out_uvt[0, 0, :] = (bu_ref[:, :] / safe_det)[:, 0]
        out_uvt[0, 1, :] = (bv_ref[:, :] / safe_det)[:, 0]
        out_uvt[0, 2, :] = bi_ref[:, :][:, 0]
        out_uvt[0, 3, :] = jnp.zeros((ts, 1), f32)[:, 0]
    out_res[0, 0, :] = (rs_ref[:, :] > 0.0).astype(i32)[:, 0]
    out_iters[0, 0, 0] = iters


def _prepick_kernel(
    root_ref,  # (1, 8) SMEM: root_min xyz, root_max xyz, margin, pad
    rays,      # (ROWS, TS) VMEM packed rays (column slice of (ROWS, R))
    aabb,      # (6, 8, NC8) VMEM cluster AABBs
    block_hbm,  # (NC, 24, C) ANY packed cluster geometry
    out_t, out_code, out_uvt, out_res, out_iters,
    ent,       # (8, NC8) VMEM scratch: remaining entry bounds
    bt_ref, bc_ref, rs_ref, bu_ref, bv_ref, bd_ref, bi_ref,  # (TS, 1)
    qk,        # (F,) SMEM: picked cluster ids, front-to-back
    qv,        # (F,) SMEM: picked entry bounds, nondecreasing
    buf,       # (NBUF, 24, C) VMEM DMA ring
    sem,       # DMA semaphores (NBUF,)
    *,
    cull: bool,
    any_hit: bool,
    nc: int,
    nbuf: int,
    f_max: int,
    has_ignore: bool = True,
    uvt: bool = False,
):
    """Pick-then-walk variant of ``_fused_kernel``.

    The classic walk interleaves entry-grid argmin picks with cluster
    tests, so every loop trip carries the pick's serial VMEM round-trips
    and its DMA lookahead is speculative (dummy fetches past settle).
    Here the front-to-back order is extracted *up front*: one bounded pick
    loop drains the entry grid into SMEM (``qk``/``qv``, at most ``f_max``
    picks — cheap: ~25 VPU ops on the (8, NC8) grid per pick), then a lean
    walk streams exactly those clusters through an ``nbuf``-deep DMA ring
    with precise prefetch (ids are known, nothing speculative) and a loop
    body that is just test + strict-min update + settle check.

    Semantics are identical to the classic kernel (same entry order, same
    tie resolution, same resolve proof) EXCEPT when a tile has more than
    ``f_max`` feasible clusters: the walk then stops after ``f_max`` and
    the unproven rays come back unresolved (``out_res`` 0) with their
    best-so-far as a true candidate — exactly the classic ``max_trips``
    contract; ``nearest_hit_fused`` finishes them with a rescue pass.
    ``qv`` is sized f_max+1: the slot past the last pick holds the tail
    bound (min entry over everything unpicked; INF when drained), which is
    what the overflow resolve-proof compares against.
    """
    ts = rays.shape[1]
    c = buf.shape[2]
    f32 = jnp.float32
    i32 = jnp.int32
    nc8 = aabb.shape[2]

    from raytpu.core.intersect import (det_space_accept,
                                       det_space_accept_within)

    row = lambda r: rays[r:r + 1, :]  # (1, TS) lane-major
    oxr, oyr, ozr = row(0), row(1), row(2)
    dxr, dyr, dzr = row(3), row(4), row(5)
    tmax_in = row(6)

    col = lambda r: rays[r, :].reshape(ts, 1)
    ox, oy, oz = col(0), col(1), col(2)
    dx, dy, dz = col(3), col(4), col(5)
    itri = jax.lax.bitcast_convert_type(col(7), i32)
    imesh = jax.lax.bitcast_convert_type(col(8), i32)

    finite, tmax_lm = _finite_and_cap_lm(
        root_ref, (oxr, oyr, ozr), (dxr, dyr, dzr), tmax_in)
    tile_tmax = jnp.max(tmax_lm)
    tmax0 = tmax_lm.reshape(ts, 1)

    row_io = jax.lax.broadcasted_iota(i32, (8, nc8), 0)
    col_io = jax.lax.broadcasted_iota(i32, (8, nc8), 1)
    flat_io = row_io * nc8 + col_io
    valid_col = flat_io < nc

    ent[:, :] = _entry_grid(
        aabb, valid_col,
        _tile_bounds_lm(finite, (oxr, oyr, ozr), (dxr, dyr, dzr)),
        tile_tmax)

    # ---- Pick phase: drain the entry grid front-to-back into SMEM ----
    def pick_body(state):
        s, _ = state
        e = ent[:, :]
        v = jnp.min(e)
        k = jnp.min(jnp.where(e == v, flat_io, i32(nc)))
        ent[:, :] = jnp.where(flat_io == k, INF, e)
        qk[s] = jnp.minimum(k, i32(nc - 1))
        qv[s] = v
        return s + 1, (v < INF) & (s + 1 < f_max)

    n_picked, _ = jax.lax.while_loop(
        lambda st: st[1], pick_body, (jnp.int32(0), jnp.asarray(True)))
    # Tail bound: everything unpicked has entry >= this (INF when drained).
    # The last pick may itself be INF (grid drained inside the loop) —
    # either way qv is nondecreasing and the walk stops at the first INF.
    qv[f_max] = jnp.min(ent[:, :])

    def start_dma(slot, k):
        pltpu.make_async_copy(block_hbm.at[k], buf.at[slot],
                              sem.at[slot]).start()

    def wait_dma(slot, k):
        pltpu.make_async_copy(block_hbm.at[k], buf.at[slot],
                              sem.at[slot]).wait()

    def pf(s):
        """Prefetch id for virtual slot s (clamped: never reads junk)."""
        return qk[jnp.clip(s, 0, n_picked - 1)]

    for j in range(nbuf):
        start_dma(j, pf(j))

    # Per-ray w = d x o, hoisted.
    wx = dy * oz - dz * oy
    wy = dz * ox - dx * oz
    wz = dx * oy - dy * ox
    lane_row = jax.lax.broadcasted_iota(i32, (1, c), 1)

    bt_ref[:, :] = tmax0
    bc_ref[:, :] = jnp.full((ts, 1), -1, i32)
    if uvt:
        bu_ref[:, :] = jnp.zeros((ts, 1), f32)
        bv_ref[:, :] = jnp.zeros((ts, 1), f32)
        bd_ref[:, :] = jnp.ones((ts, 1), f32)
        bi_ref[:, :] = jnp.full((ts, 1), -1.0, f32)
    fin_c = (
        jnp.isfinite(ox) & jnp.isfinite(oy) & jnp.isfinite(oz)
        & jnp.isfinite(dx) & jnp.isfinite(dy) & jnp.isfinite(dz)
    )
    rs_ref[:, :] = (~fin_c | ~(tmax0 > 0.0)).astype(f32)

    def wbody(state):
        s, _ = state
        slot = jax.lax.rem(s, nbuf)
        wait_dma(slot, pf(s))
        g = buf[slot]
        k_i = qk[s]

        row_g = lambda r: g[r:r + 1, :]  # (1, C)
        nx, ny, nz = row_g(0), row_g(1), row_g(2)
        det = dx * nx + dy * ny + dz * nz
        udet = (wx * row_g(6) + wy * row_g(7) + wz * row_g(8)
                + dx * row_g(3) + dy * row_g(4) + dz * row_g(5))
        vdet = (wx * row_g(12) + wy * row_g(13) + wz * row_g(14)
                + dx * row_g(9) + dy * row_g(10) + dz * row_g(11))
        tdet = row_g(15) - (ox * nx + oy * ny + oz * nz)

        if any_hit:
            okw = det_space_accept_within(det, udet, vdet, tdet, tmax0,
                                          cull)
            if has_ignore:
                tid = jax.lax.bitcast_convert_type(g[16:17, :], i32)
                tmesh = jax.lax.bitcast_convert_type(g[17:18, :], i32)
                okw &= (tid != itri) & (tmesh != imesh)
            fnd = jnp.any(okw, axis=1, keepdims=True)
            bc_ref[:, :] = jnp.where(fnd, 0, bc_ref[:, :])
        else:
            ok = det_space_accept(det, udet, vdet, tdet, cull)
            if has_ignore:
                tid = jax.lax.bitcast_convert_type(g[16:17, :], i32)
                tmesh = jax.lax.bitcast_convert_type(g[17:18, :], i32)
                ok &= (tid != itri) & (tmesh != imesh)
            dist = jnp.where(ok, tdet / det, INF)
            code = k_i * c + lane_row  # (1, C)
            mint = jnp.min(dist, axis=1, keepdims=True)  # (TS, 1)
            win = dist == mint
            pc = jnp.min(jnp.where(win, code, i32(2 ** 30)),
                         axis=1, keepdims=True)
            bt = bt_ref[:, :]
            upd = mint < bt
            bt_ref[:, :] = jnp.where(upd, mint, bt)
            bc_ref[:, :] = jnp.where(upd, pc, bc_ref[:, :])
            if uvt:
                one = (code == pc).astype(f32)
                tid_f = jax.lax.bitcast_convert_type(
                    g[16:17, :], i32).astype(f32)
                sums = lambda q: jnp.sum(one * q, axis=1, keepdims=True)
                bu_ref[:, :] = jnp.where(upd, sums(udet), bu_ref[:, :])
                bv_ref[:, :] = jnp.where(upd, sums(vdet), bv_ref[:, :])
                bd_ref[:, :] = jnp.where(upd, sums(det), bd_ref[:, :])
                bi_ref[:, :] = jnp.where(upd, sums(tid_f), bi_ref[:, :])

        # Precise prefetch: the id nbuf trips ahead is already known.
        start_dma(slot, pf(s + nbuf))

        v_next = jnp.where(s + 1 < n_picked,
                           qv[jnp.clip(s + 1, 0, f_max)], qv[f_max])
        if any_hit:
            res_new = (bc_ref[:, :] >= 0) | (tmax0 <= v_next)
        else:
            res_new = bt_ref[:, :] <= v_next
        resolved = (rs_ref[:, :] > 0.0) | res_new
        rs_ref[:, :] = resolved.astype(f32)
        settled = jnp.all(resolved)

        nxt_live = ((s + 1 < n_picked) & ~settled
                    & (qv[jnp.clip(s + 1, 0, f_max)] < INF))
        return s + 1, nxt_live

    live0 = ((qv[0] < INF)
             & ~jnp.all(rs_ref[:, :] > 0.0))
    s_end, _ = jax.lax.while_loop(lambda st: st[1], wbody,
                                  (jnp.int32(0), live0))

    # Drain: every slot has exactly one outstanding copy — slot
    # (s_end + j) % nbuf last issued pf(s_end + j) (initially for
    # s_end <= j, re-issued at trip s_end + j - nbuf otherwise).
    for j in range(nbuf):
        wait_dma(jax.lax.rem(s_end + j, nbuf), pf(s_end + j))

    best_t = bt_ref[:, :]
    best_code = bc_ref[:, :]
    if any_hit:
        out_t[0, 0, :] = jnp.where(best_code >= 0, f32(0.0), best_t)[:, 0]
    else:
        out_t[0, 0, :] = best_t[:, 0]
    out_code[0, 0, :] = best_code[:, 0]
    if uvt:
        hitm = best_code >= 0
        safe_det = jnp.where(hitm, bd_ref[:, :], f32(1.0))
        out_uvt[0, 0, :] = (bu_ref[:, :] / safe_det)[:, 0]
        out_uvt[0, 1, :] = (bv_ref[:, :] / safe_det)[:, 0]
        out_uvt[0, 2, :] = bi_ref[:, :][:, 0]
        out_uvt[0, 3, :] = jnp.zeros((ts, 1), f32)[:, 0]
    out_res[0, 0, :] = (rs_ref[:, :] > 0.0).astype(i32)[:, 0]
    out_iters[0, 0, 0] = s_end


def _tlane_kernel(
    root_ref,  # (1, 8) SMEM
    rays,      # (ROWS, TS) VMEM packed rays (lane-major rows)
    saabb,     # (SUBK*6, 8, NC8) VMEM per-sibling AABB cull planes
    *args,     # [splane (SUBK*5, 8, NC8)] block_hbm, outputs, scratch
    cull,
    any_hit: bool,
    nc: int,
    k_chunk: int,
    ngrp: int = NGRP,
    has_ignore: bool = True,
    max_trips: int = 0,
    uvt: bool = False,
    subk: int = 1,
    use_plane: bool = False,
    gate: bool = True,
    rows: bool = False,
):
    """Transposed-layout walk: pair matrix (C, TS), rays in LANES.

    Same walk as ``_fused_kernel`` (strict-min update, settle proof,
    tie-break by slot code), but the Möller–Trumbore pass runs on a
    (C, TS) grid — triangle t in sublane t, ray r in lane r.  Each fetched
    (32, 128) geometry block is flipped to (128, 32) with ONE hardware
    transpose per trip (DMA slices must stay 128-lane-aligned, so the
    transposed form cannot be stored in HBM).  What the layout buys on a
    VPU:

    - every per-ray reduction (min dist, winner code, the uvt one-hot
      sums) runs ACROSS SUBLANES: a log-tree of full-width vector ops
      (~36 vreg-ops for (128, 256) -> (1, 256)) instead of in-lane
      shuffle reductions (~224) — the reduces were ~40% of a nearest-hit
      trip;
    - ALL per-ray state lives in lane-major (1, TS) vregs (2 per op)
      instead of (TS, 1) column layout (32 per op at 1/128 lane
      utilization), which removes the per-ray prologue/init/epilogue
      waste measured at ~15 ms per 1M-ray query (tools/r4lab3-5);
    - outputs write straight from the (1, TS) state — no relayouts.

    **Subclusters** (``subk`` > 1, r5): blocks pack ``subk`` spatial
    leaves of ``csub = 128 // subk`` triangles (accel/clusters.py);
    culling and entry ordering run per LEAF (``saabb``/``splane`` grids),
    the walk picks whole BLOCKS by their min-sibling entry, and each
    sibling's (csub, TS) pass — HALF/QUARTER the per-trip vregs, only
    possible in this layout where triangles sit on 8-granular sublanes —
    runs behind a ``pl.when`` gate that skips it when its own entry bound
    cannot beat any unresolved ray (``capmax``).  Exact: a skipped
    sibling provably contains no improving hit for any unresolved ray,
    resolved rays are final, and the settle proof's ``v_next`` is the
    next block's min-sibling entry, a true lower bound on everything
    unconsumed.  Equal-t ties between siblings of one block resolve by
    sibling order, not entry order (same class of documented tie freedom
    as ``chunk_k``).  ``use_plane``: intersect each leaf's entry interval
    with its fitted-plane interval (``_entry_grid`` plane path).

    Classic-walk-only knobs (mxu, pretest, recull) are not carried; at
    subk == 1 without planes the results are bitwise the classic
    kernel's (same arithmetic, same order — only the layout differs).
    """
    i_arg = 0
    splane = None
    if use_plane:
        splane = args[0]
        i_arg = 1
    rest = list(args[i_arg:])
    sblock_hbm = rest.pop(1) if rows else None  # after block_hbm
    out_rows = rest.pop(6) if rows else None    # after out_iters
    if subk > 1:
        (block_hbm, out_t, out_code, out_uvt, out_res, out_iters,
         ent, esub, bt_ref, bc_ref, rs_ref, bu_ref, bv_ref, bd_ref,
         bi_ref, qk, qv, qs, buf, sem) = rest
    else:
        (block_hbm, out_t, out_code, out_uvt, out_res, out_iters,
         ent, bt_ref, bc_ref, rs_ref, bu_ref, bv_ref, bd_ref,
         bi_ref, qk, qv, buf, sem) = rest
        esub = qs = None

    ts = rays.shape[1]
    c = buf.shape[2]
    csub = c // subk
    f32 = jnp.float32
    i32 = jnp.int32
    nc8 = saabb.shape[2]

    from raytpu.core.intersect import (det_space_accept,
                                       det_space_accept_within)

    row = lambda r: rays[r:r + 1, :]  # (1, TS)
    oxr, oyr, ozr = row(0), row(1), row(2)
    dxr, dyr, dzr = row(3), row(4), row(5)
    tmax_in = row(6)
    itri = jax.lax.bitcast_convert_type(row(7), i32)
    imesh = jax.lax.bitcast_convert_type(row(8), i32)

    finite, tmax0 = _finite_and_cap_lm(
        root_ref, (oxr, oyr, ozr), (dxr, dyr, dzr), tmax_in)
    # tmax0 stays lane-major (1, TS) in this kernel.
    tile_tmax = jnp.max(tmax0)

    row_io = jax.lax.broadcasted_iota(i32, (8, nc8), 0)
    col_io = jax.lax.broadcasted_iota(i32, (8, nc8), 1)
    flat_io = row_io * nc8 + col_io
    valid_col = flat_io < nc

    # Per-sibling cull tables ride as flat 3D (SUBK*6, 8, NC8) rows —
    # 4D VMEM blocks measured ~2.6x slower end-to-end on v5e (r5lab3) —
    # and _entry_grid indexes them through row tuples.
    bounds = _tile_bounds_lm(finite, (oxr, oyr, ozr), (dxr, dyr, dzr))
    e_min = None
    for h in range(subk):
        ab_h = tuple(saabb[h * 6 + k] for k in range(6))
        pl_h = (tuple(splane[h * 5 + j] for j in range(5))
                if use_plane else None)
        e_h = _entry_grid(ab_h, valid_col, bounds, tile_tmax, plane=pl_h)
        if subk > 1:
            # Sibling bounds as raw f32 bit patterns: exact int order for
            # the non-negative entries, no scalar bitcasts at the gate.
            esub[h] = _f32_bits(e_h)
        e_min = e_h if e_min is None else jnp.minimum(e_min, e_h)
    kbits = _key_bits(8 * nc8)
    low_mask = (1 << kbits) - 1
    ent[:, :] = _make_keys(e_min, flat_io, kbits)

    NG = ngrp
    kc = min(k_chunk, nc)

    def pick():
        # Keyed single-reduce argmin (module-level keyed-pick note).
        ik = ent[:, :]
        kv = jnp.min(ik)
        picked = ik == kv  # keys are unique (id in the low bits)
        ent[:, :] = jnp.where(picked, i32(_KEY_CLEAR), ik)
        return kv, kv & low_mask, picked

    def start_dma(slot, k):
        pltpu.make_async_copy(block_hbm.at[k], buf.at[slot],
                              sem.at[slot]).start()

    def wait_dma(slot, k):
        pltpu.make_async_copy(block_hbm.at[k], buf.at[slot],
                              sem.at[slot]).wait()

    def pick_group(grp):
        for j in range(kc):
            slot = grp * kc + j
            v_j, k_j, picked = pick()
            k_safe = jnp.minimum(k_j, i32(nc - 1))
            qk[slot] = k_safe
            qv[slot] = v_j
            if subk > 1:
                # Per-sibling entries ride the queue: the trip gates each
                # sibling's pass on its OWN bound.  Dummy (exhausted)
                # picks match no grid cell => all-clear => zero compute.
                for h in range(subk):
                    qs[slot * subk + h] = jnp.min(
                        jnp.where(picked, esub[h], i32(_KEY_CLEAR)))
            start_dma(slot, k_safe)

    for g in range(NG):
        pick_group(g)

    # Per-ray w = d x o, lane-major (2-vreg ops).
    wx = dyr * ozr - dzr * oyr
    wy = dzr * oxr - dxr * ozr
    wz = dxr * oyr - dyr * oxr

    sub_row = jax.lax.broadcasted_iota(i32, (csub, 1), 0)

    bt_ref[:, :] = tmax0
    bc_ref[:, :] = jnp.full((1, ts), -1, i32)
    if uvt:
        bu_ref[:, :] = jnp.zeros((1, ts), f32)
        bv_ref[:, :] = jnp.zeros((1, ts), f32)
        bd_ref[:, :] = jnp.ones((1, ts), f32)
        bi_ref[:, :] = jnp.full((1, ts), -1.0, f32)
    rs_ref[:, :] = (~finite | ~(tmax0 > 0.0)).astype(f32)

    def body(state):
        i, cur_v = state
        grp = jax.lax.rem(i, NG)
        for j in range(kc):
            wait_dma(grp * kc + j, qk[grp * kc + j])
        # Trip-time cap: the farthest distance any UNRESOLVED ray still
        # cares about (min of its best and its t bound).  A sibling whose
        # conservative entry is not below it cannot improve any ray —
        # skip its whole (csub, TS) pass.  Exact (see docstring).
        # ``gate=False`` disables the skip branches (A/B control: r4
        # measured pl.when around the uvt update slower than the work it
        # saved; results are identical either way).
        if gate:
            # Key-space cap: -INF sentinels bitcast to NEGATIVE ints, so
            # they stay below every non-negative entry key under max.
            capmax = jnp.max(_f32_bits(
                jnp.where(rs_ref[:, :] > 0.0, f32(-INF),
                          jnp.minimum(bt_ref[:, :], tmax0))))
        for j in range(kc):
            slot = grp * kc + j
            # One hardware transpose flips the fetched (32, C) block to
            # (C, 32): triangles land on sublanes, channels on lanes.
            gt = jnp.transpose(buf[slot])  # (C, 32)
            k_i = qk[slot]

            def do_sib(h, gt=gt, k_i=k_i):
                g = gt[h * csub:(h + 1) * csub, :]  # (csub, 32) static
                col = lambda q: g[:, q:q + 1]  # (csub, 1)
                nx, ny, nz = col(0), col(1), col(2)
                det = dxr * nx + dyr * ny + dzr * nz  # (csub, TS)
                udet = (wx * col(6) + wy * col(7) + wz * col(8)
                        + dxr * col(3) + dyr * col(4) + dzr * col(5))
                vdet = (wx * col(12) + wy * col(13) + wz * col(14)
                        + dxr * col(9) + dyr * col(10) + dzr * col(11))
                tdet = col(15) - (oxr * nx + oyr * ny + ozr * nz)

                if any_hit:
                    okw = det_space_accept_within(det, udet, vdet, tdet,
                                                  tmax0, cull)
                    if has_ignore:
                        tid = jax.lax.bitcast_convert_type(col(16), i32)
                        tmesh = jax.lax.bitcast_convert_type(col(17), i32)
                        okw &= (tid != itri) & (tmesh != imesh)
                    fnd = jnp.any(okw, axis=0, keepdims=True)  # (1, TS)
                    bc_ref[:, :] = jnp.where(fnd, 0, bc_ref[:, :])
                else:
                    ok = det_space_accept(det, udet, vdet, tdet, cull)
                    if has_ignore:
                        tid = jax.lax.bitcast_convert_type(col(16), i32)
                        tmesh = jax.lax.bitcast_convert_type(col(17), i32)
                        ok &= (tid != itri) & (tmesh != imesh)
                    dist = jnp.where(ok, tdet / det, INF)
                    code = k_i * c + h * csub + sub_row  # (csub, 1)
                    mint = jnp.min(dist, axis=0, keepdims=True)  # (1, TS)
                    win = dist == mint
                    pc = jnp.min(jnp.where(win, code, i32(2 ** 30)),
                                 axis=0, keepdims=True)
                    bt = bt_ref[:, :]
                    upd = mint < bt
                    bt_ref[:, :] = jnp.where(upd, mint, bt)
                    bc_ref[:, :] = jnp.where(upd, pc, bc_ref[:, :])
                    if uvt:
                        one = (code == pc).astype(f32)  # (csub, TS)
                        tid_f = jax.lax.bitcast_convert_type(
                            col(16), i32).astype(f32)
                        sums = lambda q: jnp.sum(one * q, axis=0,
                                                 keepdims=True)
                        bu_ref[:, :] = jnp.where(upd, sums(udet),
                                                 bu_ref[:, :])
                        bv_ref[:, :] = jnp.where(upd, sums(vdet),
                                                 bv_ref[:, :])
                        bd_ref[:, :] = jnp.where(upd, sums(det),
                                                 bd_ref[:, :])
                        bi_ref[:, :] = jnp.where(upd, sums(tid_f),
                                                 bi_ref[:, :])

            for h in range(subk):
                if gate:
                    # qv keys carry id bits: strip them so the bound never
                    # overstates the true entry (skipping stays exact).
                    vh = (qs[slot * subk + h] if subk > 1
                          else qv[slot] & ~low_mask)
                    pl.when(vh < capmax)(functools.partial(do_sib, h))
                else:
                    do_sib(h)

        nxt = jax.lax.rem(i + 1, NG)
        v_next = qv[nxt * kc]
        vn = v_next & ~low_mask  # floored bound (key space)
        if any_hit:
            res_new = (bc_ref[:, :] >= 0) | (_f32_bits(tmax0) <= vn)
        else:
            res_new = _f32_bits(bt_ref[:, :]) <= vn
        resolved = (rs_ref[:, :] > 0.0) | res_new
        rs_ref[:, :] = resolved.astype(f32)

        pick_group(grp)

        settled = jnp.all(resolved)
        cur_next = jnp.where(settled, i32(_KEY_CLEAR), v_next)
        return i + 1, cur_next

    def cond(state):
        live = state[1] < _KEY_INF
        if max_trips:
            live &= state[0] < max_trips
        return live

    iters, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), qv[0]))

    for slot in range(NG * kc):
        wait_dma(slot, qk[slot])

    best_t = bt_ref[:, :]
    best_code = bc_ref[:, :]
    if any_hit:
        out_t[0, 0, :] = jnp.where(best_code >= 0, f32(0.0), best_t)[0, :]
    else:
        out_t[0, 0, :] = best_t[0, :]
    out_code[0, 0, :] = best_code[0, :]
    if uvt:
        hitm = best_code >= 0
        safe_det = jnp.where(hitm, bd_ref[:, :], f32(1.0))
        out_uvt[0, 0, :] = (bu_ref[:, :] / safe_det)[0, :]
        out_uvt[0, 1, :] = (bv_ref[:, :] / safe_det)[0, :]
        out_uvt[0, 2, :] = bi_ref[:, :][0, :]
        out_uvt[0, 3, :] = jnp.zeros((1, ts), f32)[0, :]
    out_res[0, 0, :] = (rs_ref[:, :] > 0.0).astype(i32)[0, :]
    out_iters[0, 0, 0] = iters

    if rows:
        # ---- In-kernel winner-row resolve ------------------------------
        # The XLA-side (R, 32) tri_shade gather costs ~59 ms per 1M rays
        # on v5e (~half the device frame, tools/r5lab16).  Here the tile
        # resolves its own winner rows: loop over the UNIQUE winner
        # blocks (typically 2-4 per settled 16x16-pixel tile), DMA each
        # block's cluster-ordered shade rows (``sblock`` bake), and pull
        # every ray's row out with a one-hot MXU contraction
        #     (32, C) @ (C, TS) -> (32, TS).
        # Exact: each f32 channel is split into three bf16 limbs
        # (hi/mid/lo, 8 significand bits each, exponent range == f32), the
        # one-hot rhs is exact in bf16, each output element receives
        # exactly ONE nonzero product (no accumulation rounding), and
        # hi + mid + lo reassembles the original f32 bit-for-bit.
        # rs_ref is dead after out_res above and becomes the remaining
        # mask; buf/sem slot 0 are drained and become the DMA slot.
        bf16 = jnp.bfloat16
        code_lm = bc_ref[:, :]  # (1, ts)
        row_io2 = jax.lax.broadcasted_iota(i32, (c, 1), 0)
        out_rows[0, :, :] = jnp.zeros((32, ts), f32)
        rs_ref[:, :] = (code_lm >= 0).astype(f32)
        BIGC = i32(2 ** 30)
        nslot = min(2, NG * kc)  # double-buffer when the walk ring allows

        def rslot(it):
            return jax.lax.rem(it, nslot) if nslot > 1 else 0

        def next_cluster(rem):
            codes = jnp.where(rem > 0.0, code_lm, BIGC)
            return jnp.min(codes) // c  # scalar winner block id

        # Prologue: fetch the first winner block.
        live0 = jnp.max(code_lm) >= 0
        c0 = next_cluster(rs_ref[:, :])
        c0 = jnp.minimum(c0, i32(nc - 1))

        @pl.when(live0)
        def _():
            pltpu.make_async_copy(sblock_hbm.at[c0], buf.at[0],
                                  sem.at[0]).start()

        def rbody(state):
            it, cstar, _ = state
            # Clear this block's rays and prefetch the NEXT winner block
            # into the other slot while this one's extraction runs.
            rem = jnp.where((code_lm // c) == cstar, f32(0.0),
                            rs_ref[:, :])
            rs_ref[:, :] = rem
            live_next = jnp.max(rem) > 0.0
            cnext = jnp.minimum(next_cluster(rem), i32(nc - 1))

            @pl.when(live_next & (nslot > 1))
            def _():
                pltpu.make_async_copy(sblock_hbm.at[cnext],
                                      buf.at[rslot(it + 1)],
                                      sem.at[rslot(it + 1)]).start()

            pltpu.make_async_copy(sblock_hbm.at[cstar], buf.at[rslot(it)],
                                  sem.at[rslot(it)]).wait()
            g = buf[rslot(it)]  # (32, C) channels x triangle slots
            hi = g.astype(bf16)
            r1 = g - hi.astype(f32)
            mid = r1.astype(bf16)
            lo = (r1 - mid.astype(f32)).astype(bf16)
            one = ((code_lm - cstar * c) == row_io2).astype(bf16)  # (C, TS)
            acc = (jnp.dot(hi, one, preferred_element_type=f32)
                   + jnp.dot(mid, one, preferred_element_type=f32)
                   + jnp.dot(lo, one, preferred_element_type=f32))
            out_rows[0, :, :] = out_rows[0, :, :] + acc

            @pl.when(live_next & (nslot == 1))
            def _():
                pltpu.make_async_copy(sblock_hbm.at[cnext],
                                      buf.at[0], sem.at[0]).start()

            return it + 1, cnext, live_next

        jax.lax.while_loop(lambda st: st[2], rbody, (jnp.int32(0), c0,
                                                     live0))


@functools.partial(
    jax.jit, static_argnames=("ts", "cull", "any_hit", "chunk_k", "ngrp",
                              "has_ignore", "mxu", "mxu_precision",
                              "recull_every", "pretest", "max_trips",
                              "uvt", "prepick", "nbuf", "layout",
                              "plane", "gate", "rows", "interpret")
)
def fused_tiles(rays_packed, aabb, root, block, saabb=None, splane=None,
                sblock=None,
                ts: int = 256,
                cull=True,
                any_hit: bool = False, chunk_k: int = 1, ngrp: int = NGRP,
                has_ignore: bool = True, mxu: bool = False,
                mxu_precision: str = "highest",
                recull_every: int = 0, pretest: bool = False,
                max_trips: int = 0, uvt: bool = False,
                prepick: int = 0, nbuf: int = 4, layout: str = "row",
                plane: bool = False, gate: bool = True,
                rows: bool = False,
                interpret: bool = False):
    """Run the fused kernel over (ROWS, NT*TS) packed rays, ``ts`` per tile.

    The pack layout IS the kernel layout (row r of ROWS, ray in lanes) —
    tiles are column slices, no transpose on either side.

    ``aabb``: (6, 8, NC8) cluster AABB planes; ``root``: (1, 8) root box +
    margin; ``block``: (NC, 24, C) packed geometry; ``chunk_k``: clusters
    tested per loop trip (overhead amortization — hit distances are
    identical for any value; exact-tie winners *across clusters within one
    trip* resolve by pick order under the per-slot strict-min update, so
    chunk_k can change which equidistant triangle wins).  ``uvt``: also
    maintain the winner's (u, v, triangle id) in-kernel (one-hot
    extraction per trip) so callers need no gather/recompute epilogue.

    ``prepick`` > 0 switches to the pick-then-walk kernel
    (``_prepick_kernel``): all front-to-back picks are extracted into SMEM
    first (at most ``prepick`` of them — overflow tiles come back
    unresolved for the caller's rescue pass), then a lean walk streams
    them through an ``nbuf``-deep DMA ring.  Incompatible with the
    classic-walk-only knobs (mxu, pretest, recull_every, chunk_k > 1,
    max_trips).

    Returns (best_t (NT, TS), code (NT, TS), uvt (NT, 4, TS) or None,
    resolved (NT, TS) 0/1, iters (NT,) loop trips).
    """
    nt = rays_packed.shape[1] // ts
    nc = block.shape[0]
    csize = block.shape[2]
    nc8 = aabb.shape[2]
    chunk_k = min(chunk_k, nc)
    f32, i32 = jnp.float32, jnp.int32

    base_specs = [
        pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        # Column slice of the (ROWS, R) pack — no transpose anywhere:
        # the host-side stack IS the kernel layout.
        pl.BlockSpec((ROWS, ts), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    if layout == "t":
        # Transposed (C, TS) pair layout (``block`` must be the tblock
        # bake).  Classic-walk-only knobs have no tlane equivalent.
        if mxu or pretest or recull_every or prepick:
            raise ValueError(
                "layout='t' is incompatible with mxu/pretest/recull_every/"
                "prepick")
        # Subcluster cull tables ride as FLAT 3D rows — (SUBK*6, 8, NC8) —
        # not 4D blocks: 4D VMEM residency measured ~2.6x slower
        # end-to-end on v5e (tools/r5lab3; the unchanged row kernel was
        # unaffected in the same process).  saabb None => csize-128 bake;
        # the block-level aabb stands in.  splane: fitted-plane rows
        # (None or plane=False => slab-only cull).
        subk = int(saabb.shape[0]) if saabb is not None else 1
        use_plane = bool(plane) and splane is not None
        use_rows = bool(rows) and sblock is not None and not any_hit
        saabb_eff = (saabb.reshape(subk * 6, 8, nc8)
                     if saabb is not None else aabb)
        kernel = functools.partial(
            _tlane_kernel, cull=cull, any_hit=any_hit, nc=nc,
            k_chunk=chunk_k, ngrp=ngrp, has_ignore=has_ignore,
            max_trips=max_trips, uvt=uvt, subk=subk, use_plane=use_plane,
            gate=gate, rows=use_rows)
        # Constant index maps: cull tables stay VMEM-resident across grid
        # steps instead of re-streaming per tile.
        in_specs = base_specs + [
            pl.BlockSpec((subk * 6, 8, nc8), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        call_inputs = [root, rays_packed, saabb_eff]
        if use_plane:
            in_specs.append(
                pl.BlockSpec((subk * 5, 8, nc8), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM))
            call_inputs.append(splane.reshape(subk * 5, 8, nc8))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        call_inputs.append(block)
        if use_rows:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            call_inputs.append(sblock)
        scratch = [
            pltpu.VMEM((8, nc8), i32),        # ent (keyed pick grid)
        ] + ([pltpu.VMEM((subk, 8, nc8), i32)] if subk > 1 else []) + [
            pltpu.VMEM((1, ts), f32),    # bt
            pltpu.VMEM((1, ts), i32),    # bc
            pltpu.VMEM((1, ts), f32),    # rs
            pltpu.VMEM((1, ts), f32),    # bu
            pltpu.VMEM((1, ts), f32),    # bv
            pltpu.VMEM((1, ts), f32),    # bd
            pltpu.VMEM((1, ts), f32),    # bi
            pltpu.SMEM((ngrp * chunk_k,), i32),  # qk
            pltpu.SMEM((ngrp * chunk_k,), i32),  # qv (int keys)
        ] + ([pltpu.SMEM((ngrp * chunk_k * subk,), i32)]
             if subk > 1 else []) + [
            pltpu.VMEM((ngrp * chunk_k, 32, csize), f32),
            pltpu.SemaphoreType.DMA((ngrp * chunk_k,)),
        ]
    elif prepick:
        if mxu or pretest or recull_every or max_trips or chunk_k > 1:
            raise ValueError(
                "prepick is incompatible with mxu/pretest/recull_every/"
                "max_trips/chunk_k>1 (classic-walk-only knobs)")
        kernel = functools.partial(
            _prepick_kernel, cull=cull, any_hit=any_hit, nc=nc, nbuf=nbuf,
            f_max=prepick, has_ignore=has_ignore, uvt=uvt)
        scratch = [
            pltpu.VMEM((8, nc8), f32),   # ent
            pltpu.VMEM((ts, 1), f32),    # bt
            pltpu.VMEM((ts, 1), i32),    # bc
            pltpu.VMEM((ts, 1), f32),    # rs
            pltpu.VMEM((ts, 1), f32),    # bu
            pltpu.VMEM((ts, 1), f32),    # bv
            pltpu.VMEM((ts, 1), f32),    # bd
            pltpu.VMEM((ts, 1), f32),    # bi
            pltpu.SMEM((prepick,), i32),      # qk
            pltpu.SMEM((prepick + 1,), f32),  # qv (+ tail bound)
            pltpu.VMEM((nbuf, 24, csize), f32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ]
        in_specs = base_specs + [
            pl.BlockSpec((6, 8, nc8), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        call_inputs = [root, rays_packed, aabb, block]
    else:
        # Block-level plane cull for the classic kernel: only csize-128
        # bakes carry block-granularity plane rows (sub_plane with
        # subk == 1); subcluster bakes' leaf planes cannot be combined.
        use_plane_row = (bool(plane) and splane is not None
                         and int(splane.shape[0]) == 1)
        kernel = functools.partial(
            _fused_kernel, cull=cull, any_hit=any_hit, nc=nc,
            k_chunk=chunk_k, ngrp=ngrp, has_ignore=has_ignore,
            mxu=mxu, mxu_precision=mxu_precision,
            recull_every=recull_every, pretest=pretest,
            max_trips=max_trips, uvt=uvt, use_plane=use_plane_row)
        scratch = [
            pltpu.VMEM((8, nc8), i32),  # ent (keyed pick grid)
            pltpu.VMEM((8, nc8), f32),  # done
            pltpu.VMEM((ts, 1), f32),
            pltpu.VMEM((ts, 1), i32),
            pltpu.VMEM((ts, 1), f32),
            pltpu.VMEM((ts, 1), f32),
            pltpu.VMEM((ts, 1), f32),
            pltpu.VMEM((ts, 1), f32),
            pltpu.VMEM((ts, 1), f32),
            pltpu.SMEM((ngrp * chunk_k,), i32),  # qk
            pltpu.SMEM((ngrp * chunk_k,), i32),  # qv (int keys)
            pltpu.VMEM((ngrp * chunk_k, 24, csize), f32),
            pltpu.SemaphoreType.DMA((ngrp * chunk_k,)),
        ]
        in_specs = base_specs + [
            # Constant index map: the AABB table stays resident in VMEM
            # across grid steps instead of re-streaming per tile.
            pl.BlockSpec((6, 8, nc8), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        call_inputs = [root, rays_packed, aabb]
        if use_plane_row:
            in_specs.append(
                pl.BlockSpec((5, 8, nc8), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM))
            call_inputs.append(splane.reshape(5, 8, nc8))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        call_inputs.append(block)

    use_rows = layout == "t" and bool(rows) and sblock is not None \
        and not any_hit
    outs = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=[
            # (1, 1, ts) / (1, 4, ts) blocks: Mosaic requires the last two
            # block dims be 8/128-divisible OR equal to the array dims —
            # the leading 1-sized/4-sized middle dim satisfies the latter.
            pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # uvt off (occlusion queries): collapse the winner-channel
            # output to one shared dummy block instead of an (NT, 4, TS)
            # array nobody writes or reads (~16 MB at 1M rays).
            (pl.BlockSpec((1, 4, ts), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
             if uvt else
             pl.BlockSpec((1, 4, ts), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)),
            pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ] + ([pl.BlockSpec((1, 32, ts), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)] if use_rows else []),
        out_shape=[
            jax.ShapeDtypeStruct((nt, 1, ts), f32),
            jax.ShapeDtypeStruct((nt, 1, ts), i32),
            jax.ShapeDtypeStruct((nt if uvt else 1, 4, ts), f32),
            jax.ShapeDtypeStruct((nt, 1, ts), i32),
            jax.ShapeDtypeStruct((nt, 1, 1), i32),
        ] + ([jax.ShapeDtypeStruct((nt, 32, ts), f32)]
             if use_rows else []),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*call_inputs)
    t, code, uvt_out, res, iters = outs[:5]
    rows_out = outs[5] if use_rows else None
    return (t.reshape(nt, ts), code.reshape(nt, ts),
            uvt_out if uvt else None, res.reshape(nt, ts),
            iters.reshape(nt), rows_out)


def _default_interpret() -> bool:
    from raytpu.utils.backend import on_accelerator

    return not on_accelerator()


def _pad_rows(a, tile, fill):
    n = a.shape[0]
    pad = (-n) % tile
    if pad:
        a = jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]
        )
    return a


def _pack_rays(o, d, itri, imesh, tmax, nt, ts):
    """Pack padded flat ray arrays into the kernel's (ROWS, R) layout.

    The row-major stack is already the kernel's per-tile layout (tiles are
    column slices) — the old (NT, ROWS, TS) transpose cost ~25 ms per 1M
    rays on v5e and is gone."""
    f32 = jnp.float32
    bits = lambda a: jax.lax.bitcast_convert_type(a, f32)
    return jnp.stack(
        [
            o[:, 0], o[:, 1], o[:, 2],
            d[:, 0], d[:, 1], d[:, 2],
            tmax, bits(itri), bits(imesh),
        ]
        + [jnp.zeros((nt * ts,), f32)] * (ROWS - 9),
        axis=0,
    )  # (ROWS, R)


def _compact_order(resolved):
    """Stable permutation putting unresolved rays first.

    ``order[j]`` = source index of sorted slot ``j``.  Cumsum-based stable
    partition — O(R) instead of a full device sort."""
    i32 = jnp.int32
    res = resolved.astype(i32)
    n_unres = jnp.sum(1 - res)
    pos_u = jnp.cumsum(1 - res) - 1
    pos_r = n_unres + jnp.cumsum(res) - 1
    dest = jnp.where(resolved, pos_r, pos_u)
    order = jnp.zeros_like(dest).at[dest].set(
        jnp.arange(dest.shape[0], dtype=i32))
    return order


def nearest_hit_fused(scene, origin, direction, ignore_tri=None,
                      ignore_mesh=None, cull: bool = True,
                      tile_size: int = 256, t_max=None,
                      any_hit: bool = False, chunk_k: int = 1,
                      ngrp: int = NGRP, mxu=None, recull_every: int = 0,
                      pretest: bool = False, phase1_trips: int = 0,
                      prepick: int = 0, nbuf: int = 4, layout=None,
                      plane=None, gate: bool = False,
                      return_iters: bool = False,
                      return_rows: bool = False,
                      interpret=None) -> Hit:
    """Exact nearest hit via the fully-fused Pallas kernel.

    ``return_rows``: also return the winners' packed (R, 32) shade rows,
    resolved IN-KERNEL from the cluster-ordered ``sblock`` bake (the
    XLA-side tri_shade gather costs ~59 ms per 1M rays on v5e — half the
    device frame).  Returns ``(Hit, rows)`` where ``rows`` is None when
    the kernel path cannot resolve them (no sblock bake, row layout,
    any_hit, prepick/phase1 drivers, tiled fallback) — callers fall back
    to the XLA gather.  Row channel 31 carries the mesh id as a float
    VALUE (misses: all-zero rows), unlike tri_shade's bitcast.

    ``mxu``: compute the four Möller–Trumbore det-space quantities with one
    (TS, 16) @ (16, 4C) MXU matmul per cluster instead of ~31 VPU
    elementwise ops (None = use it whenever the scene bake carries the
    coefficient table).  f32 in / f32 preferred accumulation; on TPU the
    matmul may round differently from the elementwise chain at triangle
    edges (sub-1e-6 relative), which can flip strictly edge-grazing pairs —
    the (u, v, t) returned for the winner are recomputed exactly either
    way.

    ``phase1_trips`` > 0 enables the two-phase compaction driver: phase 1
    walks every tile on a trip budget, then the rays it could not
    individually resolve (the lockstep-tile tail — a handful of deep rays
    forcing a whole tile to keep walking) are stably compacted to the
    front, re-tiled into *narrow* beams of survivors only, and finished by
    an unbudgeted phase 2 whose per-ray t_max is phase 1's best-so-far.
    Exact: phase 1 bests are true candidate hits, phase 2 proves or
    strictly improves them (ties keep phase 1's earlier-entry winner,
    matching the single-phase walk's pick order).

    ``prepick`` > 0 uses the pick-then-walk kernel (``_prepick_kernel``)
    with at most that many front-to-back picks per tile and an
    ``nbuf``-deep precise DMA pipeline.  Tiles with more feasible clusters
    than the pick budget return unresolved rays; a rescue pass (classic
    walk, resolved rays masked dead, per-ray t_max = the candidate best)
    finishes them exactly — and runs as a ``lax.cond`` so settled frames
    skip it entirely."""
    if interpret is None:
        interpret = _default_interpret()
    cl = scene.clusters
    if mxu is None:
        # Hardware sweep (tools/kernsweep.py, v5e): the VPU triple-product
        # path runs 1.15us/cluster-trip vs 1.99 for the HIGHEST-precision
        # (x6-pass) MXU matmul; DEFAULT bf16 flips 48% of winners.  The
        # matmul only pays off once K=16 is amortized better — default to
        # the VPU path (the gblock bake is opt-in, scene.flatten).
        mxu = False
    if mxu and "gblock" not in cl:
        raise ValueError(
            "mxu=True requires the gblock bake: flatten the scene with "
            "build_gblock=True")
    if layout == "t" and "tblock" not in cl:
        raise ValueError(
            "layout='t' requires the tblock bake: flatten the scene with "
            "build_tblock=True")
    subk = int(cl["sub_aabb"].shape[0]) if "sub_aabb" in cl else 1
    if layout is None:
        # Measured split (tools/r4lab7, v5e): the transposed pair layout
        # wins ~8% on nearest-hit queries (the uvt one-hot sums and winner
        # reduces become cross-sublane log-trees) but loses ~7% on any_hit
        # occlusion queries (no uvt to save; the per-trip hardware
        # transpose is pure overhead there) — so: tlane for nearest, row
        # for occlusion.  The row layout also remains for the classic-walk
        # knobs and for bakes without tblock.  Subcluster bakes (subk > 1)
        # take tlane for BOTH query kinds: the per-sibling (csub, TS)
        # passes + entry gating only exist there and outweigh the
        # transpose overhead.
        layout = ("t" if "tblock" in cl and (subk > 1 or not any_hit)
                  and not (mxu or pretest or recull_every or prepick)
                  else "row")
    if plane is None:
        # Fitted-plane entry-interval cull: on whenever the bake carries
        # the rows (tlane-only path; free elsewhere).
        plane = "sub_plane" in cl
    csize = cl["block"].shape[2]
    if not any_hit and cl["block"].shape[0] * csize >= (1 << 24):
        # uvt mode rides the winner's triangle id through f32 one-hot sums,
        # exact only below 2^24.  (any_hit queries never extract ids; other
        # backends have no limit.)
        raise ValueError(
            "the fused kernel's in-walk winner extraction requires < 16.7M "
            "triangle slots (ids must be f32-exact); use Intersector.TILED "
            "or ring sharding (dist/bigscene.py) for larger scenes")
    if not interpret and csize % 128 != 0:
        # Mosaic DMA slices must be 128-lane aligned; small test clusters
        # run through the exact XLA backend instead.  The walk-shape knobs
        # (pretest/recull/phase1) have no tiled equivalent and are dropped;
        # results are identical either way (they are exact-only controls).
        from raytpu.accel.tiled import nearest_hit_tiled

        out = nearest_hit_tiled(
            scene, origin, direction, ignore_tri, ignore_mesh, cull,
            tile_size=tile_size, t_max=t_max, any_hit=any_hit,
        )
        if return_iters:
            nt_est = -(-origin.shape[0] // max(tile_size, 1))
            return out, jnp.zeros((nt_est,), jnp.int32)
        if return_rows:
            return out, None
        return out

    r = origin.shape[0]
    f32, i32 = jnp.float32, jnp.int32
    # Primary rays pass no ignores; the kernel statically elides the
    # triangle/mesh-id comparisons for them.
    has_ignore = ignore_tri is not None or ignore_mesh is not None
    if ignore_tri is None:
        ignore_tri = jnp.full((r,), -1, i32)
    if ignore_mesh is None:
        ignore_mesh = jnp.full((r,), -1, i32)
    if t_max is None:
        t_max = jnp.full((r,), INF, f32)

    ts = min(tile_size, max(r, 1))
    o = _pad_rows(origin.astype(f32), ts, jnp.nan)  # NaN pad: never hits,
    d = _pad_rows(direction.astype(f32), ts, jnp.nan)  # excluded from bounds
    itri = _pad_rows(ignore_tri.astype(i32), ts, -1)
    imesh = _pad_rows(ignore_mesh.astype(i32), ts, -1)
    tmax = _pad_rows(t_max.astype(f32), ts, 0.0)
    nt = o.shape[0] // ts

    packed = _pack_rays(o, d, itri, imesh, tmax, nt, ts)

    # any_hit (occlusion) queries need only the hit boolean + bounded t —
    # skip the in-kernel winner extraction AND the whole epilogue.
    uvt = not any_hit
    kw = dict(ts=ts, cull=cull, any_hit=any_hit, chunk_k=chunk_k, ngrp=ngrp,
              has_ignore=has_ignore, mxu=mxu, recull_every=recull_every,
              pretest=pretest, uvt=uvt, layout=layout, interpret=interpret)
    if layout == "t":
        kw.update(saabb=cl.get("sub_aabb"), splane=cl.get("sub_plane"),
                  plane=bool(plane), gate=gate)
    elif not prepick:
        # Classic/row kernel: block-level plane cull (csize-128 bakes).
        kw.update(splane=cl.get("sub_plane"), plane=bool(plane))
    if prepick > 0 and phase1_trips > 0:
        raise ValueError("prepick and phase1_trips are mutually exclusive "
                         "overflow strategies")
    geo = cl["gblock"] if mxu else (
        cl["tblock"] if layout == "t" else cl["block"])
    want_rows = (return_rows and layout == "t" and not any_hit
                 and "sblock" in cl and prepick == 0
                 and phase1_trips == 0)
    if want_rows:
        kw.update(sblock=cl["sblock"], rows=True)
    best_t, code, uvt_out, _res, _iters, rows_out = fused_tiles(
        packed, cl["aabb"], cl["root"], geo,
        max_trips=phase1_trips, prepick=prepick, nbuf=nbuf, **kw,
    )
    if prepick > 0:
        # Rescue pass for pick-budget overflow: only runs (lax.cond) when
        # some ray is unresolved.  Same-tile re-walk with resolved rays
        # masked dead and t_max = the candidate best — the classic walk
        # only updates on strictly-closer hits, so ties keep the prepick
        # walk's earlier-entry winner (the exact single-phase semantics).
        rp = nt * ts
        bt1 = best_t.reshape(rp)
        code1 = code.reshape(rp)
        res1 = _res.reshape(rp) > 0
        uvt1 = (uvt_out.transpose(0, 2, 1).reshape(rp, 4) if uvt
                else jnp.zeros((rp, 4), f32))

        def _rescue(_):
            d2 = jnp.where(res1[:, None], jnp.float32(jnp.nan), d)
            packed2 = _pack_rays(o, d2, itri, imesh,
                                 jnp.where(res1, f32(0.0), bt1), nt, ts)
            bt2, code2, uvt2, _res2, it2, _ = fused_tiles(
                packed2, cl["aabb"], cl["root"], cl["block"],
                max_trips=0, prepick=0, **kw)
            bt2 = bt2.reshape(rp)
            code2 = code2.reshape(rp)
            upd = ~res1 & (code2 >= 0)
            btm = jnp.where(upd, bt2, bt1)
            cdm = jnp.where(upd, code2, code1)
            uvm = (jnp.where(upd[:, None],
                             uvt2.transpose(0, 2, 1).reshape(rp, 4), uvt1)
                   if uvt else uvt1)
            return btm, cdm, uvm, _iters + it2

        best_t, code, uvt_flat, _iters = jax.lax.cond(
            jnp.any(~res1), _rescue,
            lambda _: (bt1, code1, uvt1, _iters), operand=None)
    elif phase1_trips > 0:
        rp = nt * ts
        bt1 = best_t.reshape(rp)
        code1 = code.reshape(rp)
        res1 = _res.reshape(rp) > 0
        order = _compact_order(res1)
        take = lambda a: jnp.take(a, order, axis=0)
        res_s = take(res1)
        # Resolved rays ride along as dead lanes (NaN direction): all-dead
        # tiles build an all-INF entry grid and exit in zero trips.
        d2 = jnp.where(res_s[:, None], jnp.float32(jnp.nan), take(d))
        packed2 = _pack_rays(take(o), d2, take(itri), take(imesh),
                             take(bt1), nt, ts)
        bt2, code2, uvt2, _res2, iters2, _ = fused_tiles(
            packed2, cl["aabb"], cl["root"], geo, max_trips=0, **kw,
        )
        bt2 = bt2.reshape(rp)
        code2 = code2.reshape(rp)
        # Phase 2 ran with t_max = phase 1's best: code2 >= 0 iff strictly
        # closer, so ties keep phase 1's earlier-entry winner.
        upd = ~res_s & (code2 >= 0)
        bt_s = jnp.where(upd, bt2, take(bt1))
        code_s = jnp.where(upd, code2, take(code1))
        best_t = jnp.zeros_like(bt_s).at[order].set(bt_s)
        code = jnp.zeros_like(code_s).at[order].set(code_s)
        if uvt:
            # Merge winner channels in the flat (R, 4) view, then unsort.
            u1 = uvt_out.transpose(0, 2, 1).reshape(rp, 4)
            u2 = uvt2.transpose(0, 2, 1).reshape(rp, 4)
            u_s = jnp.where(upd[:, None], u2, jnp.take(u1, order, axis=0))
            uvt_flat = jnp.zeros_like(u_s).at[order].set(u_s)
        _iters = _iters + iters2
    elif uvt:
        uvt_flat = uvt_out.transpose(0, 2, 1).reshape(nt * ts, 4)

    flat = lambda a: a.reshape(-1)[:r]
    best_t = flat(best_t)
    code = flat(code)
    hit = code >= 0
    t = jnp.where(hit, best_t, INF)
    if not uvt:
        # Occlusion contract (accel/traverse.nearest_hit docstring): only
        # ``hit`` (and the bounded ``t``) are meaningful.
        out = Hit(hit=hit, t=t, u=jnp.zeros_like(t), v=jnp.zeros_like(t),
                  tri=jnp.where(hit, 0, -1))
    else:
        # Winner (u, v, triangle id) straight from the kernel's in-walk
        # extraction — no gather, no recompute (the old (R, 16) slotgeo
        # gather alone cost ~60 ms per 1M rays on v5e).
        uvt_flat = uvt_flat[:r]
        u = jnp.where(hit, uvt_flat[:, 0], 0.0)
        v = jnp.where(hit, uvt_flat[:, 1], 0.0)
        tri = jnp.where(hit, uvt_flat[:, 2].astype(i32), -1)
        out = Hit(hit=hit, t=t, u=u, v=v, tri=tri)
    if return_rows:
        rows_flat = (rows_out.transpose(0, 2, 1).reshape(nt * ts, 32)[:r]
                     if want_rows else None)
        return out, rows_flat
    if return_iters:
        return out, _iters
    return out
