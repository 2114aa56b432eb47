"""Morton-ordered triangle clusters — the TPU-native acceleration structure.

The reference accelerates rays with a two-level recursive octree walked one
node at a time per ray (MeshOctree.cs:259-353, OctreeSpatialManager.cs:312-
482).  A per-ray pointer walk is the wrong shape for a TPU: every step is a
data-dependent gather and the lockstep batch pays the deepest ray's latency
on every lane (see accel/traverse.py, kept for parity).  The TPU-native
structure inverts it:

- **Clusters, not nodes.**  Triangles are sorted by the Morton code of their
  centroid and grouped into fixed-size clusters of ``cluster_size``
  (lane-width 128 by default).  Morton order makes consecutive triangles
  spatially local, so cluster AABBs are tight — the same locality the
  reference's octree leaves capture (MeshOctree.cs:224-232), but with **zero
  duplication**, contiguous memory per cluster, and a flat table instead of
  a pointer tree.
- **Dense culling, not traversal.**  A batch of rays is tiled; each tile is
  summarized by an origin AABB + direction interval box, and every
  (tile, cluster) pair gets one conservative interval slab test — a dense
  (tiles, clusters) VPU computation replacing per-ray tree descent
  (accel/tiled.py).
- **Front-to-back chunks, not sorted leaf lists.**  Candidate clusters are
  ordered by conservative entry distance and tested chunk-by-chunk with a
  strict-min update until every ray's best hit precedes the next chunk —
  the batched analog of the reference's sorted-leaf early-stop
  (MeshOctree.cs:281-306), with *exact* nearest-hit semantics.

Build is host-side vectorized NumPy (the content-processor stage of the
pipeline, TracerModelProcessor.cs:105-119); the device table is a dict of
flat arrays pre-gathered in Morton order so the hot loop reads contiguous
(chunk, 128)-triangle blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def morton3(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Interleave three 10-bit integer coordinates into a 30-bit Morton code."""

    def spread(v):
        v = v.astype(np.uint64) & np.uint64(0x3FF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x030000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x0300F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x030C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x09249249)
        return v

    return (spread(x) << np.uint64(2)) | (spread(y) << np.uint64(1)) | spread(z)


@dataclasses.dataclass
class ClusterTable:
    """Host-side cluster build result.

    ``order``: (Tp,) original triangle index per Morton-ordered slot
    (-1 padding); ``cluster_min/max``: (NC, 3) cluster AABBs.
    """

    order: np.ndarray
    cluster_min: np.ndarray
    cluster_max: np.ndarray
    cluster_size: int

    @property
    def num_clusters(self) -> int:
        return self.cluster_min.shape[0]

    def as_device_arrays(self, tri_v1, tri_e1, tri_e2, tri_snormal, tri_mesh,
                         build_gblock: bool = False,
                         build_tblock: bool = True):
        """Device dict: cluster AABBs + triangle geometry permuted into Morton
        order (slot -> original id in ``tri_id``; padding slots are degenerate
        triangles with ``tri_id == -1`` that can never be hit).

        ``build_gblock``: also bake the MXU-path coefficient table (4x the
        geometry HBM; only read by kernels/fused.py with ``mxu=True``, which
        measured slower than the VPU path on v5e — opt-in so default scenes
        pay nothing for it)."""
        import jax.numpy as jnp

        safe = np.maximum(self.order, 0)
        pad = self.order < 0

        def perm(a, fill=0.0):
            out = np.asarray(a)[safe].copy()
            out[pad] = fill
            return jnp.asarray(out)

        tri_id = np.where(pad, -1, safe).astype(np.int32)
        mesh = np.where(pad, -1, np.asarray(tri_mesh)[safe]).astype(np.int32)

        def permh(a, fill=0.0):
            out = np.asarray(a, np.float32)[safe].copy()
            out[pad] = fill
            return out

        # Packed per-cluster block for the Pallas kernel's DMA path:
        # (NC, 24, C) f32 in the *triple-product* form of Möller–Trumbore
        # (kernels/fused.py): with per-ray w = d x o,
        #   det   = d·N            N  = cross(e2, e1)  (rows 0-2)
        #   u*det = w·E2n + d·M1n  M1n = cross(v1, e2) (3-5), E2n = -e2 (6-8)
        #   v*det = w·E1  + d·M2   M2 = cross(e1, v1)  (9-11), E1 = e1 (12-14)
        #   t*det = c0 - o·N       c0 = v1·N           (row 15)
        # Row 16 = triangle id (i32 bits), 17 = mesh id (i32 bits),
        # 18-23 zero padding.  One block = one DMA; the row count is a
        # multiple of 8 so Mosaic can slice it under (8, 128) tiling.
        nc = self.num_clusters
        c = self.cluster_size
        v1h = permh(tri_v1)
        e1h = permh(tri_e1)
        e2h = permh(tri_e2)
        nrm = np.cross(e2h, e1h)
        m1n = np.cross(v1h, e2h)
        m2 = np.cross(e1h, v1h)
        c0 = np.sum(v1h * nrm, axis=-1)
        block = np.zeros((24, nc, c), np.float32)
        rows = (
            [nrm[:, k] for k in range(3)]
            + [m1n[:, k] for k in range(3)]
            + [-e2h[:, k] for k in range(3)]
            + [m2[:, k] for k in range(3)]
            + [e1h[:, k] for k in range(3)]
            + [c0]
        )
        for i, r in enumerate(rows):
            block[i] = r.reshape(nc, c)
        block[16] = tri_id.reshape(nc, c).view(np.float32)
        block[17] = mesh.reshape(nc, c).view(np.float32)
        # Rows 18-23: the cluster's own AABB (min xyz, max xyz) replicated
        # across lanes — rides along with the geometry DMA so the fused
        # kernel can run a per-ray slab pretest and skip the whole
        # Möller–Trumbore pass for clusters no unresolved ray can improve
        # on (kernels/fused.py).
        mn_c = self.cluster_min  # (NC, 3)
        mx_c = self.cluster_max
        for k3 in range(3):
            block[18 + k3] = mn_c[:, k3:k3 + 1]
            block[21 + k3] = mx_c[:, k3:k3 + 1]
        block = np.ascontiguousarray(block.transpose(1, 0, 2))

        # MXU-path coefficient table (kernels/fused.py, mxu=True): per
        # cluster a (24, 4C) block whose first 16 rows are the matmul
        # coefficients G with [det | udet | vdet | tdet] as (TS, C) column
        # blocks of R @ G, R = [d, w, o, 1, pad] per ray:
        #   det  = d.N                (rows 0-2 = N)
        #   udet = d.M1n + w.E2n      (rows 0-2 = M1n, 3-5 = -e2)
        #   vdet = d.M2  + w.E1      (rows 0-2 = M2,  3-5 = e1)
        #   tdet = -o.N  + c0         (rows 6-8 = -N,  row 9 = c0)
        # Row 16 carries [tid | tmesh | 0 | 0] as i32 bits.
        gblock = None
        if build_gblock:
            gblock = np.zeros((24, 4 * c, nc), np.float32)

            def gcol(q, rows3, vals):  # vals (T, 3) -> rows3 of col block q
                for k3 in range(3):
                    gblock[rows3 + k3, q * c:(q + 1) * c] = (
                        vals[:, k3].reshape(nc, c).transpose(1, 0))

            gcol(0, 0, nrm)
            gcol(1, 0, m1n)
            gcol(1, 3, -e2h)
            gcol(2, 0, m2)
            gcol(2, 3, e1h)
            gcol(3, 6, -nrm)
            gblock[9, 3 * c:4 * c] = c0.reshape(nc, c).transpose(1, 0)
            gblock[16, 0:c] = tri_id.reshape(nc, c).view(np.float32).T
            gblock[16, c:2 * c] = mesh.reshape(nc, c).view(np.float32).T
            # Rows 18-23: cluster AABB replicated across lanes (see block).
            for k3 in range(3):
                gblock[18 + k3] = mn_c[:, k3:k3 + 1].T
                gblock[21 + k3] = mx_c[:, k3:k3 + 1].T
            gblock = np.ascontiguousarray(gblock.transpose(2, 0, 1))

        # Fused-kernel cull tables (kernels/fused.py): cluster AABB planes
        # laid out (6, 8, NC8) with cluster j at (j // NC8, j % NC8) — 8
        # sublanes x 128-multiple lanes so the in-kernel entry grid is a
        # dense VPU shape.  Padding columns get +BIG bounds; the kernel
        # additionally masks them by flat index >= NC.
        big = np.float32(3.4028235e38)
        nc8 = max(128, ((-(-nc // 8) + 127) // 128) * 128)
        aabb = np.full((6, 8 * nc8), big, np.float32)
        aabb[0:3, :nc] = self.cluster_min.T
        aabb[3:6, :nc] = self.cluster_max.T
        aabb = aabb.reshape(6, 8, nc8)
        root_min = self.cluster_min.min(axis=0)
        root_max = self.cluster_max.max(axis=0)
        diag = np.float32(np.max(root_max - root_min))
        margin = np.float32(1e-3) * diag + np.float32(1e-4)
        root = np.zeros((1, 8), np.float32)
        root[0, 0:3] = root_min
        root[0, 3:6] = root_max
        root[0, 6] = margin

        # Geometry for the tlane kernel (kernels/fused.py _tlane_kernel):
        # the same 24 semantic channels as ``block``, zero-padded to 32
        # rows so the kernel can transpose each fetched cluster to (C, 32)
        # in one hardware-transpose op (Mosaic requires DMA slices 128-
        # lane-aligned, so the transposed form cannot be STORED directly;
        # 32 rows keep the transpose input sublane-aligned).  The pair
        # matrix then runs (C, TS): per-ray reductions cross sublanes
        # (cheap log-trees of full vector ops) and per-ray state stays
        # lane-major.
        tblock = None
        if build_tblock:
            tblock = np.concatenate(
                [block, np.zeros((nc, 8, c), np.float32)], axis=1)

        # NOTE: the fused kernel's uvt mode returns the winner's triangle
        # id as an exact f32 VALUE, which requires ids < 2^24 — enforced at
        # QUERY time (kernels/fused.py), not here: other backends (tiled,
        # brute, octree, the ring's dense fallback) and any_hit queries
        # have no such limit, and >HBM scenes must still bake.

        out = {
            "cluster_min": jnp.asarray(self.cluster_min),
            "cluster_max": jnp.asarray(self.cluster_max),
            "aabb": jnp.asarray(aabb),
            "root": jnp.asarray(root),
            "root_min": jnp.asarray(self.cluster_min.min(axis=0)),
            "root_max": jnp.asarray(self.cluster_max.max(axis=0)),
            "tri_id": jnp.asarray(tri_id),
            "tri_v1": perm(tri_v1),
            "tri_e1": perm(tri_e1),
            "tri_e2": perm(tri_e2),
            "tri_snormal": perm(tri_snormal),
            "tri_mesh": jnp.asarray(mesh),
            "block": jnp.asarray(block),
        }
        if gblock is not None:
            out["gblock"] = jnp.asarray(gblock)
        if tblock is not None:
            out["tblock"] = jnp.asarray(tblock)
        return out


def _median_split_leaves(centroids: np.ndarray, idx: np.ndarray,
                         cluster_size: int) -> list:
    """Spatial-median BVH leaves of <= cluster_size triangles each.

    Level-synchronous longest-axis median splits (argpartition per segment,
    O(T log T) host time).  Versus Morton runs this yields *tight*, nearly
    disjoint leaf AABBs: a fixed-length run of Z-curve codes snakes across
    cells and jumps at curve discontinuities, so Morton clusters measured
    ~5-7x wider per axis on the 1M-tri bench terrain (a 0.6x0.6 beam
    column overlapped a median of 34 Morton clusters vs ~4-9 spatial
    patches) — which is exactly the number of front-to-back trips the
    fused kernel's walk has to make per tile.

    The split point is the multiple of ``cluster_size`` nearest the median,
    so leaves pack full (plain halving strands ~cluster_size/2 triangles in
    every leaf when T sits just above cluster_size * 2^k, inflating the
    cluster count, HBM tables and walk trips by up to ~2x).

    Splits operate on *positions* into ``centroids``/``idx`` (0..len-1) and
    map back through ``idx`` at the end, so a ``valid`` mask with holes
    (compact ``centroids``, non-contiguous ``idx``) is handled correctly.
    """
    n = idx.shape[0]
    segments = [np.arange(n, dtype=np.int64)]
    leaves = []
    while segments:
        nxt = []
        for seg in segments:
            if seg.shape[0] <= cluster_size:
                leaves.append(idx[seg])
                continue
            c = centroids[seg]
            ext = c.max(axis=0) - c.min(axis=0)
            axis = int(np.argmax(ext))
            # Nearest multiple of cluster_size to the median, clamped to a
            # proper split — left children stay exact multiples all the way
            # down, so every leaf except per-subtree remainders holds
            # exactly cluster_size triangles.
            half = seg.shape[0] // 2
            m = int(round(half / cluster_size)) * cluster_size
            m = min(max(m, cluster_size), seg.shape[0] - 1)
            part = np.argpartition(c[:, axis], m)
            nxt.append(seg[part[:m]])
            nxt.append(seg[part[m:]])
        segments = nxt
    return leaves


def build_clusters(tri_verts: np.ndarray, cluster_size: int = 128,
                   valid: Optional[np.ndarray] = None,
                   method: str = "median",
                   pad_clusters_to: Optional[int] = None) -> ClusterTable:
    """Cluster ``tri_verts`` (T, 3, 3) into fixed-size spatial groups.

    ``method="median"`` (default): spatial-median BVH leaves, tight and
    nearly disjoint (see _median_split_leaves).  ``method="morton"``: the
    round-1 fixed-length Morton-run clustering (kept for comparison).
    O(T log T) host time either way; rebuilds are cheap enough to run
    per-epoch while fitting geometry (diff/fit.py ``rebuild_every``).

    ``pad_clusters_to``: pad the table to a fixed cluster count with
    infeasible (±big AABB, empty) clusters so per-epoch rebuilds keep
    every device-array shape stable — the jitted fit step then never
    recompiles across rebuilds.
    """
    v = np.asarray(tri_verts, np.float32).reshape(-1, 3, 3)
    t = v.shape[0]
    if valid is None:
        valid = np.ones(t, bool)
    idx = np.flatnonzero(valid)
    centroids = v[idx].mean(axis=1)

    if method == "median" and idx.shape[0] > cluster_size:
        leaves = _median_split_leaves(centroids, idx, cluster_size)
        # Order leaves by the Morton code of their centroid so neighboring
        # slots stay spatially local (slot order breaks exact-tie picks).
        cents = np.stack([centroids[np.searchsorted(idx, lf)].mean(axis=0)
                          for lf in leaves])
        lo = cents.min(axis=0)
        extent = np.maximum(cents.max(axis=0) - lo, 1e-30)
        q = np.clip(((cents - lo) / extent) * 1023.0, 0, 1023).astype(
            np.uint32)
        codes = morton3(q[:, 0], q[:, 1], q[:, 2])
        leaves = [leaves[i] for i in np.argsort(codes, kind="stable")]
        nc = len(leaves)
        slots = np.full(nc * cluster_size, -1, np.int64)
        for i, lf in enumerate(leaves):
            slots[i * cluster_size:i * cluster_size + lf.shape[0]] = lf
    else:
        lo = centroids.min(axis=0)
        hi = centroids.max(axis=0)
        extent = np.maximum(hi - lo, 1e-30)
        q = np.clip(((centroids - lo) / extent) * 1023.0, 0, 1023).astype(
            np.uint32)
        codes = morton3(q[:, 0], q[:, 1], q[:, 2])
        order = idx[np.argsort(codes, kind="stable")].astype(np.int64)

        n = order.shape[0]
        nc = max(1, -(-n // cluster_size))
        slots = np.full(nc * cluster_size, -1, np.int64)
        slots[:n] = order

    if pad_clusters_to is not None:
        if pad_clusters_to < nc:
            raise ValueError(
                f"pad_clusters_to={pad_clusters_to} < built count {nc}")
        pad = (pad_clusters_to - nc) * cluster_size
        if pad:
            slots = np.concatenate([slots, np.full(pad, -1, np.int64)])
        nc = pad_clusters_to

    member = v[np.maximum(slots, 0)]  # (Tp, 3, 3)
    big = np.float32(3.4028235e38)
    mn = np.where(slots[:, None, None] >= 0, member, big).reshape(
        nc, cluster_size, 3, 3
    )
    mx = np.where(slots[:, None, None] >= 0, member, -big).reshape(
        nc, cluster_size, 3, 3
    )
    cluster_min = mn.min(axis=(1, 2))
    cluster_max = mx.max(axis=(1, 2))
    # Fully-padded clusters (possible when leaves under-fill) keep +/-big
    # bounds and are never feasible in any cull.

    return ClusterTable(
        order=slots,
        cluster_min=cluster_min.astype(np.float32),
        cluster_max=cluster_max.astype(np.float32),
        cluster_size=cluster_size,
    )
