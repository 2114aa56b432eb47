"""Host-side octree builder → flattened arrays for stackless traversal.

The reference builds a pointer-linked octree per mesh (MeshOctree.cs:56-96):
the root AABB spans all vertices, nodes split 8-way while they hold more than
``itemTreshold = 50`` triangles (MeshOctree.cs:42), and triangles are
duplicated into every overlapping child (MeshOctree.cs:224-232).  Pointer
chasing and per-node ``SortedList`` ordering are hostile to TPUs, so the tree
is flattened into preorder arrays with *escape indices*: a ray walks the tree
with a bounded loop, moving to ``i + 1`` (first child) on AABB hit of an
internal node and to ``skip[i]`` otherwise — no stack, no recursion
(SURVEY.md §7 "stackless octree traversal").

Deviations from the reference, by design:

- Child membership uses a correct triangle/AABB separating-axis test instead
  of the reference's vertex-containment test (MeshOctree.cs:226-228), which
  drops triangles that span a node without a vertex inside it — a real hole
  bug.  ``vertex_containment=True`` replicates the reference exactly.
- Traversal (accel/traverse.py) returns the exact nearest hit; the
  reference's "stop after the first leaf group with any hit"
  (MeshOctree.cs:281-306) is only approximately nearest because triangles
  are duplicated across leaves.  Exact-nearest is required for our
  brute-force/octree cross-validation and is never *less* correct.
- A ``max_depth`` guard prevents the unbounded recursion the reference risks
  when >threshold triangles overlap every child.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FlatOctree:
    """Preorder-flattened octree.

    ``node_min/max``: (N, 3) AABBs.
    ``node_skip``: (N,) preorder index after node's subtree (escape); the
    last node's skip == N.
    ``node_is_leaf``: (N,) bool.
    ``node_leaf_start/count``: (N,) ranges into ``leaf_tris`` (0 for internal).
    ``leaf_tris``: (L,) triangle indices, duplicated per overlapping leaf.
    """

    node_min: np.ndarray
    node_max: np.ndarray
    node_skip: np.ndarray
    node_is_leaf: np.ndarray
    node_leaf_start: np.ndarray
    node_leaf_count: np.ndarray
    leaf_tris: np.ndarray
    max_leaf_count: int

    def as_device_arrays(self) -> dict:
        return {
            "node_min": jnp.asarray(self.node_min),
            "node_max": jnp.asarray(self.node_max),
            "node_skip": jnp.asarray(self.node_skip),
            "node_is_leaf": jnp.asarray(self.node_is_leaf),
            "node_leaf_start": jnp.asarray(self.node_leaf_start),
            "node_leaf_count": jnp.asarray(self.node_leaf_count),
            "leaf_tris": jnp.asarray(self.leaf_tris),
        }


def tri_box_overlap(v0, v1, v2, box_min, box_max):
    """Vectorized triangle/AABB separating-axis test (Akenine-Möller).

    ``v0/v1/v2``: (T, 3); ``box_min/max``: (3,).  Returns (T,) bool.
    """
    c = (box_min + box_max) * 0.5
    h = (box_max - box_min) * 0.5
    p0 = v0 - c
    p1 = v1 - c
    p2 = v2 - c

    # 1. AABB overlap of the triangle's AABB.
    tmin = np.minimum(np.minimum(p0, p1), p2)
    tmax = np.maximum(np.maximum(p0, p1), p2)
    ok = np.all((tmin <= h) & (tmax >= -h), axis=-1)

    # 2. Plane/AABB overlap.
    e0 = p1 - p0
    e1 = p2 - p1
    n = np.cross(e0, e1)
    d = -np.sum(n * p0, axis=-1)
    r = np.sum(h * np.abs(n), axis=-1)
    ok &= np.abs(d) <= r + 1e-12

    # 3. Nine cross-axis tests.
    e2 = p0 - p2
    for e in (e0, e1, e2):
        for axis in range(3):
            a = np.zeros_like(e)
            a[:, axis] = 1.0
            ax = np.cross(a, e)
            pr0 = np.sum(ax * p0, axis=-1)
            pr1 = np.sum(ax * p1, axis=-1)
            pr2 = np.sum(ax * p2, axis=-1)
            rad = np.sum(h * np.abs(ax), axis=-1)
            mn = np.minimum(np.minimum(pr0, pr1), pr2)
            mx = np.maximum(np.maximum(pr0, pr1), pr2)
            ok &= (mn <= rad + 1e-12) & (mx >= -rad - 1e-12)
    return ok


def _vertex_containment(v0, v1, v2, box_min, box_max):
    """The reference's membership test (MeshOctree.cs:226-228): any vertex
    inside-or-on the box."""

    def inside(p):
        return np.all((p >= box_min) & (p <= box_max), axis=-1)

    return inside(v0) | inside(v1) | inside(v2)


def build_octree(tri_verts: np.ndarray, leaf_threshold: int = 50,
                 max_depth: int = 12,
                 vertex_containment: bool = False) -> FlatOctree:
    """Build the flattened octree over (T, 3, 3) world-space triangles."""
    tri_verts = np.asarray(tri_verts, np.float32)
    t = tri_verts.shape[0]
    v0, v1, v2 = tri_verts[:, 0], tri_verts[:, 1], tri_verts[:, 2]

    root_min = tri_verts.reshape(-1, 3).min(axis=0)
    root_max = tri_verts.reshape(-1, 3).max(axis=0)

    node_min, node_max, node_skip = [], [], []
    node_is_leaf, node_leaf_start, node_leaf_count = [], [], []
    leaf_tris = []
    overlap = _vertex_containment if vertex_containment else tri_box_overlap

    def emit(bmin, bmax, tris, depth):
        """Emit node for `tris` (np.int64 indices); returns its index."""
        idx = len(node_min)
        node_min.append(bmin)
        node_max.append(bmax)
        node_skip.append(-1)  # patched after subtree
        if len(tris) <= leaf_threshold or depth >= max_depth:
            node_is_leaf.append(True)
            node_leaf_start.append(len(leaf_tris))
            node_leaf_count.append(len(tris))
            leaf_tris.extend(tris.tolist())
        else:
            node_is_leaf.append(False)
            node_leaf_start.append(0)
            node_leaf_count.append(0)
            size = (bmax - bmin) * 0.5
            # Child order i,j,k over x,y,z like SplitCuboid
            # (MeshOctree.cs:204-236).
            for i in range(2):
                for j in range(2):
                    for k in range(2):
                        cmin = bmin + size * np.asarray([i, j, k], np.float32)
                        cmax = cmin + size
                        mask = overlap(v0[tris], v1[tris], v2[tris], cmin, cmax)
                        emit(cmin, cmax, tris[mask], depth + 1)
        node_skip[idx] = len(node_min)
        return idx

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        emit(root_min, root_max, np.arange(t, dtype=np.int64), 0)
    finally:
        sys.setrecursionlimit(old_limit)

    counts = np.asarray(node_leaf_count, np.int32)
    return FlatOctree(
        node_min=np.stack(node_min).astype(np.float32),
        node_max=np.stack(node_max).astype(np.float32),
        node_skip=np.asarray(node_skip, np.int32),
        node_is_leaf=np.asarray(node_is_leaf, bool),
        node_leaf_start=np.asarray(node_leaf_start, np.int32),
        node_leaf_count=counts,
        leaf_tris=np.asarray(leaf_tris if leaf_tris else [0], np.int32),
        max_leaf_count=int(counts.max()) if len(counts) else 0,
    )
