"""Nearest-hit queries: brute-force sweep and stackless octree traversal.

Both return the same ``Hit`` structure and are cross-validated against each
other and against the NumPy oracle.  The query semantics follow the
reference's scene query (OctreeSpatialManager.GetRayIntersection,
OctreeSpatialManager.cs:312-455): optional backface culling
(the engine always culls — MeshOctree.cs:293), an ``ignore_triangle`` id for
self-intersection avoidance (MeshOctree.cs:290) and an ``ignore_mesh`` id for
convex-geometry reflection rays (RayTracer.cs:554-559), with ties broken by
scan order (strict ``<`` on distance).  Unlike the reference we return the
*exact* nearest hit (see accel/octree.py for why).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from raytpu.core.intersect import moller_trumbore, ray_aabb
from raytpu.core.math3d import dot

FLOAT_MAX = jnp.float32(3.4028235e38)


class Hit(NamedTuple):
    """Nearest-hit result per ray (mirrors IntersectionResult,
    OctreeSpatialManager.cs:11-33, minus the world position which the
    renderer derives)."""

    hit: jnp.ndarray  # (R,) bool
    t: jnp.ndarray  # (R,) distance (FLOAT_MAX on miss)
    u: jnp.ndarray  # (R,)
    v: jnp.ndarray  # (R,)
    tri: jnp.ndarray  # (R,) int32 triangle index (-1 on miss)


def _tri_hits(scene, origin, direction, tri_idx, ignore_tri, ignore_mesh, cull):
    """Test a (R, B) block of ray x triangle pairs.

    ``origin/direction``: (R, 3); ``tri_idx``: (B,) triangle ids.
    Returns (ok, u, v, d) with shape (R, B).
    """
    v1 = scene.tri_v1[tri_idx][None]
    e1 = scene.tri_e1[tri_idx][None]
    e2 = scene.tri_e2[tri_idx][None]
    o = origin[:, None, :]
    d = direction[:, None, :]
    ok, u, v, dist = moller_trumbore(o, d, v1, e1, e2)
    if cull:
        ok &= dot(scene.tri_snormal[tri_idx][None], d) <= 0.0
    ok &= scene.tri_valid[tri_idx][None]
    ok &= tri_idx[None, :] != ignore_tri[:, None]
    ok &= scene.tri_mesh[tri_idx][None] != ignore_mesh[:, None]
    return ok, u, v, dist


def nearest_hit_brute(scene, origin, direction, ignore_tri=None,
                      ignore_mesh=None, cull: bool = True,
                      block: int = 2048) -> Hit:
    """Dense sweep over all triangles, blocked to bound memory.

    The TPU-natural formulation: every block is a (R, B) elementwise
    Möller–Trumbore on the VPU with a running strict-min, which preserves
    the reference's first-in-scan-order tie-breaking.
    """
    r = origin.shape[0]
    n = scene.tri_v1.shape[0]
    if ignore_tri is None:
        ignore_tri = jnp.full((r,), -1, jnp.int32)
    if ignore_mesh is None:
        ignore_mesh = jnp.full((r,), -1, jnp.int32)

    nblocks = max(1, -(-n // block))
    pad_n = nblocks * block
    # Padding indices point at triangle 0 but are masked via tri_valid==False
    # only when the scene itself is padded; guard explicitly instead.
    idx_all = jnp.arange(pad_n, dtype=jnp.int32)
    in_range = idx_all < n
    idx_all = jnp.where(in_range, idx_all, 0)

    def body(carry, blk):
        best_t, best_u, best_v, best_tri = carry
        tri_idx, valid_blk = blk
        ok, u, v, dist = _tri_hits(
            scene, origin, direction, tri_idx, ignore_tri, ignore_mesh, cull
        )
        ok &= valid_blk[None, :]
        dist = jnp.where(ok, dist, FLOAT_MAX)
        j = jnp.argmin(dist, axis=1)
        rr = jnp.arange(r)
        cand_t = dist[rr, j]
        upd = cand_t < best_t
        best_t = jnp.where(upd, cand_t, best_t)
        best_u = jnp.where(upd, u[rr, j], best_u)
        best_v = jnp.where(upd, v[rr, j], best_v)
        best_tri = jnp.where(upd, tri_idx[j], best_tri)
        return (best_t, best_u, best_v, best_tri), None

    # Derive the carry init from the (possibly device-varying) ray arrays so
    # the scan carry type matches under shard_map manual axes.
    zero_r = jnp.zeros_like(origin[:, 0])
    init = (
        zero_r + FLOAT_MAX,
        zero_r,
        zero_r,
        zero_r.astype(jnp.int32) - 1,
    )
    blocks = (idx_all.reshape(nblocks, block), in_range.reshape(nblocks, block))
    (best_t, best_u, best_v, best_tri), _ = jax.lax.scan(body, init, blocks)
    hit = best_tri >= 0
    return Hit(hit=hit, t=best_t, u=best_u, v=best_v, tri=best_tri)


def nearest_hit_octree(scene, origin, direction, ignore_tri=None,
                       ignore_mesh=None, cull: bool = True) -> Hit:
    """Stackless flattened-octree traversal, vmapped over rays.

    Per ray: walk nodes in preorder; descend (→ i+1) when the node AABB is
    hit with entry distance below the current best t, otherwise jump to the
    escape index.  Leaves run a bounded loop over their triangle range.
    Exact nearest hit (strict-min update keeps scan-order tie-breaking
    within a leaf; across duplicated leaves the hit is identical).
    """
    oct_ = scene.octree
    node_min = oct_["node_min"]
    node_max = oct_["node_max"]
    node_skip = oct_["node_skip"]
    node_is_leaf = oct_["node_is_leaf"]
    node_leaf_start = oct_["node_leaf_start"]
    node_leaf_count = oct_["node_leaf_count"]
    leaf_tris = oct_["leaf_tris"]
    num_nodes = node_min.shape[0]

    r = origin.shape[0]
    if ignore_tri is None:
        ignore_tri = jnp.full((r,), -1, jnp.int32)
    if ignore_mesh is None:
        ignore_mesh = jnp.full((r,), -1, jnp.int32)

    def one_ray(o, d, ign_t, ign_m):
        # NaN directions (the reference's TIR refraction rays) never hit.
        bad = ~jnp.all(jnp.isfinite(d)) | ~jnp.all(jnp.isfinite(o))

        def cond(state):
            node, best_t, _, _, _ = state
            return node < num_nodes

        def leaf_body(i, inner):
            best_t, best_u, best_v, best_tri, start = inner
            tri = leaf_tris[start + i]
            okk, u, v, dist = moller_trumbore(
                o, d, scene.tri_v1[tri], scene.tri_e1[tri], scene.tri_e2[tri]
            )
            if cull:
                okk &= dot(scene.tri_snormal[tri], d) <= 0.0
            okk &= scene.tri_valid[tri]
            okk &= tri != ign_t
            okk &= scene.tri_mesh[tri] != ign_m
            okk &= dist < best_t
            best_u = jnp.where(okk, u, best_u)
            best_v = jnp.where(okk, v, best_v)
            best_tri = jnp.where(okk, tri, best_tri)
            best_t = jnp.where(okk, dist, best_t)
            return best_t, best_u, best_v, best_tri, start

        def body(state):
            node, best_t, best_u, best_v, best_tri = state
            box_hit, t_near = ray_aabb(o, d, node_min[node], node_max[node])
            enter = box_hit & (t_near < best_t)
            is_leaf = node_is_leaf[node]

            def do_leaf(args):
                bt, bu, bv, btri = args
                start = node_leaf_start[node]
                count = node_leaf_count[node]
                bt, bu, bv, btri, _ = jax.lax.fori_loop(
                    0, count, leaf_body, (bt, bu, bv, btri, start)
                )
                return bt, bu, bv, btri

            best_t, best_u, best_v, best_tri = jax.lax.cond(
                enter & is_leaf,
                do_leaf,
                lambda a: a,
                (best_t, best_u, best_v, best_tri),
            )
            next_node = jnp.where(enter & ~is_leaf, node + 1, node_skip[node])
            return next_node, best_t, best_u, best_v, best_tri

        # Init derived from the ray so the while carry is device-varying
        # under shard_map manual axes.
        zero = o[0] * 0.0
        init = (
            jnp.where(bad, num_nodes, 0) + zero.astype(jnp.int32),
            zero + FLOAT_MAX,
            zero,
            zero,
            zero.astype(jnp.int32) - 1,
        )
        _, bt, bu, bv, btri = jax.lax.while_loop(cond, body, init)
        return bt, bu, bv, btri

    bt, bu, bv, btri = jax.vmap(one_ray)(origin, direction, ignore_tri, ignore_mesh)
    return Hit(hit=btri >= 0, t=bt, u=bu, v=bv, tri=btri)


def nearest_hit(scene, origin, direction, ignore_tri=None, ignore_mesh=None,
                cull: bool = True, intersector="auto", block: int = 2048,
                brute_force_max_tris: int = 4096) -> Hit:
    """Dispatch by configured intersector (config.Intersector)."""
    from raytpu.config import Intersector

    mode = intersector
    if isinstance(mode, str):
        mode = {
            "auto": Intersector.AUTO,
            "brute": Intersector.BRUTE,
            "octree": Intersector.OCTREE,
            "pallas": Intersector.PALLAS,
        }[mode]
    if mode == Intersector.AUTO:
        if scene.octree is not None and scene.num_tris > brute_force_max_tris:
            mode = Intersector.OCTREE
        else:
            mode = Intersector.BRUTE
    if mode == Intersector.BRUTE:
        return nearest_hit_brute(
            scene, origin, direction, ignore_tri, ignore_mesh, cull, block
        )
    if mode == Intersector.OCTREE:
        return nearest_hit_octree(
            scene, origin, direction, ignore_tri, ignore_mesh, cull
        )
    if mode == Intersector.PALLAS:
        from raytpu.kernels.dispatch import nearest_hit_pallas

        return nearest_hit_pallas(
            scene, origin, direction, ignore_tri, ignore_mesh, cull
        )
    raise ValueError(mode)
