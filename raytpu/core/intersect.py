"""Ray-primitive intersection math (vmap/broadcast friendly, jnp).

Faithful to the reference's formulas:

- Möller–Trumbore exactly as ``RayExtensions.IntersectsTriangle`` /
  ``IntersectsTriangleBackfaceCulling`` (RayExtensions.cs:13-75): no epsilon
  guard on the determinant (a parallel ray divides by zero, producing inf/NaN
  which fails the acceptance tests — same net behavior as the C# float math),
  acceptance ``u >= 0 && v >= 0 && d >= 0 && u + v <= 1``, and the backface
  variant rejecting when ``dot(surfaceNormal, D) > 0``.
- AABB slab test with XNA ``BoundingBox.Intersects(ref Ray, out float?)``
  semantics (used by MeshOctree.cs:331): near-zero direction components are
  handled with an explicit 1e-6 branch, the entry distance is clamped at 0
  (origin inside the box reports 0).
"""

from __future__ import annotations

import jax.numpy as jnp

from raytpu.core.math3d import cross, dot


def moller_trumbore(origin, direction, v1, e1, e2):
    """Möller–Trumbore over broadcastable stacks of rays and triangles.

    Parameters are (..., 3); ``e1 = v2 - v1``, ``e2 = v3 - v1`` precomputed.
    Returns ``(hit, u, v, d)`` with the reference's exact acceptance test
    (RayExtensions.cs:36-39).
    """
    t = origin - v1
    p = cross(direction, e2)
    q = cross(t, e1)
    det = dot(p, e1)
    inv_det = 1.0 / det
    d = dot(q, e2) * inv_det
    u = dot(p, t) * inv_det
    v = dot(q, direction) * inv_det
    hit = (u >= 0.0) & (v >= 0.0) & (d >= 0.0) & (u + v <= 1.0)
    return hit, u, v, d


def moller_trumbore_safe(origin, direction, v1, e1, e2, eps: float = 1e-20):
    """Möller–Trumbore with a determinant guard, for the differentiable
    recompute path (render/wavefront.py, cfg.differentiable).

    For a triangle that actually passed the acceptance test the determinant
    is nonzero and the guard never fires, so forward values are identical to
    :func:`moller_trumbore`; for masked-out lanes (missed rays gathering a
    placeholder triangle) it avoids inf/NaN that would poison gradients
    through ``where``.
    """
    t = origin - v1
    p = cross(direction, e2)
    q = cross(t, e1)
    det = dot(p, e1)
    det = jnp.where(jnp.abs(det) < eps, jnp.float32(1.0), det)
    inv_det = 1.0 / det
    d = dot(q, e2) * inv_det
    u = dot(p, t) * inv_det
    v = dot(q, direction) * inv_det
    return u, v, d


def moller_trumbore_cull(origin, direction, v1, e1, e2, surface_normal):
    """Backface-culling variant (RayExtensions.cs:42-75).

    Rejects when ``dot(surfaceNormal, D) > 0`` before the arithmetic.
    """
    hit, u, v, d = moller_trumbore(origin, direction, v1, e1, e2)
    facing = dot(surface_normal, direction) <= 0.0
    return hit & facing, u, v, d


def facing_gate(surface_normal, direction, cull):
    """The backface-cull gate (RayExtensions.cs:48-51) as a mask.

    ``cull="reverse"`` mirrors it for queries cast along the REVERSED ray
    (render/wavefront.py shadow-from-light): accept iff the triangle would
    face the original (un-reversed) direction.  One definition for every
    XLA backend so the mirror can never drift."""
    if cull == "reverse":
        return dot(surface_normal, direction) >= 0.0
    return dot(surface_normal, direction) <= 0.0


def ray_aabb(origin, direction, box_min, box_max):
    """XNA ``BoundingBox.Intersects(ref Ray)`` slab test.

    Returns ``(hit, t_near)`` where ``t_near`` is the reference's reported
    distance: 0 when the origin is inside the box, the slab entry distance
    otherwise.  Broadcasts over (..., 3) rays/boxes.

    XNA's implementation walks the three axes: when ``|d| < 1e-6`` the ray is
    parallel to the slab and misses unless the origin is inside it; otherwise
    the entry/exit distances are accumulated with ``t_near`` clamped at 0.
    """
    d = direction
    o = origin
    parallel = jnp.abs(d) < 1e-6
    inside_slab = (o >= box_min) & (o <= box_max)
    inv = 1.0 / jnp.where(parallel, 1.0, d)
    t1 = (box_min - o) * inv
    t2 = (box_max - o) * inv
    t_lo = jnp.minimum(t1, t2)
    t_hi = jnp.maximum(t1, t2)
    # Parallel axes do not constrain t (but must contain the origin).
    t_lo = jnp.where(parallel, -jnp.inf, t_lo)
    t_hi = jnp.where(parallel, jnp.inf, t_hi)
    t_near = jnp.maximum(jnp.max(t_lo, axis=-1), 0.0)
    t_far = jnp.min(t_hi, axis=-1)
    hit = (
        (t_near <= t_far)
        & (t_far >= 0.0)
        & jnp.all(~parallel | inside_slab, axis=-1)
    )
    return hit, t_near


def barycentric_point(v1, e1, e2, u, v):
    """Object-space hit point ``v1 + e1*u + e2*v`` (MeshOctree.cs:310-322)."""
    return v1 + e1 * u[..., None] + e2 * v[..., None]


def det_space_accept(det, udet, vdet, tdet, cull):
    """Möller–Trumbore acceptance in det-multiplied space (no reciprocal).

    The ONE definition shared by the fused Pallas kernel and the ring's
    dense fallback (dist/bigscene.py) so their accept semantics can never
    diverge.  ``cull``: backface culling accepts det < 0 only (sign(det) ==
    sign(dot(snormal, d)) under the accel/clusters.py packing), so the
    det-multiplied comparisons flip once, statically.  ``cull="reverse"``
    accepts det > 0 only — the exact mirror, for queries cast along the
    REVERSED ray (render/wavefront.py shadow-from-light): a triangle front-
    facing the original direction is back-facing the reversed one.  The
    no-cull branch folds the sign; ``ps > 0`` excludes det == 0, which the
    reference's guardless division also never accepts (u/v become inf/NaN
    and fail — RayExtensions.cs:13-75).
    """
    import jax.numpy as jnp

    if cull == "reverse":
        return ((udet >= 0.0) & (vdet >= 0.0) & (tdet >= 0.0)
                & (udet + vdet <= det) & (det > 0.0))
    if cull:
        return ((udet <= 0.0) & (vdet <= 0.0) & (tdet <= 0.0)
                & (udet + vdet >= det) & (det < 0.0))
    s = jnp.where(det < 0.0, jnp.float32(-1.0), jnp.float32(1.0))
    us, vs, ts_, ps = udet * s, vdet * s, tdet * s, det * s
    return ((us >= 0.0) & (vs >= 0.0) & (ts_ >= 0.0)
            & (us + vs <= ps) & (ps > 0.0))


def det_space_accept_within(det, udet, vdet, tdet, t_max, cull):
    """``det_space_accept`` AND hit distance strictly below ``t_max``.

    Still division-free: ``tdet/det < t_max`` becomes a det-sign-aware
    product comparison.  This is the whole acceptance an occlusion
    (any-hit) query needs — no per-pair distance, no winner, just "is
    there a qualifying hit inside the bound" (IsLightPathObstructed,
    RayTracer.cs:465-502).  Shares ``det_space_accept`` so the occlusion
    and nearest-hit accept semantics can never diverge.
    """
    import jax.numpy as jnp

    ok = det_space_accept(det, udet, vdet, tdet, cull)
    if cull == "reverse":
        return ok & (tdet < t_max * det)
    if cull:
        # Accepted pairs have det < 0 and tdet <= 0: tdet/det < t_max
        # flips once under the negative det.
        return ok & (tdet > t_max * det)
    s = jnp.where(det < 0.0, jnp.float32(-1.0), jnp.float32(1.0))
    return ok & (tdet * s < t_max * (det * s))
