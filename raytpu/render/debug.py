"""Single-ray debug casting — the reference's ray visualizer.

The reference's main interactive debugging instrument casts one ray through
the screen center every 80 ms and draws the reflection/refraction path as GPU
line segments (Game1.cs:289-328 -> RayTracer.CastRay's ``points`` capture at
RayTracer.cs:543, :701, :740-747; drawn at Game1.cs:402-416).

:func:`cast_ray_debug` is the batch equivalent: trace rays through the full
wavefront recursion and return every path segment — (start, end) world
positions plus the segment kind (primary / reflection / refraction), bounce
level, hit flag and hit triangle — as flat arrays ready for plotting or
assertion.  :func:`cast_screen_ray` casts through a pixel like the
reference's center-screen ticker.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from raytpu.config import RenderConfig
from raytpu.core.camera import Camera, rays_through_screen
from raytpu.render.wavefront import RaySet, _trace_level

#: Segment kinds.
PRIMARY = 0
REFLECTION = 1
REFRACTION = 2

#: Length drawn for segments that escape to infinity (the reference draws
#: origin + direction * 300 for misses, RayTracer.cs:736).
MISS_LENGTH = 300.0


class RayPath(NamedTuple):
    """Flat (S,) arrays over all captured segments of all input rays."""

    ray: np.ndarray    # input-ray index
    level: np.ndarray  # recursion depth (0 = primary)
    kind: np.ndarray   # PRIMARY / REFLECTION / REFRACTION
    start: np.ndarray  # (S, 3)
    end: np.ndarray    # (S, 3) hit position, or start + dir * MISS_LENGTH
    hit: np.ndarray    # bool — segment terminated on geometry
    tri: np.ndarray    # hit triangle id (-1 on miss)


def cast_ray_debug(scene, cfg: RenderConfig, origin, direction) -> RayPath:
    """Trace ``origin``/``direction`` (R, 3) and capture every path segment.

    Runs the same level expansion as the renderer (wavefront._trace_level),
    so the captured path is exactly what the renderer computes — not a
    reimplementation that could drift.
    """
    origin = jnp.asarray(origin, jnp.float32).reshape(-1, 3)
    direction = jnp.asarray(direction, jnp.float32).reshape(-1, 3)
    r0 = origin.shape[0]
    rays = RaySet(
        origin=origin,
        direction=direction,
        ignore_tri=jnp.full((r0,), -1, jnp.int32),
        ignore_mesh=jnp.full((r0,), -1, jnp.int32),
        cur_ref=jnp.ones((r0,), jnp.float32),
        alive=jnp.ones((r0,), bool),
    )

    segs = []

    def capture(rays_in, hit_mask, frag_pos, tri, level, kind):
        n = rays_in.origin.shape[0]
        # Ray index within the original batch: children are concatenated
        # [reflection | refraction], each block aligned with its parents.
        idx = np.arange(n) % r0
        start = np.asarray(rays_in.origin)
        end_hit = np.asarray(frag_pos)
        # Dead-direction children (e.g. total internal reflection makes
        # refract_xna return NaN, matching the reference's unguarded Snell
        # math) draw as zero-length segments instead of NaN endpoints.
        d = np.asarray(rays_in.direction)
        d = np.where(np.isfinite(d).all(axis=-1, keepdims=True), d, 0.0)
        end_miss = start + d * MISS_LENGTH
        hm = np.asarray(hit_mask)
        alive = np.asarray(rays_in.alive)
        keep = alive
        segs.append((
            idx[keep],
            np.full(keep.sum(), level, np.int32),
            np.full(keep.sum(), kind, np.int32),
            start[keep],
            np.where(hm[keep, None], end_hit[keep], end_miss[keep]),
            hm[keep],
            np.asarray(tri)[keep],
        ))

    level_rays = rays
    kinds = [PRIMARY]
    for level in range(cfg.max_reflections + 1):
        is_max = level == cfg.max_reflections
        # One _trace_level call per level: capture_hits hands back the very
        # (hit, frag_pos) the renderer computed — no second query.
        record, children, (hit, frag) = _trace_level(
            scene, cfg, level_rays, is_max, capture_hits=True)
        mask = record.mask

        # One capture per kind-block at this level.
        n_blocks = len(kinds)
        blk = level_rays.origin.shape[0] // n_blocks if n_blocks else 0
        for b, kind in enumerate(kinds):
            sl = slice(b * blk, (b + 1) * blk)
            sub = RaySet(*(a[sl] for a in level_rays))
            capture(sub, mask[sl], frag[sl], np.asarray(hit.tri)[sl],
                    level, kind)

        if is_max:
            break
        refl_rays, refr_rays = children
        if scene.has_transparent and refr_rays is not None:
            import jax

            level_rays = jax.tree.map(
                lambda x, y: jnp.concatenate([x, y]), refl_rays, refr_rays
            )
            kinds = [REFLECTION] * len(kinds) + [REFRACTION] * len(kinds)
        else:
            level_rays = refl_rays
            kinds = [REFLECTION] * len(kinds)

    cat = lambda i: np.concatenate([s[i] for s in segs])
    return RayPath(ray=cat(0), level=cat(1), kind=cat(2), start=cat(3),
                   end=cat(4), hit=cat(5), tri=cat(6))


def cast_screen_ray(scene, cfg: RenderConfig, camera: Camera,
                    px: float = None, py: float = None) -> RayPath:
    """Cast through a pixel (default: screen center, like Game1.cs:307)."""
    if px is None:
        px = cfg.width / 2.0
    if py is None:
        py = cfg.height / 2.0
    o, d = rays_through_screen(camera, cfg.width, cfg.height,
                               jnp.asarray([px], jnp.float32),
                               jnp.asarray([py], jnp.float32))
    return cast_ray_debug(scene, cfg, o, d)


# ---------------------------------------------------------------------------
# Wireframe overlays — the reference's AABB / octree-node visualization
# (DrawableBox.cs:29-97, OctreeSpatialManager.DrawNode at
# OctreeSpatialManager.cs:277-310, #if DEBUG blocks in SceneObject.cs).

_BOX_EDGES = [
    (0, 1), (1, 3), (3, 2), (2, 0),  # bottom
    (4, 5), (5, 7), (7, 6), (6, 4),  # top
    (0, 4), (1, 5), (2, 6), (3, 7),  # verticals
]


def _project(points, camera: Camera, width: int, height: int):
    """World points -> pixel coordinates + in-front mask (row-vector XNA
    view/projection, matching core/xna.py conventions)."""
    from raytpu.core import xna

    view = np.asarray(camera.view())
    proj = np.asarray(camera.projection())
    p = np.asarray(points, np.float32)
    xyz, w = xna.transform_homogeneous(jnp.asarray(p @ view[:3, :3]
                                                   + view[3, :3]), proj)
    xyz = np.asarray(xyz)
    w = np.asarray(w)
    in_front = w > 1e-6
    ndc = xyz / np.where(in_front, w, 1.0)[..., None]
    px = (ndc[..., 0] * 0.5 + 0.5) * width
    py = (1.0 - (ndc[..., 1] * 0.5 + 0.5)) * height
    return np.stack([px, py], axis=-1), in_front


def _draw_line(img, p0, p1, color):
    """Clipped DDA line rasterization into an (H, W, 3) float image."""
    h, w = img.shape[:2]
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
    xs = np.linspace(p0[0], p1[0], n + 1)
    ys = np.linspace(p0[1], p1[1], n + 1)
    xi = np.round(xs).astype(int)
    yi = np.round(ys).astype(int)
    ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    img[yi[ok], xi[ok]] = color


def draw_aabbs(image, camera: Camera, box_min, box_max,
               color=(0.0, 1.0, 0.0)):
    """Overlay wireframe AABBs onto a rendered image (returns a copy).

    ``box_min``/``box_max``: (B, 3).  Edges with either endpoint behind the
    camera are skipped (the reference's GPU line lists were clipped by the
    rasterizer).  Use with scene.clusters["cluster_min"/"cluster_max"] or
    octree node bounds for the structure-debugging views the reference got
    from DrawNode.
    """
    img = np.array(image, np.float32, copy=True)
    h, w = img.shape[:2]
    bmin = np.asarray(box_min, np.float32).reshape(-1, 3)
    bmax = np.asarray(box_max, np.float32).reshape(-1, 3)
    color = np.asarray(color, np.float32)
    for mn, mx in zip(bmin, bmax):
        corners = np.asarray([
            [mn[0], mn[1], mn[2]], [mx[0], mn[1], mn[2]],
            [mn[0], mx[1], mn[2]], [mx[0], mx[1], mn[2]],
            [mn[0], mn[1], mx[2]], [mx[0], mn[1], mx[2]],
            [mn[0], mx[1], mx[2]], [mx[0], mx[1], mx[2]],
        ], np.float32)
        px, front = _project(corners, camera, w, h)
        for a, b in _BOX_EDGES:
            if front[a] and front[b]:
                _draw_line(img, px[a], px[b], color)
    return img


def draw_ray_path(image, camera: Camera, path: RayPath,
                  colors=((1.0, 1.0, 0.0), (0.0, 1.0, 1.0),
                          (1.0, 0.0, 1.0))):
    """Overlay captured ray segments (cast_ray_debug) onto an image.

    Segment color by kind: primary / reflection / refraction — the batch
    analog of the reference's line-list draw (Game1.cs:402-416).
    """
    img = np.array(image, np.float32, copy=True)
    h, w = img.shape[:2]
    for i in range(len(path.ray)):
        ends = np.stack([path.start[i], path.end[i]])
        px, front = _project(ends, camera, w, h)
        if front.all():
            _draw_line(img, px[0], px[1],
                       np.asarray(colors[int(path.kind[i]) % len(colors)]))
    return img
