"""Pallas-backed nearest-hit: XLA cull + fused kernel + exact-overflow guard.

The front half (tile bounds + conservative cluster cull) is shared with the
XLA tiled backend (accel/tiled.py::prepare_tiles); ``jax.lax.top_k`` selects
each tile's ``maxc`` nearest candidate clusters; the fused kernel
(kernels/intersect.py) walks them front-to-back.  If any tile has more than
``maxc`` candidates (overflow), results fall back to the exact lockstep XLA
backend via ``lax.cond`` so correctness never depends on the cap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytpu.accel.tiled import INF, nearest_hit_tiled, prepare_tiles
from raytpu.accel.traverse import Hit
from raytpu.kernels.intersect import intersect_tiles


def _default_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def nearest_hit_pallas(scene, origin, direction, ignore_tri=None,
                       ignore_mesh=None, cull: bool = True,
                       tile_size: int = 1024, chunk: int = 1,
                       t_max=None, maxc: int = 512,
                       interpret=None) -> Hit:
    """Exact nearest hit via the fused Pallas kernel."""
    del chunk  # the kernel always walks one cluster at a time
    if interpret is None:
        interpret = _default_interpret()
    cl = scene.clusters
    nc = cl["cluster_min"].shape[0]
    csize = cl["geom"].shape[2]
    if not interpret and csize % 128 != 0:
        # Mosaic DMA slices must be 128-lane aligned; small test clusters
        # run through the exact XLA backend instead.
        return nearest_hit_tiled(
            scene, origin, direction, ignore_tri, ignore_mesh, cull,
            tile_size=tile_size, t_max=t_max,
        )
    maxc = min(maxc, nc)

    r = origin.shape[0]
    (o, d, itri, imesh, tmax), (mask, entry) = prepare_tiles(
        scene, origin, direction, ignore_tri, ignore_mesh, t_max, tile_size
    )
    nt, ts = o.shape[:2]

    # Front-to-back top-maxc candidates per tile (ascending entry bound).
    neg, cand = jax.lax.top_k(-entry, maxc)
    keys = -neg
    counts_raw = jnp.sum(mask, axis=1)
    counts = jnp.minimum(counts_raw, maxc)

    bt, bu, bv, btri = intersect_tiles(
        counts, cand, keys, o, d, tmax, itri, imesh,
        cl["geom"], cl["ids"], cull=cull, interpret=interpret,
    )
    flat = lambda a: a.reshape(nt * ts)[:r]
    btri = flat(btri)
    hit = btri >= 0
    kernel_hit = Hit(
        hit=hit,
        t=jnp.where(hit, flat(bt), INF),
        u=flat(bu),
        v=flat(bv),
        tri=btri,
    )
    if maxc >= nc:
        return kernel_hit  # no tile can overflow

    overflow = jnp.any(counts_raw > maxc)

    def exact(_):
        return nearest_hit_tiled(
            scene, origin, direction, ignore_tri, ignore_mesh, cull,
            tile_size=tile_size, t_max=t_max,
        )

    return jax.lax.cond(overflow, exact, lambda _: kernel_hit, None)
