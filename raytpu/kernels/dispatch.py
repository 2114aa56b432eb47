"""Pallas-backed nearest-hit: XLA cull + fused kernel + exact-overflow guard.

The front half (tile bounds + conservative cluster cull) is shared with the
XLA tiled backend (accel/tiled.py::prepare_tiles); ``select_candidates``
compacts each tile's first ``maxc`` masked clusters *by cluster index* and
sorts that subset by entry bound — equal to the ``maxc`` nearest only when
the tile has at most ``maxc`` candidates.  The fused kernel
(kernels/intersect.py) walks the subset front-to-back.  Any tile with more
than ``maxc`` candidates (overflow) therefore ALWAYS continues in the exact
lockstep XLA tail via ``lax.cond`` — an index-excluded cluster can lie
nearer than everything the kernel saw, so an early kernel settle proves
nothing for overflowed tiles — and correctness never depends on the cap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytpu.accel.tiled import (INF, lockstep_chunks, nearest_hit_tiled,
                                prepare_tiles, select_candidates)
from raytpu.accel.traverse import Hit
from raytpu.kernels.intersect import intersect_tiles


def _default_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def nearest_hit_pallas(scene, origin, direction, ignore_tri=None,
                       ignore_mesh=None, cull: bool = True,
                       tile_size: int = 1024, chunk: int = 1,
                       t_max=None, maxc: int = 512,
                       any_hit: bool = False, interpret=None) -> Hit:
    """Exact nearest hit via the fused Pallas kernel."""
    del chunk  # the kernel always walks one cluster at a time
    if interpret is None:
        interpret = _default_interpret()
    cl = scene.clusters
    nc = cl["cluster_min"].shape[0]
    csize = cl["block"].shape[2]
    if not interpret and csize % 128 != 0:
        # Mosaic DMA slices must be 128-lane aligned; small test clusters
        # run through the exact XLA backend instead.
        return nearest_hit_tiled(
            scene, origin, direction, ignore_tri, ignore_mesh, cull,
            tile_size=tile_size, t_max=t_max, any_hit=any_hit,
        )
    maxc = min(maxc, nc)

    r = origin.shape[0]
    (o, d, itri, imesh, tmax), (mask, entry) = prepare_tiles(
        scene, origin, direction, ignore_tri, ignore_mesh, t_max, tile_size
    )
    nt, ts = o.shape[:2]

    # Front-to-back top-maxc candidates per tile (ascending entry bound).
    keys, cand, counts_raw = select_candidates(mask, entry, maxc)
    counts = jnp.minimum(counts_raw, maxc)

    bt, bu, bv, btri, iters = intersect_tiles(
        counts, cand, keys, o, d, tmax, itri, imesh,
        cl["block"], cull=cull, any_hit=any_hit, interpret=interpret,
    )

    if maxc < nc:
        # Overflow tail: every tile with more than maxc candidates continues
        # in the exact lockstep scan, seeded with the kernel's best state.
        # select_candidates keeps the first maxc candidates BY CLUSTER INDEX
        # (not the maxc nearest), so an excluded cluster can have a smaller
        # entry bound than anything the kernel tested — an early kernel
        # settle (iters < maxc) proves nothing for an overflowed tile.  The
        # tail restarts at chunk 0 (already-tested clusters re-test as
        # no-ops under strict-min and the settle check skips past them
        # immediately), so correctness never depends on which subset the
        # kernel saw.
        pending = counts_raw > maxc

        def tail(args):
            bt, bu, bv, btri = args
            keys_f, cand_f = jax.lax.sort_key_val(
                entry,
                jnp.broadcast_to(
                    jnp.arange(nc, dtype=jnp.int32), entry.shape
                ),
            )
            init = (~pending, bt, bu, bv, btri)
            return lockstep_chunks(
                cl, o, d, itri, imesh, cand_f, keys_f, counts_raw,
                1, cull, init, any_hit=any_hit, tmax0=tmax,
            )

        bt, bu, bv, btri = jax.lax.cond(
            jnp.any(pending), tail, lambda a: a, (bt, bu, bv, btri)
        )

    flat = lambda a: a.reshape(nt * ts)[:r]
    btri = flat(btri)
    hit = btri >= 0
    return Hit(
        hit=hit,
        t=jnp.where(hit, flat(bt), INF),
        u=flat(bu),
        v=flat(bv),
        tri=btri,
    )
