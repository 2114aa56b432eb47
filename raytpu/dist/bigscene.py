"""Ring-sharded intersection — scenes larger than one chip's HBM.

The SURVEY §7 stretch component: when the cluster tables cannot replicate
(BASELINE config 5 scaled up), the TPU-native answer is NOT an out-of-core
pager but a **ring**: partition the spatial cluster order into contiguous
shards, one per device, and rotate RAY BLOCKS around the mesh with
``ppermute`` — each hop intersects the visiting block against the device's
resident shard with the block's running bests as per-ray search bounds, and
a strict-min merge carries the winner along.  After ``N`` hops every ray
has visited every shard and is back on its home device with the exact
global nearest hit.

Why this shape:

- Geometry never moves: each device DMAs only its own shard from its own
  HBM, every hop.  What rides ICI is the ray state (~48 B/ray) — orders of
  magnitude smaller than the geometry, and ``ppermute`` overlaps with the
  next hop's intersection work under XLA's scheduler.
- The in-shard query is the fused Pallas kernel on TPU — the running best
  enters as ``t_max``, so later shards' walks settle early wherever earlier
  shards already found close hits (the front-to-back early-out now spans
  chips).  Off-accelerator (and for unaligned cluster sizes) the exact
  fallback is a dense det-space sweep straight off the packed block
  (``_brute_from_block`` — the SAME acceptance, via
  core/intersect.det_space_accept).
- Contiguous shards of the median-split cluster order are spatially
  compact, so per-shard root caps stay tight.

Tie semantics: hits improve strictly (``t < best``), so an exact cross-
shard distance tie resolves to the shard a ray visits FIRST (its home-ring
order) — rotation-dependent, unlike the single-chip walk's entry-order
tie-break.  Real scenes hit this with probability ~0; documented deviation.

Shading tables are a separate concern: only the per-ray winner is shaded,
so the >HBM renderer shards ``tri_shade`` the same way
(``shard_scene_shade``) and resolves winner rows with one more ring pass
(``gather_rows_ring``); ``render_image_ring`` runs the full unmodified
wavefront on top of both.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raytpu.accel.traverse import Hit

INF = 3.4028235e38


class _ShardScene(NamedTuple):
    """Duck-typed FlatScene for the intersectors (they read .clusters)."""

    clusters: dict


def shard_scene_clusters(flat, mesh: Mesh) -> dict:
    """Split ``flat.clusters`` into per-device shards, sharded over ``mesh``.

    Returns a dict of stacked arrays with leading dim ``mesh.size`` placed
    so device i holds ONLY shard i (leading-axis sharding — the >HBM
    property).  Winner triangle ids need no offset fix-up: block row 16
    already carries GLOBAL ids.

    - ``block``  (N, NCs, 24, C)  packed geometry rows of the shard
    - ``aabb``   (N, 6, 8, NC8s)  the shard's cull table (+BIG padding)
    - ``root``   (N, 1, 8)        per-shard root box + the global margin
    """
    cl = flat.clusters
    n = mesh.size
    cmin = np.asarray(cl["cluster_min"])
    cmax = np.asarray(cl["cluster_max"])
    block = np.asarray(cl["block"])
    nc, _, csize = block.shape
    if cmin.shape[0] != nc:
        # Subcluster bake: cluster_min/max are at LEAF granularity while
        # blocks pack subk leaves per 128 lanes — the ring's in-shard cull
        # runs at block granularity, so group-reduce the leaf AABBs.
        sk = cmin.shape[0] // nc
        cmin = cmin.reshape(nc, sk, 3).min(axis=1)
        cmax = cmax.reshape(nc, sk, 3).max(axis=1)
    ncs = -(-nc // n)
    big = np.float32(3.4028235e38)
    margin = float(np.asarray(cl["root"])[0, 6])

    blocks, aabbs, roots = [], [], []
    for i in range(n):
        lo, hi = i * ncs, min((i + 1) * ncs, nc)
        k = hi - lo
        b = np.zeros((ncs, 24, csize), np.float32)
        if k > 0:
            b[:k] = block[lo:hi]
            # Padding blocks are all-zero => det == 0 => never accepted;
            # their AABB rows stay zero, never consulted (padding columns
            # are infeasible in the cull below).
        blocks.append(b)
        nc8 = max(128, ((-(-ncs // 8) + 127) // 128) * 128)
        aabb = np.full((6, 8 * nc8), big, np.float32)
        if k > 0:
            aabb[0:3, :k] = cmin[lo:hi].T
            aabb[3:6, :k] = cmax[lo:hi].T
        aabbs.append(aabb.reshape(6, 8, nc8))
        root = np.zeros((1, 8), np.float32)
        if k > 0:
            root[0, 0:3] = cmin[lo:hi].min(axis=0)
            root[0, 3:6] = cmax[lo:hi].max(axis=0)
        root[0, 6] = margin
        roots.append(root)

    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))
    put = lambda a: jax.device_put(jnp.asarray(np.stack(a)), shard)
    return {
        "block": put(blocks),
        "aabb": put(aabbs),
        "root": put(roots),
        "n_shards": n,
        "csize": csize,
        # Global slot count: the fused in-shard path's f32 winner-id
        # extraction needs GLOBAL ids < 2^24 (ids in block row 16 are
        # global) — checked in nearest_hit_ring.
        "global_slots": nc * csize,
    }


def nearest_hit_ring(shards: dict, origin, direction, mesh: Mesh,
                     ignore_tri=None, ignore_mesh=None, cull: bool = True,
                     tile_size: int = 256, t_max=None,
                     intersector: str = "auto",
                     any_hit: bool = False) -> Hit:
    """Exact nearest hit over ring-sharded geometry (module docstring).

    ``origin``/``direction``: (R, 3) world rays (replicated or host
    arrays); result order matches input order.

    ``any_hit``: occlusion-query mode — only the ``hit`` boolean (and the
    bounded ``t``) are meaningful (accel/traverse.nearest_hit docstring);
    the in-shard queries then skip all winner bookkeeping.  Every shard is
    still visited (the ring is lockstep), but shards after the first hit
    settle immediately (the running best enters as ``t_max``; a found
    occlusion drives it to 0).
    """
    assert len(mesh.axis_names) == 1, "ring sharding wants a 1-D mesh"
    axis = mesh.axis_names[0]
    n = mesh.size
    f32, i32 = jnp.float32, jnp.int32

    r = origin.shape[0]
    chunk = -(-r // n)
    pad = chunk * n - r
    o = jnp.asarray(origin, f32)
    d = jnp.asarray(direction, f32)
    # Static: with no user ignores, the in-shard kernel elides the per-pair
    # id comparisons entirely (has_ignore=False).
    has_ignore = ignore_tri is not None or ignore_mesh is not None
    itri = (jnp.full((r,), -1, i32) if ignore_tri is None
            else jnp.asarray(ignore_tri, i32))
    imesh = (jnp.full((r,), -1, i32) if ignore_mesh is None
             else jnp.asarray(ignore_mesh, i32))
    tmax = (jnp.full((r,), INF, f32) if t_max is None
            else jnp.asarray(t_max, f32))
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), jnp.nan, f32)])
        d = jnp.concatenate([d, jnp.full((pad, 3), jnp.nan, f32)])
        itri = jnp.concatenate([itri, jnp.full((pad,), -1, i32)])
        imesh = jnp.concatenate([imesh, jnp.full((pad,), -1, i32)])
        tmax = jnp.concatenate([tmax, jnp.zeros((pad,), f32)])

    from raytpu.utils.backend import on_accelerator

    on_hw = on_accelerator()
    use_fused = intersector == "pallas" or (intersector == "auto" and on_hw)
    if on_hw and shards["csize"] % 128 != 0:
        # Mosaic DMA slices must be 128-lane aligned; the dense sweep off
        # the packed block is the exact fallback (NOT nearest_hit_tiled,
        # which would need per-shard triangle SoA tables we don't ship).
        use_fused = False
    if not any_hit and shards.get("global_slots", 0) >= (1 << 24):
        # The fused uvt winner-id extraction needs f32-exact GLOBAL ids
        # (occlusion queries never extract ids — no limit there).
        use_fused = False

    spec = P(axis)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, spec, spec),
        out_specs=(spec,) * 5,
        check_vma=False,  # pallas_call under shard_map (see dist/render.py)
    )
    def ring(blk, aabb, root, o_, d_, it_, im_, tm_):
        local = _ShardScene(clusters={
            "block": blk[0],
            "aabb": aabb[0],
            "root": root[0],
        })
        best = Hit(
            hit=jnp.zeros(o_.shape[:1], bool),
            t=jnp.full(o_.shape[:1], INF, f32),
            u=jnp.zeros(o_.shape[:1], f32),
            v=jnp.zeros(o_.shape[:1], f32),
            tri=jnp.full(o_.shape[:1], -1, i32),
        )
        state = (o_, d_, it_, im_, tm_, best)
        perm = [(i, (i + 1) % n) for i in range(n)]
        for _ in range(n):
            o2, d2, it2, im2, tm2, best = state
            cap = jnp.minimum(tm2, best.t)
            h = _local_query(local, o2, d2, it2, im2, cap, cull,
                             tile_size, use_fused, has_ignore, any_hit)
            upd = h.hit & (h.t < best.t)
            best = Hit(
                hit=best.hit | upd,
                t=jnp.where(upd, h.t, best.t),
                u=jnp.where(upd, h.u, best.u),
                v=jnp.where(upd, h.v, best.v),
                tri=jnp.where(upd, h.tri, best.tri),
            )
            state = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis, perm),
                (o2, d2, it2, im2, tm2, best),
            )
        # n rotations = identity: every block is home with its answer.
        best = state[5]
        return best.hit, best.t, best.u, best.v, best.tri

    hit, t, u, v, tri = ring(
        shards["block"], shards["aabb"], shards["root"],
        o, d, itri, imesh, tmax,
    )
    flat = lambda a: a.reshape(n * chunk)[:r]
    t = flat(t)
    hit = flat(hit)
    return Hit(hit=hit, t=jnp.where(hit, t, INF), u=flat(u), v=flat(v),
               tri=flat(tri))


def _local_query(local, o, d, itri, imesh, cap, cull, tile_size, use_fused,
                 has_ignore, any_hit=False):
    if use_fused:
        from raytpu.kernels.fused import nearest_hit_fused

        return nearest_hit_fused(local, o, d,
                                 ignore_tri=itri if has_ignore else None,
                                 ignore_mesh=imesh if has_ignore else None,
                                 cull=cull,
                                 tile_size=tile_size, t_max=cap,
                                 any_hit=any_hit)
    # XLA fallback: a dense front-to-back chunk scan needs the per-cluster
    # triangle arrays; reconstruct the dict views the tiled path reads from
    # the packed block is overkill — run the brute Möller–Trumbore over the
    # shard's packed geometry instead (exact, VPU-shaped).
    return _brute_from_block(local.clusters, o, d, itri, imesh, cap, cull,
                             has_ignore)


def _brute_from_block(cl, o, d, itri, imesh, cap, cull, has_ignore=True):
    """Dense exact sweep straight off the packed (NCs, 24, C) block.

    Evaluates the same det-space Möller–Trumbore the kernel runs (rows 0-17
    of the block — see accel/clusters.py), blocked per cluster via scan.
    """
    block = cl["block"]
    r = o.shape[0]
    f32, i32 = jnp.float32, jnp.int32
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    wx = dy * oz - dz * oy
    wy = dz * ox - dx * oz
    wz = dx * oy - dy * ox

    def body(carry, g):
        best_t, best_u, best_v, best_tri = carry
        row = lambda k: g[k:k + 1, :]
        det = dx * row(0) + dy * row(1) + dz * row(2)
        udet = (wx * row(6) + wy * row(7) + wz * row(8)
                + dx * row(3) + dy * row(4) + dz * row(5))
        vdet = (wx * row(12) + wy * row(13) + wz * row(14)
                + dx * row(9) + dy * row(10) + dz * row(11))
        tdet = row(15) - (ox * row(0) + oy * row(1) + oz * row(2))
        from raytpu.core.intersect import det_space_accept

        ok = det_space_accept(det, udet, vdet, tdet, cull)
        tid = jax.lax.bitcast_convert_type(g[16:17, :], i32)
        if has_ignore:
            tmesh = jax.lax.bitcast_convert_type(g[17:18, :], i32)
            ok &= (tid != itri[:, None]) & (tmesh != imesh[:, None])
        dist = jnp.where(ok, tdet / det, INF)
        j = jnp.argmin(dist, axis=1)
        rr = jnp.arange(r)
        cand = dist[rr, j]
        upd = cand < best_t
        safe_det = det[rr, j]
        safe_det = jnp.where(safe_det == 0.0, f32(1.0), safe_det)
        best_u = jnp.where(upd, udet[rr, j] / safe_det, best_u)
        best_v = jnp.where(upd, vdet[rr, j] / safe_det, best_v)
        best_tri = jnp.where(upd, tid[0, j], best_tri)
        best_t = jnp.where(upd, cand, best_t)
        return (best_t, best_u, best_v, best_tri), None

    init = (cap, jnp.zeros((r,), f32), jnp.zeros((r,), f32),
            jnp.full((r,), -1, i32))
    (bt, bu, bv, btri), _ = jax.lax.scan(body, init, block)
    hit = btri >= 0
    return Hit(hit=hit, t=jnp.where(hit, bt, INF), u=bu, v=bv, tri=btri)


# ---------------------------------------------------------------------------
# >HBM rendering: ring-sharded shade rows + the full wavefront on the ring.
# ---------------------------------------------------------------------------


def shard_scene_shade(flat, mesh: Mesh) -> dict:
    """Split ``flat.tri_shade`` into per-device row shards over ``mesh``.

    Rows are partitioned by ORIGINAL triangle id ranges (device i holds
    rows [i*Ts, (i+1)*Ts)), independent of the geometry shard boundaries —
    winner resolution is its own ring pass (``gather_rows_ring``), so the
    partitions need not align.  Padding rows are zero (gathered only for
    masked-out lanes)."""
    if flat.tri_shade is None:
        raise ValueError("ring shading needs the packed tri_shade bake")
    n = mesh.size
    rows = np.asarray(flat.tri_shade)
    t = rows.shape[0]
    ts = -(-t // n)
    padded = np.zeros((n * ts, rows.shape[1]), np.float32)
    padded[:t] = rows
    stacked = padded.reshape(n, ts, rows.shape[1])
    axis = mesh.axis_names[0]
    arr = jax.device_put(jnp.asarray(stacked),
                         NamedSharding(mesh, P(axis)))
    return {"shade": arr, "rows_per_shard": ts, "n_shards": n}


def _ring_gather_impl(shade_arr, ids_p, mesh: Mesh, ts: int):
    """Forward ring pass: (N*chunk,) padded ids -> (N*chunk, K) rows."""
    axis = mesh.axis_names[0]
    n = mesh.size
    f32 = jnp.float32
    spec = P(axis)

    @partial(jax.shard_map, mesh=mesh, in_specs=(spec, spec),
             out_specs=spec, check_vma=False)
    def ring(sh, ids_):
        sh = sh[0]  # (Ts, K)
        base = jax.lax.axis_index(axis) * ts
        acc = jnp.zeros((ids_.shape[0], sh.shape[1]), f32)
        state = (ids_, acc)
        perm = [(i, (i + 1) % n) for i in range(n)]
        for _ in range(n):
            ids2, acc2 = state
            local = ids2 - base
            mine = (local >= 0) & (local < ts)
            rows = sh[jnp.clip(local, 0, ts - 1)]
            acc2 = jnp.where(mine[:, None], rows, acc2)
            state = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis, perm), (ids2, acc2))
        return state[1]

    return ring(shade_arr, ids_p)


def _ring_gather_bwd_impl(ct, ids_p, mesh: Mesh, ts: int):
    """Reverse ring pass: cotangent rows travel back to their OWNER shard.

    Each device watches all ray chunks go by (same ring rotation as the
    forward) and scatter-adds the cotangents of ids it owns into its local
    (Ts, K) table — the exact adjoint of the forward's "contribute the
    rows you own".  What rides ICI is ids + cotangent rows, never the
    table: the >HBM property holds in reverse mode too."""
    axis = mesh.axis_names[0]
    n = mesh.size
    f32 = jnp.float32
    spec = P(axis)

    @partial(jax.shard_map, mesh=mesh, in_specs=(spec, spec),
             out_specs=spec, check_vma=False)
    def ring(ct_, ids_):
        ct0 = ct_  # (chunk, K) this device's rays' cotangents
        base = jax.lax.axis_index(axis) * ts
        acc = jnp.zeros((1, ts, ct0.shape[1]), f32)
        state = (ids_, ct0)
        perm = [(i, (i + 1) % n) for i in range(n)]
        for _ in range(n):
            ids2, ct2 = state
            local = ids2 - base
            mine = (local >= 0) & (local < ts)
            contrib = jnp.where(mine[:, None], ct2, 0.0)
            acc = acc.at[0, jnp.clip(local, 0, ts - 1)].add(contrib)
            state = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis, perm), (ids2, ct2))
        return acc

    return ring(ct, ids_p)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _ring_gather_diff(shade_arr, ids_p, mesh, ts):
    return _ring_gather_impl(shade_arr, ids_p, mesh, ts)


def _ring_gather_fwd(shade_arr, ids_p, mesh, ts):
    return _ring_gather_impl(shade_arr, ids_p, mesh, ts), ids_p


def _ring_gather_bwd(mesh, ts, ids_p, ct):
    import numpy as onp

    ct_shade = _ring_gather_bwd_impl(ct, ids_p, mesh, ts)
    return ct_shade, onp.zeros(ids_p.shape, dtype=jax.dtypes.float0)


_ring_gather_diff.defvjp(_ring_gather_fwd, _ring_gather_bwd)


def gather_rows_ring(shade: dict, ids, mesh: Mesh,
                     differentiable: bool = False):
    """Resolve shade rows for per-ray triangle ids from ring shards.

    The winner-resolution pass: the (R,) ``ids`` (original triangle ids;
    negative = none → zero row) rotate around the ring with a (R, 32)
    accumulator; each device contributes the rows it owns.  What rides ICI
    is ids + rows (~132 B/ray/hop) — the shade table itself never moves.

    ``differentiable``: route through the custom-VJP twin whose backward
    ppermutes cotangent rows back to their owner shards and scatter-adds
    locally (``_ring_gather_bwd_impl``) — this is what makes the
    differentiable wavefront (which reads triangle data ONLY through the
    injected gather) work on >HBM ring scenes."""
    n = mesh.size
    ts = shade["rows_per_shard"]
    i32 = jnp.int32
    r = ids.shape[0]
    chunk = -(-r // n)
    pad = chunk * n - r
    ids_p = jnp.asarray(ids, i32)
    if pad:
        ids_p = jnp.concatenate([ids_p, jnp.full((pad,), -1, i32)])
    if differentiable:
        out = _ring_gather_diff(shade["shade"], ids_p, mesh, ts)
    else:
        out = _ring_gather_impl(shade["shade"], ids_p, mesh, ts)
    return out.reshape(n * chunk, -1)[:r]


def strip_for_ring(flat, strip_textures: bool = True):
    """A FlatScene with every per-triangle table (and the atlas) dropped.

    The ring renderer reaches geometry only through the injected
    query/gather backends and texels through the injected fetch, so the
    big tables (tri_shade, the SoA arrays, clusters, octree, the texture
    atlas) need not exist device-resident — this is what makes the scene
    >HBM-capable.  The small tables (materials, meshes, lights, tex_hw)
    stay replicated.  ``strip_textures=False`` keeps the replicated
    atlas (for rendering without texture shards)."""
    none_fields = dict(
        tri_v1=None, tri_e1=None, tri_e2=None, tri_n1=None, tri_n2=None,
        tri_n3=None, tri_uv1=None, tri_uv2=None, tri_uv3=None,
        tri_snormal=None, tri_color=None, tri_mesh=None, tri_valid=None,
        octree=None, clusters=None, tri_shade=None,
    )
    if strip_textures:
        none_fields["textures"] = None
    return flat.replace(**none_fields)


def make_ring_backends(shards: dict, shade: dict, mesh: Mesh,
                       tile_size: int = 256, intersector: str = "auto",
                       differentiable: bool = False):
    """(query, gather) callables for render/wavefront.py injection.

    ``query`` is ``nearest_hit_ring`` over the geometry shards; ``gather``
    resolves packed shade rows with ``gather_rows_ring``.  With these, the
    UNMODIFIED wavefront level/shading code (reflections, refraction,
    shadows with transparent-occluder attenuation, textures) renders
    scenes whose triangle tables exceed one device's HBM.

    ``differentiable``: the gather takes the custom-VJP ring path so
    reverse-mode flows into the sharded shade table (the query is always
    detached by the differentiable wavefront — render/wavefront.py)."""

    def query(scene, origin, direction, *, ignore_tri=None,
              ignore_mesh=None, t_max=None, any_hit=False, cull=True):
        return nearest_hit_ring(
            shards, origin, direction, mesh, ignore_tri=ignore_tri,
            ignore_mesh=ignore_mesh, cull=cull, tile_size=tile_size,
            t_max=t_max, intersector=intersector, any_hit=any_hit)

    def gather(scene, tri):
        from raytpu.render.wavefront import shade_row_views

        return shade_row_views(gather_rows_ring(
            shade, tri, mesh, differentiable=differentiable))

    return query, gather


def render_rays_ring(flat, cfg, origin, direction, mesh: Mesh,
                     shards: Optional[dict] = None,
                     shade: Optional[dict] = None,
                     texshards: Optional[dict] = None):
    """Trace a ray batch against ring-sharded geometry (>HBM scenes).

    ``flat`` provides the replicated small tables (materials, lights,
    textures); its per-triangle tables are not touched — pass
    ``strip_for_ring(flat)`` plus prebuilt ``shards``/``shade`` for a true
    >HBM deployment.  Exact pixel parity with the replicated renderer
    (tested on the 8-device CPU mesh, tests/test_dist.py).

    ``cfg.differentiable``: supported — the gather takes the custom-VJP
    ring path (cotangent rows ppermute back to their owner shards), so
    ``jax.grad`` of a loss over these colors w.r.t. the sharded shade
    table (or params feeding it, see ``make_ring_fit_step``) works with
    the triangle tables never replicated."""
    if mesh is None:
        from raytpu.dist.mesh import make_mesh

        mesh = make_mesh()
    if shards is None:
        shards = shard_scene_clusters(flat, mesh)
    if shade is None:
        shade = shard_scene_shade(flat, mesh)
    texel_fetch = None
    if flat.has_textures:
        if texshards is None and flat.textures is not None:
            texshards = shard_scene_textures(flat, mesh)
        if texshards is not None:
            texel_fetch = make_texel_fetch_ring(
                texshards, mesh, differentiable=cfg.differentiable)
        elif flat.textures is None:
            raise ValueError(
                "textured scene stripped of its atlas: pass texshards="
                "shard_scene_textures(original_flat, mesh)")
    query, gather = make_ring_backends(shards, shade, mesh,
                                       tile_size=cfg.cull_tile,
                                       differentiable=cfg.differentiable)
    from raytpu.render.wavefront import trace_colors

    return trace_colors(flat, cfg, origin, direction, query=query,
                        gather=gather, texel_fetch=texel_fetch)


def render_image_ring(flat, cfg, camera=None, mesh: Optional[Mesh] = None,
                      shards: Optional[dict] = None,
                      shade: Optional[dict] = None,
                      texshards: Optional[dict] = None):
    """Full-frame ring-sharded render → (H, W, 3) float32.

    The >HBM half of BASELINE config 5: rays are data-parallel over the
    ring devices while the geometry + shade tables stay sharded; the
    output frame is assembled on the host exactly like render_image.
    ``mesh`` defaults to a 1-D mesh over all local devices."""
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.render.wavefront import block_order_perm

    camera = camera or Camera(aspect=cfg.width / cfg.height)
    o, d = camera_rays(camera, cfg.width, cfg.height)
    block = max(1, int(cfg.cull_tile ** 0.5))
    perm = block_order_perm(cfg.width, cfg.height, block)
    colors = render_rays_ring(flat, cfg, o[perm], d[perm], mesh,
                              shards=shards, shade=shade,
                              texshards=texshards)
    out = jnp.zeros_like(colors).at[perm].set(colors)
    return out.reshape(cfg.height, cfg.width, 3)


# ---------------------------------------------------------------------------
# Differentiable ring fits: GEOMETRY optimization on >HBM scenes.
# ---------------------------------------------------------------------------

#: tri_shade column layout (render/wavefront.py packed-row contract).
_COL_V1 = slice(0, 3)
_COL_E1 = slice(3, 6)
_COL_E2 = slice(6, 9)
_COL_MID = slice(9, 24)      # n1 n2 n3 uv1 uv2 uv3 (shade constants)
_COL_SN = slice(24, 27)
_COL_TAIL = slice(27, 32)    # color rgba + mesh bits


def extract_ring_params(flat, mesh: Mesh) -> dict:
    """Sharded GEOMETRY params partitioned exactly like shard_scene_shade.

    Returns {tri_v1, tri_e1, tri_e2} as (N, Ts, 3) arrays with device i
    holding only row range [i*Ts, (i+1)*Ts) — the >HBM property for the
    trainable tables.  Padding rows are zero and receive zero gradient
    (no ray ever gathers them with a live mask)."""
    n = mesh.size
    axis = mesh.axis_names[0]
    out = {}
    for f in ("tri_v1", "tri_e1", "tri_e2"):
        a = np.asarray(getattr(flat, f), np.float32)
        t = a.shape[0]
        ts = -(-t // n)
        padded = np.zeros((n * ts, a.shape[1]), np.float32)
        padded[:t] = a
        out[f] = jax.device_put(
            jnp.asarray(padded.reshape(n, ts, a.shape[1])),
            NamedSharding(mesh, P(axis)))
    return out


def ring_shade_from_params(shade_const, params):
    """(N, Ts, 32) shade table with the GEOMETRY columns rebuilt in-graph.

    The jnp twin of diff/params.pack_shade restricted to the geometry
    channels: v1/e1/e2 come from the (sharded) params, the face normal is
    recomputed as normalize(cross(e2, e1)) (TracerModelProcessor.cs:199-
    203), and the shade-constant columns come from the baked table.
    Elementwise on identically-sharded operands — XLA keeps the leading
    axis sharded, no reshard."""
    from raytpu.core.math3d import cross, normalize

    v1 = params["tri_v1"]
    e1 = params["tri_e1"]
    e2 = params["tri_e2"]
    sn = normalize(cross(e2, e1))
    return jnp.concatenate(
        [v1, e1, e2, shade_const[..., _COL_MID], sn,
         shade_const[..., _COL_TAIL]], axis=-1)


def make_ring_fit_step(flat, cfg, mesh: Mesh, optimizer,
                       shards: Optional[dict] = None,
                       shade: Optional[dict] = None,
                       texshards: Optional[dict] = None):
    """Jitted GEOMETRY fit step over ring-sharded (>HBM) scenes.

    BASELINE configs 4x5 composed: inverse rendering at a scale whose
    triangle tables need sharding.  ``flat`` provides the replicated
    small tables (pass ``strip_for_ring(flat)`` + prebuilt shards for a
    true >HBM run); params/gradients are the SHARDED (N, Ts, 3) geometry
    arrays of ``extract_ring_params``.  The loss renders through the
    differentiable ring backends: the shade-row gather's custom VJP
    ppermutes cotangent rows back to their owner shards, so neither the
    forward nor the backward ever materializes a replicated table.

    NOTE: like the replicated fit, the intersector shards go stale as
    geometry moves — rebuild between epochs (diff/fit.py docstring).

    Returns ``step(params, opt_state, origin, direction, target) ->
    (params, opt_state, loss)``.
    """
    import dataclasses

    import optax

    from raytpu.render.wavefront import trace_colors

    if shards is None:
        shards = shard_scene_clusters(flat, mesh)
    if shade is None:
        shade = shard_scene_shade(flat, mesh)
    texel_fetch = None
    if flat.has_textures:
        if texshards is None and flat.textures is not None:
            texshards = shard_scene_textures(flat, mesh)
        if texshards is not None:
            texel_fetch = make_texel_fetch_ring(texshards, mesh,
                                                differentiable=True)
        elif flat.textures is None:
            raise ValueError(
                "textured scene stripped of its atlas: pass texshards="
                "shard_scene_textures(original_flat, mesh)")
    cfg = dataclasses.replace(cfg, differentiable=True)
    shade_const = shade["shade"]

    def loss_fn(params, origin, direction, target):
        sh = dict(shade, shade=ring_shade_from_params(shade_const, params))
        query, gather = make_ring_backends(
            shards, sh, mesh, tile_size=cfg.cull_tile, differentiable=True)
        colors = trace_colors(flat, cfg, origin, direction, query=query,
                              gather=gather, texel_fetch=texel_fetch)
        return jnp.mean((colors - target) ** 2)

    @jax.jit
    def step(params, opt_state, origin, direction, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, origin,
                                                  direction, target)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


# ---------------------------------------------------------------------------
# Ring-sharded texture atlases (>HBM texture corpora).
# ---------------------------------------------------------------------------


def shard_scene_textures(flat, mesh: Mesh) -> Optional[dict]:
    """Split the texture atlas into per-device TEXEL-row shards.

    The (T, Hp, Wp, 3) atlas flattens to (T*Hp*Wp, 3) texel rows
    partitioned by flat index range — the same leading-axis sharding as
    the shade rows, resolved by the same ring pass.  The reference's
    content is heavily textured (RayTraceProjectContent.contentproj:
    90-226); this closes the last replicated big table of the >HBM path
    (r4 verdict missing #3).  Returns None for textureless scenes."""
    if flat.textures is None:
        return None
    n = mesh.size
    tex = np.asarray(flat.textures, np.float32)
    t, hp, wp, _ = tex.shape
    rows = tex.reshape(-1, 3)
    nrows = rows.shape[0]
    ts = -(-nrows // n)
    padded = np.zeros((n * ts, 3), np.float32)
    padded[:nrows] = rows
    axis = mesh.axis_names[0]
    arr = jax.device_put(jnp.asarray(padded.reshape(n, ts, 3)),
                         NamedSharding(mesh, P(axis)))
    return {"texels": arr, "rows_per_shard": ts, "n_shards": n,
            "hp": hp, "wp": wp}


def make_texel_fetch_ring(texshards: dict, mesh: Mesh,
                          differentiable: bool = False):
    """``fetch(tex_id, y, x) -> (..., 3)`` over ring-sharded texels.

    Injected into the wavefront's texture sampling
    (scene/texture.py::lookup_uv ``fetch``) — point filtering resolves
    one ring gather per ray, bilinear four (its 2x2 footprint).  With
    ``differentiable`` the gathers take the custom-VJP ring path, so
    texture-atlas gradients scatter back to their owner shards (ring
    TEXTURE fits compose exactly like the shade-row path)."""
    hp = texshards["hp"]
    wp = texshards["wp"]
    shade_like = {"shade": texshards["texels"],
                  "rows_per_shard": texshards["rows_per_shard"],
                  "n_shards": texshards["n_shards"]}

    def fetch(tex_id, y, x):
        idx = (tex_id * hp + y) * wp + x
        flat_idx = idx.reshape(-1)
        rows = gather_rows_ring(shade_like, flat_idx, mesh,
                                differentiable=differentiable)
        return rows.reshape(idx.shape + (3,))

    return fetch
