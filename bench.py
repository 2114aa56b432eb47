"""Headline benchmark: rays/sec/chip (primary + shadow) on a 1M-triangle mesh.

Matches BASELINE.json's primary metric ("rays/sec/chip (primary+shadow) at
1M tris"; north star >= 200M rays/s/chip on TPU v5p).  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "rays/s/chip", "vs_baseline": N}

Scene: ~1M-triangle height-field mesh + one spot light.  Each frame casts
W*H primary rays through the flattened-octree traversal plus W*H shadow
rays (one light), i.e. rays/frame = 2 * W * H.  The renderer is the same
jitted wavefront program the framework uses for real renders.

Also times one differentiable-render gradient step (pixel MSE, GEOMETRY
params — BASELINE's "backward rays/s" metric) at BENCH_BACK_RES (default
512) and reports it as the ``backward_rays_per_s`` key of the same JSON
line.

Environment knobs: BENCH_TRIS (default ~1e6), BENCH_RES (default 1024),
BENCH_REPS (default 4), BENCH_INTERSECTOR (octree|brute|pallas),
BENCH_BACKWARD (default 1; 0 skips it), BENCH_BACK_RES (default 512).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TARGET_RAYS_PER_S = 200e6  # BASELINE.json north_star


def build_scene(n_tris: int, textured: bool = False, tex_size: int = 128):
    from raytpu.scene.lights import SpotLight
    from raytpu.scene.procedural import subdivided_plane
    from raytpu.scene.types import Material, Scene, SceneObject

    mat = Material(reflectiveness=0.0, diffuse_color=(0.7, 0.6, 0.5, 1.0))
    if textured:
        # Small atlas => heavy texel-id collisions across bilinear
        # footprints — the contended case the texture-gradient scatter
        # must survive (SURVEY.md §7 hard parts).
        yy, xx = np.meshgrid(np.arange(tex_size), np.arange(tex_size),
                             indexing="ij")
        checker = (((xx // 8) + (yy // 8)) % 2).astype(np.uint8)
        tex = np.stack([checker * 180 + 40, checker * 120 + 60,
                        np.full_like(checker, 90)], axis=-1).astype(np.uint8)
        mat = Material(reflectiveness=0.0, use_texture=True, texture=tex,
                       diffuse_color=(0.7, 0.6, 0.5, 1.0))
    divisions = max(8, int(round((n_tris / 2) ** 0.5)))
    mesh = subdivided_plane(
        size=(40.0, 40.0),
        divisions=divisions,
        material=mat,
        uv_scale=4.0 if textured else 1.0,
        height_fn=lambda x, z: 2.0 * np.sin(x * 0.7) * np.cos(z * 0.7)
        + 0.5 * np.sin(x * 3.1) * np.sin(z * 2.3),
    )
    scene = Scene(
        objects=[SceneObject(meshes=[mesh])],
        lights=[SpotLight(position=(0.0, 30.0, 25.0),
                          direction=(0.0, -0.7682213, -0.6401844))],
    )
    return scene, mesh.num_triangles


def main():
    import jax

    from raytpu.config import Intersector, Quantize, RenderConfig
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.render.wavefront import block_order_perm, render_rays

    n_tris = int(float(os.environ.get("BENCH_TRIS", 1e6)))
    res = int(os.environ.get("BENCH_RES", 1024))
    reps = int(os.environ.get("BENCH_REPS", 4))
    backend = os.environ.get("BENCH_INTERSECTOR", "pallas")
    # Cluster granularity of the fused-kernel bake (128 = one leaf per
    # 128-lane block; 64/32 pack subk spatial leaves per block with
    # per-sibling culling + fitted-plane rows — kernels/fused.py r5).
    csize = int(os.environ.get("BENCH_CSIZE", 128))

    t0 = time.perf_counter()
    scene, true_tris = build_scene(n_tris)
    flat = scene.flatten(
        build_octree=backend == "octree", leaf_threshold=50, max_depth=12,
        build_clusters=backend in ("tiled", "pallas"),
        cluster_size=csize,
    )
    setup_s = time.perf_counter() - t0

    cfg = RenderConfig(
        width=res,
        height=res,
        max_reflections=0,  # primary + shadow only: the headline metric
        intersector={
            "auto": Intersector.AUTO,
            "octree": Intersector.OCTREE,
            "brute": Intersector.BRUTE,
            "pallas": Intersector.PALLAS,
            "tiled": Intersector.TILED,
        }[backend],
        # One lax.map body for the whole opaque frame (no refraction
        # doubling): measured ~4% faster than 32k-ray tiles on v5e.
        tile_pixels=int(os.environ.get("BENCH_TILE", res * res)),
        quantize=Quantize.NONE,
    )
    camera = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                    aspect=1.0)
    origin, direction = camera_rays(camera, cfg.width, cfg.height)
    # Square-block ray order, exactly as render_image traces frames.
    perm = block_order_perm(cfg.width, cfg.height, max(1, int(cfg.cull_tile ** 0.5)))
    origin = jax.device_put(origin[perm])
    direction = jax.device_put(direction[perm])

    fn = jax.jit(lambda s, o, d: render_rays(s, cfg, o, d))

    def sync(out):
        # Force a device-to-host scalar copy: honest completion even on
        # backends where block_until_ready returns before execution
        # finishes (observed on the experimental axon tunnel platform).
        return float(np.asarray(out.sum()))

    t0 = time.perf_counter()
    img = fn(flat, origin, direction)
    sync(img)
    compile_s = time.perf_counter() - t0

    hit_frac = float(np.asarray(img).any(axis=-1).mean())

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(flat, origin, direction))
        times.append(time.perf_counter() - t0)
    best = min(times)

    rays_per_frame = 2 * res * res  # primary + shadow (1 light)
    single_frame_rays_per_s = rays_per_frame / best

    # Sustained throughput: N distinct frames rendered in ONE dispatch
    # (lax.scan with a per-frame camera jitter — real, distinct work per
    # frame; the carry serializes them).  This is the production serving
    # shape (animate renders frame streams) and amortizes the per-dispatch
    # tunnel RPC (~24 ms/sample on this rig, docs/PERF.md r4-r5) that the
    # single-frame number above fully pays.  Both are reported.
    nsus = int(os.environ.get("BENCH_SUSTAIN", 4))
    import jax.numpy as jnp

    @jax.jit
    def sustained_fn(s, o, d, jitters):
        def frame(acc, j):
            img = render_rays(s, cfg, o + j, d)
            return acc + img.sum(), None

        acc, _ = jax.lax.scan(frame, jnp.float32(0.0), jitters)
        return acc

    jitters = (np.linspace(0.0, 1e-3, nsus, dtype=np.float32)[:, None]
               * np.asarray([[1.0, 1.0, 0.0]], np.float32))
    sync(sustained_fn(flat, origin, direction, jitters))  # compile
    sus_times = []
    for _ in range(max(2, reps // 2)):
        t0 = time.perf_counter()
        sync(sustained_fn(flat, origin, direction, jitters))
        sus_times.append(time.perf_counter() - t0)
    sus_best = min(sus_times)
    rays_per_s = nsus * rays_per_frame / sus_best

    backward_rays_per_s = None
    if os.environ.get("BENCH_BACKWARD", "1") == "1":
        backward_rays_per_s = bench_backward(flat, cfg, sync)

    backward_texture_rays_per_s = None
    if os.environ.get("BENCH_BACKWARD_TEXTURE", "1") == "1":
        scene_t, _ = build_scene(n_tris, textured=True)
        flat_t = scene_t.flatten(build_octree=False, cluster_size=csize)
        backward_texture_rays_per_s = bench_backward(
            flat_t, cfg, sync, fields="texture")

    print(
        f"# device={jax.devices()[0].device_kind} tris={true_tris} "
        f"res={res} backend={backend} setup={setup_s:.1f}s "
        f"compile={compile_s:.1f}s best={best * 1e3:.1f}ms "
        f"times_ms={[round(t * 1e3, 1) for t in times]} "
        f"sustained{nsus}={sus_best * 1e3:.1f}ms "
        f"nonblack={hit_frac:.3f} "
        f"backward={backward_rays_per_s} "
        f"backward_tex={backward_texture_rays_per_s}",
        file=sys.stderr,
    )
    out = {
        "metric": "rays_per_sec_per_chip_1Mtri_primary_shadow",
        "value": round(rays_per_s),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_s / TARGET_RAYS_PER_S, 4),
        "single_frame_rays_per_s": round(single_frame_rays_per_s),
        "sustained_frames_per_dispatch": nsus,
    }
    if backward_rays_per_s is not None:
        out["backward_rays_per_s"] = round(backward_rays_per_s)
    if backward_texture_rays_per_s is not None:
        out["backward_texture_rays_per_s"] = round(
            backward_texture_rays_per_s)
    print(json.dumps(out))


def bench_backward(flat, cfg, sync, fields: str = "geometry"):
    """rays/s for one differentiable-render gradient step (pixel MSE) —
    BASELINE.json's "backward rays/s" metric.

    ``fields="geometry"``: GEOMETRY params (vertex/edge tables; engages
    the geometry-pruned (T, 12) gather VJP).  ``fields="texture"``: the
    texture ATLAS is the trainable — gradients scatter-add over bilinear
    texel footprints (4 texels/ray, heavy collisions at small atlases:
    the contended case, verdict r4 #4); the run forces bilinear
    filtering so the footprint path is what gets measured.

    The target is the scene's own render (zero-ish loss, but the backward
    work is identical for any target).  Counts primary + shadow rays of the
    differentiable forward, i.e. the rays whose shading is differentiated.
    """
    import dataclasses
    import time

    import jax
    import optax

    from raytpu.config import Quantize, TextureFiltering
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.diff.fit import make_fit_step
    from raytpu.diff.params import GEOMETRY, TEXTURE, extract_params
    from raytpu.render.wavefront import block_order_perm, render_rays

    res_b = int(os.environ.get("BENCH_BACK_RES", 512))
    reps = int(os.environ.get("BENCH_REPS", 4))
    # tile_pixels must follow the backward resolution: inheriting the
    # forward frame's (res^2) pads the ray set 4x with phantom rays that
    # get traced AND differentiated (measured 3x backward inflation).
    cfg_b = dataclasses.replace(cfg, width=res_b, height=res_b,
                                quantize=Quantize.NONE,
                                tile_pixels=res_b * res_b)
    if fields == "texture":
        cfg_b = dataclasses.replace(cfg_b,
                                    filtering=TextureFiltering.BILINEAR)
    camera = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                    aspect=1.0)
    o, d = camera_rays(camera, res_b, res_b)
    perm = block_order_perm(res_b, res_b, max(1, int(cfg_b.cull_tile ** 0.5)))
    o = jax.device_put(o[perm])
    d = jax.device_put(d[perm])
    target = jax.jit(lambda s, oo, dd: render_rays(s, cfg_b, oo, dd))(
        flat, o, d)

    field_list = GEOMETRY if fields == "geometry" else TEXTURE
    params = extract_params(flat, field_list)
    optimizer = optax.sgd(0.0)  # timing only: do not perturb the scene
    opt_state = optimizer.init(params)
    step = make_fit_step(flat, cfg_b, optimizer, fields=field_list)

    _, _, loss = step(params, opt_state, o, d, target)
    sync(loss)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, _, loss = step(params, opt_state, o, d, target)
        sync(loss)
        times.append(time.perf_counter() - t0)
    return 2 * res_b * res_b / min(times)


if __name__ == "__main__":
    main()
