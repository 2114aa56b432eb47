"""Round-5 lab 16: residual decomposition + keyed-pick A/B (select-eps chain).

Lab 15 (linear, RPC-free): near 36.6 / shad 29.6 / frame 117.8 ms device
=> 51.6 ms of the frame is NOT intersection.  Decompose it:

  near:      production nearest query
  rowg:      near + the (R, 32) tri_shade row gather
  rowsmall:  rowg + the mesh_material / mat_interp_normals small gathers
  shade:     full shading minus the shadow query (light term replaced by
             a constant) — pack + row gather + normal/frag math + combine

Run once on the keyed working tree and once on the stashed baseline to
A/B the keyed pick with the trustworthy select-eps chain.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from raytpu.core.camera import Camera, camera_rays
    from raytpu.kernels.fused import nearest_hit_fused
    from raytpu.render.wavefront import block_order_perm

    sync = lambda x: float(np.asarray(x))
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    scene, _ = build_scene(1e6)
    res = 1024
    cam = Camera(position=(0.0, 28.0, 34.0), target=(0.0, 0.0, 0.0),
                 aspect=1.0)
    o, d = camera_rays(cam, res, res)
    perm = block_order_perm(res, res, 16)
    o = jax.device_put(o[perm])
    d = jax.device_put(d[perm])
    flat = scene.flatten(build_octree=False, cluster_size=128)
    print("bake done", flush=True)

    def chain(fn, n):
        @jax.jit
        def go(fl, oo, dd):
            def step(acc, _):
                eps = jax.lax.select(acc == jnp.float32(-1.234e-35),
                                    jnp.float32(1e-30), jnp.float32(0.0))
                return acc + fn(fl, oo + eps, dd), None

            acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return acc

        return go

    def near(fl, oo, dd):
        h = nearest_hit_fused(fl, oo, dd, tile_size=256, layout="t",
                              plane=True)
        return h.t[0]

    def rowg(fl, oo, dd):
        h = nearest_hit_fused(fl, oo, dd, tile_size=256, layout="t",
                              plane=True)
        td = fl.tri_shade[h.tri]
        return h.t[0] + td[0, 0]

    def rowsmall(fl, oo, dd):
        h = nearest_hit_fused(fl, oo, dd, tile_size=256, layout="t",
                              plane=True)
        td = fl.tri_shade[h.tri]
        mesh = jax.lax.bitcast_convert_type(td[..., 31], jnp.int32)
        mat = fl.mesh_material[mesh]
        interp = fl.mat_interp_normals[mat]
        return (h.t[0] + td[0, 0] + mat[0].astype(jnp.float32)
                + interp[0].astype(jnp.float32))

    def shade(fl, oo, dd):
        # Full level-0 shading minus the shadow query: row gather +
        # normal interp/normalize + frag pos + surface*constant light.
        h = nearest_hit_fused(fl, oo, dd, tile_size=256, layout="t",
                              plane=True)
        td = fl.tri_shade[h.tri]
        mesh = jax.lax.bitcast_convert_type(td[..., 31], jnp.int32)
        mat = fl.mesh_material[mesh]
        interp = fl.mat_interp_normals[mat]
        n1, n2, n3 = td[..., 9:12], td[..., 12:15], td[..., 15:18]
        u1 = h.u[..., None]
        v1 = h.v[..., None]
        nl = n1 + (n2 - n1) * u1 + (n3 - n1) * v1
        nl = nl / jnp.maximum(jnp.linalg.norm(nl, axis=-1, keepdims=True),
                              1e-20)
        normal = jnp.where(interp[..., None], nl, td[..., 24:27])
        frag = td[..., 0:3] + td[..., 3:6] * u1 + td[..., 6:9] * v1
        surface = td[..., 27:30]
        img = surface * (0.3 + 0.7 * jnp.abs(normal[..., 1:2]))
        img = jnp.where(h.hit[..., None], img, 0.0)
        return img[0, 0] + frag[0, 0]

    variants = {}
    for n in (1, 4):
        variants[f"near_c{n}"] = chain(near, n)
        variants[f"rowg_c{n}"] = chain(rowg, n)
        variants[f"rowsmall_c{n}"] = chain(rowsmall, n)
        variants[f"shade_c{n}"] = chain(shade, n)

    for name, fn in variants.items():
        sync(fn(flat, o, d))
        print(f"compiled {name}", flush=True)

    times = {k: np.inf for k in variants}
    for r_i in range(10):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            sync(fn(flat, o, d))
            times[name] = min(times[name], time.perf_counter() - t0)
        print(f"round {r_i}: " + " ".join(
            f"{k}={v*1e3:.1f}" for k, v in times.items()), flush=True)
    print("FINAL: " + " ".join(
        f"{k}={v*1e3:.1f}ms" for k, v in times.items()), flush=True)
    for m in ("near", "rowg", "rowsmall", "shade"):
        per = (times[f"{m}_c4"] - times[f"{m}_c1"]) / 3.0
        print(f"device-true {m}: {per*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
