"""NumPy oracle port of the reference tracer (RayTracer.cs semantics).

A deliberately *slow, scalar, recursive* implementation that follows
``CastRay`` (RayTracer.cs:506-737) statement by statement so the JAX
wavefront renderer can be validated allclose against it (SURVEY.md §4:
"a pure-NumPy CPU port of C2/C3/C12 semantics as the oracle").

Semantics replicated exactly:

- Möller–Trumbore with backface culling (RayExtensions.cs:42-75), scan-order
  strict-min nearest hit (the octree's first-hit-group early-stop is
  *corrected* to exact-nearest — documented deviation, accel/octree.py).
- ``ignoreTriangle`` / ``ignoreObject`` self-intersection avoidance.
- Normal interpolation or face normal by material (RayTracer.cs:520-531).
- Shadow attenuation through transparent occluders (RayTracer.cs:465-502).
- Spot/directional light formulas (SpotLight.cs:37-62,
  DirectionalLight.cs:23-30), including the ``surfaceDot^12`` term.
- Reflection: ``lerp(reflColor, surface, 1-refl) * light`` with XNA byte
  ``Color`` quantization of every CastRay return (round-half-to-even —
  XNA PackUtils.ClampAndRound).
- The reference's refraction n1/n2 selection quirk (RayTracer.cs:656-667:
  the *first* entry into glass is computed as an exit) and vector Snell
  with NaN on total internal reflection (RayTracer.cs:675-694).
- Texture Point/Bilinear sampling with Clamp/Wrap/Mirror addressing and the
  reference's exact truncation/IEEERemainder/+0.5 quirks (Material.cs:71-232).
- Primary rays via XNA Viewport.Unproject of integer pixel coords at depths
  0 and 1 (RayTracer.cs:410-421).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np

from raytpu.config import Quantize, RenderConfig, TextureFiltering, UVAddressMode

F32 = np.float32
FLOAT_MAX = np.float32(3.4028235e38)


def _quantize(v: np.ndarray) -> np.ndarray:
    """XNA new Color(Vector3) → ToVector3 roundtrip (round-half-to-even)."""
    return np.rint(np.clip(v, 0.0, 1.0) * 255.0).astype(F32) / F32(255.0)


@dataclasses.dataclass
class OracleScene:
    """NumPy snapshot of a FlatScene."""

    tri_v1: np.ndarray
    tri_e1: np.ndarray
    tri_e2: np.ndarray
    tri_n: np.ndarray  # (N, 3, 3)
    tri_uv: np.ndarray  # (N, 3, 2)
    tri_snormal: np.ndarray
    tri_color: np.ndarray  # (N, 4)
    tri_mesh: np.ndarray
    tri_valid: np.ndarray
    mesh_material: np.ndarray
    mesh_convex: np.ndarray
    mat_reflect: np.ndarray
    mat_transparent: np.ndarray
    mat_refraction: np.ndarray
    mat_use_texture: np.ndarray
    mat_interp_normals: np.ndarray
    mat_texture: np.ndarray
    textures: np.ndarray
    tex_hw: np.ndarray
    lights: dict

    @staticmethod
    def from_flat(flat) -> "OracleScene":
        g = lambda a: np.asarray(a)
        return OracleScene(
            tri_v1=g(flat.tri_v1),
            tri_e1=g(flat.tri_e1),
            tri_e2=g(flat.tri_e2),
            tri_n=np.stack([g(flat.tri_n1), g(flat.tri_n2), g(flat.tri_n3)], 1),
            tri_uv=np.stack([g(flat.tri_uv1), g(flat.tri_uv2), g(flat.tri_uv3)], 1),
            tri_snormal=g(flat.tri_snormal),
            tri_color=g(flat.tri_color),
            tri_mesh=g(flat.tri_mesh),
            tri_valid=g(flat.tri_valid),
            mesh_material=g(flat.mesh_material),
            mesh_convex=g(flat.mesh_convex),
            mat_reflect=g(flat.mat_reflect),
            mat_transparent=g(flat.mat_transparent),
            mat_refraction=g(flat.mat_refraction),
            mat_use_texture=g(flat.mat_use_texture),
            mat_interp_normals=g(flat.mat_interp_normals),
            mat_texture=g(flat.mat_texture),
            textures=g(flat.textures),
            tex_hw=g(flat.tex_hw),
            lights={k: np.asarray(v) for k, v in flat.lights.items()},
        )


def _normalize(v):
    return v / np.linalg.norm(v)


def nearest_hit(sc: OracleScene, o, d, ignore_tri=-1, ignore_mesh=-1,
                cull=True):
    """Exact nearest hit, vectorized over triangles (scan-order tie-break)."""
    t_vec = o[None, :] - sc.tri_v1
    p = np.cross(np.broadcast_to(d, sc.tri_e2.shape), sc.tri_e2)
    q = np.cross(t_vec, sc.tri_e1)
    with np.errstate(divide="ignore", invalid="ignore"):
        det = np.einsum("ij,ij->i", p, sc.tri_e1)
        inv = 1.0 / det
        dist = np.einsum("ij,ij->i", q, sc.tri_e2) * inv
        u = np.einsum("ij,ij->i", p, t_vec) * inv
        v = np.einsum("ij,ij->i", q, np.broadcast_to(d, sc.tri_e1.shape)) * inv
        ok = (u >= 0) & (v >= 0) & (dist >= 0) & (u + v <= 1)
    if cull:
        ok &= sc.tri_snormal @ d <= 0
    ok &= sc.tri_valid
    if ignore_tri >= 0:
        ok = ok.copy()
        ok[ignore_tri] = False
    if ignore_mesh >= 0:
        ok &= sc.tri_mesh != ignore_mesh
    if not ok.any():
        return None
    dist = np.where(ok, dist, FLOAT_MAX)
    i = int(np.argmin(dist))
    return i, F32(u[i]), F32(v[i]), F32(dist[i])


# -- texture sampling (Material.cs:71-232) ----------------------------------


def _address(x: float, mode: UVAddressMode) -> float:
    if mode == UVAddressMode.CLAMP:
        return min(max(x, 0.0), 1.0)
    folded = x
    if folded > 1.0:
        folded = math.fmod(folded, 1.0)
    elif folded < 0.0:
        folded = 1.0 + math.fmod(folded, 1.0)
    if mode == UVAddressMode.WRAP:
        return folded
    # MIRROR (Material.cs:115-122).
    if int(x - folded) % 2 == 0:
        return 1.0 - folded
    return folded


def lookup_uv(sc: OracleScene, tex_id: int, uv, address_mode, filtering):
    h, w = int(sc.tex_hw[tex_id, 0]), int(sc.tex_hw[tex_id, 1])
    uu = _address(float(uv[0]), address_mode)
    vv = _address(float(uv[1]), address_mode)
    img = sc.textures[tex_id]
    if filtering == TextureFiltering.POINT:
        x = min(max(int(uu * (w - 1)), 0), w - 1)
        y = min(max(int(vv * (h - 1)), 0), h - 1)
        return img[y, x] / F32(255.0)
    # Bilinear (Material.cs:162-232).
    texel_w = 1.0 / w
    texel_h = 1.0 / h
    rem_x = math.remainder(uu, texel_w)  # IEEERemainder
    rem_y = math.remainder(vv, texel_h)
    ub = uu - rem_x
    vb = vv - rem_y
    x = min(max(int(ub * (w - 1)), 0), w - 1)
    y = min(max(int(vb * (h - 1)), 0), h - 1)
    x2 = min(max(int((ub + texel_w) * (w - 1)), 0), w - 1)
    y2 = min(max(int((vb + texel_h) * (h - 1)), 0), h - 1)
    dx = rem_x * w + 0.5  # the reference's +0.5 weights (Material.cs:221-222)
    dy = rem_y * h + 0.5
    c = (
        img[y, x] * (1 - dx) * (1 - dy)
        + img[y2, x] * (1 - dx) * dy
        + img[y, x2] * dx * (1 - dy)
        + img[y2, x2] * dx * dy
    )
    return (c / 255.0).astype(F32)


# -- lights (SpotLight.cs / DirectionalLight.cs) ----------------------------

SPOT = 0


def _light_for_fragment(lt: dict, i: int, pos, normal):
    if lt["type"][i] == SPOT:
        dir_to_light = _normalize(lt["position"][i] - pos)
        surface_dot = float(dir_to_light @ normal)
        if surface_dot < 0.0:
            return np.zeros(3, F32)
        light_dot = float(-dir_to_light @ lt["direction"][i])
        ac = float(lt["angle_cosine"][i])
        if light_dot > ac:
            spot_intensity = float(lt["intensity"][i]) * (
                (light_dot - ac) / (1 - ac) ** float(lt["decay_exponent"][i])
            )
            return (
                lt["color"][i] * spot_intensity * surface_dot
                + np.ones(3, F32) * surface_dot**12
            ).astype(F32)
        return np.zeros(3, F32)
    surface_dot = max(float(lt["direction"][i] @ normal), 0.0)
    return (lt["color"][i] * surface_dot * float(lt["intensity"][i])).astype(F32)


def _is_light_path_obstructed(sc: OracleScene, lt: dict, i: int, pos, tri: int):
    """IsLightPathObstructed (RayTracer.cs:465-502) → lightAmount."""
    if lt["type"][i] == SPOT:  # IsPositionable
        to_light = lt["position"][i] - pos
        dist = float(np.linalg.norm(to_light))
        d = to_light / dist
    else:
        d = -lt["direction"][i]
        dist = float(FLOAT_MAX)
    hit = nearest_hit(sc, pos, d, ignore_tri=tri)
    if hit is not None and hit[3] < dist:
        ti = hit[0]
        mat = int(sc.mesh_material[sc.tri_mesh[ti]])
        if sc.mat_transparent[mat]:
            return float(sc.tri_color[ti, 3])
        return 1.0
    return 0.0


# -- CastRay (RayTracer.cs:506-737) -----------------------------------------


def cast_ray(sc: OracleScene, cfg: RenderConfig, o, d, iteration=0,
             ignore_tri=-1, ignore_mesh=-1, current_ref_index=1.0):
    hit = nearest_hit(sc, o, d, ignore_tri, ignore_mesh)
    if hit is None:
        return np.zeros(3, F32)
    ti, u, v, dist = hit
    mesh = int(sc.tri_mesh[ti])
    mat = int(sc.mesh_material[mesh])

    if sc.mat_interp_normals[mat]:
        n = sc.tri_n[ti]
        normal = _normalize(n[0] + (n[1] - n[0]) * u + (n[2] - n[0]) * v)
    else:
        normal = sc.tri_snormal[ti]

    world_pos = sc.tri_v1[ti] + sc.tri_e1[ti] * u + sc.tri_e2[ti] * v

    light_result = np.zeros(3, F32)
    nl = int(lt_count := sc.lights["valid"].sum())
    for i in range(nl):
        amount = _is_light_path_obstructed(sc, sc.lights, i, world_pos, ti)
        if amount != 1.0:
            light_result = light_result + _light_for_fragment(
                sc.lights, i, world_pos, normal
            ) * (1.0 - amount)

    def surface_color():
        if sc.mat_use_texture[mat] and sc.mat_texture[mat] >= 0:
            uv = sc.tri_uv[ti]
            iuv = uv[0] + (uv[1] - uv[0]) * u + (uv[2] - uv[0]) * v
            return lookup_uv(
                sc, int(sc.mat_texture[mat]), iuv, cfg.address_mode, cfg.filtering
            )
        return sc.tri_color[ti, :3]

    if iteration < cfg.max_reflections:
        refl_dir = _normalize(d - 2.0 * float(d @ normal) * normal)
        refl_ignore_mesh = mesh if sc.mesh_convex[mesh] else -1
        refl_color = cast_ray(
            sc, cfg, world_pos, refl_dir, iteration + 1, ti, refl_ignore_mesh,
            current_ref_index,
        )
        refl = float(sc.mat_reflect[mat])
        color_vector = (
            refl_color * refl + surface_color() * (1.0 - refl)
        ) * light_result

        if sc.mat_transparent[mat]:
            mat_ior = float(sc.mat_refraction[mat])
            # The reference's inverted n1/n2 quirk (RayTracer.cs:656-667).
            if current_ref_index == mat_ior:
                n1, n2 = 1.0, current_ref_index
            else:
                n1, n2 = mat_ior, 1.0
            cos1 = float(normal @ -d)
            with np.errstate(invalid="ignore"):
                cos2 = math.sqrt(max(-1.0, 1 - (n1 / n2) ** 2 * (1 - cos1**2))) if (
                    1 - (n1 / n2) ** 2 * (1 - cos1**2)
                ) >= 0 else float("nan")
            if cos1 >= 0:
                refract = (n1 / n2) * d + ((n1 / n2) * cos1 - cos2) * normal
            else:
                refract = (n1 / n2) * d - ((n1 / n2) * cos1 - cos2) * normal
            nrm = np.linalg.norm(refract)
            refract = refract / nrm if nrm > 0 else refract
            refr_color = cast_ray(
                sc, cfg, world_pos, refract.astype(F32), iteration + 1, ti, -1, n2
            )
            alpha = float(sc.tri_color[ti, 3])
            color_vector = refr_color * (1.0 - alpha) + color_vector * alpha
        result = color_vector
    else:
        result = light_result * surface_color()

    if cfg.quantize != Quantize.NONE:
        result = _quantize(result)
    return result.astype(F32)


def render_image_oracle(flat, cfg: RenderConfig, camera) -> np.ndarray:
    """Full-frame oracle render (Render, RayTracer.cs:391-428)."""
    from raytpu.core.camera import camera_rays

    sc = OracleScene.from_flat(flat)
    o, d = camera_rays(camera, cfg.width, cfg.height)
    o = np.asarray(o)
    d = np.asarray(d)
    out = np.zeros((cfg.height * cfg.width, 3), F32)
    for i in range(o.shape[0]):
        out[i] = cast_ray(sc, cfg, o[i], d[i])
    return out.reshape(cfg.height, cfg.width, 3)
