"""Shared test scenes (tiny versions of the BASELINE configs)."""

from __future__ import annotations

import numpy as np

from raytpu.config import Intersector, RenderConfig
from raytpu.core.camera import Camera
from raytpu.scene.lights import DirectionalLight, SpotLight
from raytpu.scene.procedural import box, plane, uv_sphere
from raytpu.scene.types import Material, Mesh, Scene, SceneObject


def checker_texture(n=8, size=32):
    """A small checkerboard texture (the reference's checkers.bmp analog)."""
    img = np.zeros((size, size, 3), np.uint8)
    cell = size // n
    yy, xx = np.mgrid[0:size, 0:size]
    mask = ((yy // cell) + (xx // cell)) % 2 == 0
    img[mask] = 255
    img[~mask] = 40
    return img


def sphere_and_plane_scene(reflect=0.3, transparent=False, textured=False,
                           light="spot", convex_sphere=False):
    """Sphere over a ground plane — the reference demo scene in miniature
    (Game1.cs:98-109)."""
    mat_s = Material(
        reflectiveness=reflect,
        transparent=transparent,
        refraction_index=1.32,
        use_texture=False,
        diffuse_color=(0.9, 0.2, 0.2, 0.65 if transparent else 1.0),
    )
    mat_p = Material(reflectiveness=0.0, diffuse_color=(0.4, 0.45, 0.5, 1.0))
    if textured:
        mat_p.use_texture = True
        mat_p.texture = checker_texture()
    objs = [
        SceneObject(
            meshes=[uv_sphere(radius=4.0, stacks=8, slices=12, material=mat_s,
                              convex=convex_sphere)],
            position=(0.0, 4.0, 0.0),
        ),
        SceneObject(meshes=[plane(size=(40.0, 40.0), material=mat_p)]),
    ]
    lights = {
        "spot": [SpotLight(position=(0, 5, 20), direction=(0.0, -0.2425356, -0.9701425))],
        "directional": [DirectionalLight(direction=(0.0, -1.0, 0.0))],
        "both": [
            SpotLight(position=(0, 5, 20), direction=(0.0, -0.2425356, -0.9701425)),
            DirectionalLight(direction=(0.3, -0.9, 0.1)),
        ],
    }[light]
    return Scene(objects=objs, lights=lights)


def crate_scene(uv_scale: float = 1.0, uv_offset: float = 0.0):
    """BASELINE config 1 analog: one textured crate, primary rays.

    ``uv_scale``/``uv_offset`` remap the box's [0,1] face UVs so
    out-of-range addressing (WRAP negative-side %, MIRROR's C# int-%% sign
    quirk, CLAMP saturation — Material.cs:96-122) actually fires."""
    mat = Material(reflectiveness=0.0, use_texture=True, texture=checker_texture())
    crate = box(size=(8.0, 8.0, 8.0), material=mat)
    if uv_scale != 1.0 or uv_offset != 0.0:
        crate.uvs = crate.uvs * np.float32(uv_scale) + np.float32(uv_offset)
    return Scene(
        objects=[
            SceneObject(
                meshes=[crate],
                position=(0.0, 4.0, 0.0),
                rotation=(0.0, 0.6, 0.0),
            )
        ],
        lights=[SpotLight(position=(5, 15, 20), direction=(-0.15, -0.45, -0.88))],
    )


def small_cfg(**kw):
    defaults = dict(
        width=24,
        height=24,
        max_reflections=2,
        intersector=Intersector.BRUTE,
        tile_pixels=576,
        tri_block=256,
    )
    defaults.update(kw)
    return RenderConfig(**defaults)


def default_camera(aspect=1.0):
    return Camera(position=(0.0, 16.0, 32.0), aspect=aspect)
