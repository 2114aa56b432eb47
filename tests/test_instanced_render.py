"""Instanced renderer vs the baked renderer (render/instanced.py).

Oracle: the default baked path renders the identical scene — instanced
shading (textures, shadows, reflection, refraction, instance-transformed
normals) must match it to fp tolerance.
"""

import numpy as np
import pytest

from raytpu.config import Intersector, Quantize, RenderConfig
from raytpu.core.camera import Camera
from raytpu.render import render_image
from raytpu.render.instanced import (flatten_instanced,
                                     render_image_instanced)
from raytpu.scene.lights import SpotLight
from raytpu.scene.procedural import plane, uv_sphere
from raytpu.scene.types import Material, Scene, SceneObject
from tests.scenes import checker_texture


def _scene(reflect=0.4, transparent=False):
    # Two instances of ONE sphere mesh (scaled/moved differently) over a
    # textured ground plane — exercises bake sharing + transforms.
    mat = Material(reflectiveness=reflect, transparent=transparent,
                   refraction_index=1.32,
                   diffuse_color=(0.8, 0.2, 0.2, 0.6 if transparent else 1.0))
    sphere = uv_sphere(radius=2.0, stacks=8, slices=12, material=mat)
    ground = Material(use_texture=True, texture=checker_texture(),
                      reflectiveness=0.0)
    return Scene(
        objects=[
            SceneObject(meshes=[sphere], position=(-3.0, 2.0, 0.0)),
            SceneObject(meshes=[sphere], position=(3.5, 3.0, -2.0),
                        scale=(1.5, 1.5, 1.5), rotation=(0.0, 0.8, 0.0)),
            SceneObject(meshes=[plane(size=(40.0, 40.0), material=ground)]),
        ],
        lights=[SpotLight(position=(0.0, 5.0, 20.0),
                          direction=(0.0, -0.2425356, -0.9701425))],
    )


def _cfg(**kw):
    kw.setdefault("width", 32)
    kw.setdefault("height", 32)
    kw.setdefault("max_reflections", 1)
    kw.setdefault("intersector", Intersector.BRUTE)
    kw.setdefault("quantize", Quantize.NONE)
    return RenderConfig(**kw)


CAM = Camera(position=(0.0, 10.0, 24.0), aspect=1.0)


class TestInstancedRender:
    def _compare(self, scene, cfg, atol=2e-2, frac=0.02):
        baked = scene.flatten(build_octree=False, build_clusters=False)
        img_b = np.asarray(render_image(baked, cfg, CAM))
        isc = flatten_instanced(scene, build_octree=False,
                                build_clusters=False)
        img_i = np.asarray(render_image_instanced(isc, cfg, CAM))
        # fp differences concentrate on silhouette pixels where the
        # object-space ray transform rounds differently; almost all pixels
        # must match tightly and none wildly.
        diff = np.abs(img_b - img_i).max(axis=-1)
        assert (diff < atol).mean() > 1.0 - frac, (
            f"{(diff >= atol).mean():.3%} pixels differ >= {atol}"
        )
        assert np.isfinite(img_i).all()

    def test_shared_bake_count(self):
        isc = flatten_instanced(_scene(), build_octree=False,
                                build_clusters=False)
        assert len(isc.bakes) == 2  # sphere (shared x2) + plane
        assert isc.bake_of_instance == (0, 0, 1)

    def test_primary_and_shadows_match(self):
        self._compare(_scene(reflect=0.0), _cfg(max_reflections=0))

    def test_reflection_matches(self):
        self._compare(_scene(reflect=0.6), _cfg(max_reflections=2))

    def test_refraction_matches(self):
        self._compare(_scene(reflect=0.2, transparent=True),
                      _cfg(max_reflections=2))
