"""Renderer integration tests (brute vs octree, masks, quantization)."""

import numpy as np
import pytest

from raytpu.config import Intersector, Quantize
from raytpu.render.wavefront import render_image
from tests.scenes import (
    crate_scene,
    default_camera,
    small_cfg,
    sphere_and_plane_scene,
)


def _img(scene, cfg):
    flat = scene.flatten(leaf_threshold=16, max_depth=8)
    return np.asarray(render_image(flat, cfg, default_camera()))


class TestRenderImage:
    def test_nonempty_and_bounded(self):
        img = _img(sphere_and_plane_scene(), small_cfg())
        assert img.shape == (24, 24, 3)
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert img.mean() > 0.01  # something was lit

    def test_brute_vs_octree_identical(self):
        sc = sphere_and_plane_scene()
        a = _img(sc, small_cfg(intersector=Intersector.BRUTE))
        b = _img(sc, small_cfg(intersector=Intersector.OCTREE))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_pallas_full_shading_matches_brute(self):
        """End-to-end shading (shadows, reflection, texture) through the
        fused Pallas intersector (interpret mode on CPU)."""
        sc = sphere_and_plane_scene(reflect=0.5, textured=True)
        a = _img(sc, small_cfg(intersector=Intersector.BRUTE,
                               max_reflections=2))
        b = _img(sc, small_cfg(intersector=Intersector.PALLAS,
                               max_reflections=2))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_reflections_add_light(self):
        sc = sphere_and_plane_scene(reflect=0.8)
        none = _img(sc, small_cfg(max_reflections=0))
        some = _img(sc, small_cfg(max_reflections=3))
        assert not np.allclose(none, some)

    def test_textured_crate(self):
        img = _img(crate_scene(), small_cfg(max_reflections=0))
        # The checkerboard produces both bright and dark texels.
        assert img.max() > 0.3
        assert img.std() > 0.02

    def test_transparent_scene_runs(self):
        sc = sphere_and_plane_scene(transparent=True)
        img = _img(sc, small_cfg(max_reflections=2))
        assert np.isfinite(img).all()
        assert img.mean() > 0.0

    def test_quantize_bounce_is_byte_stepped(self):
        sc = sphere_and_plane_scene()
        img = _img(sc, small_cfg(quantize=Quantize.BOUNCE))
        steps = img * 255.0
        np.testing.assert_allclose(steps, np.round(steps), atol=1e-4)

    def test_tile_size_invariance(self):
        sc = sphere_and_plane_scene()
        a = _img(sc, small_cfg(tile_pixels=576))
        b = _img(sc, small_cfg(tile_pixels=64))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_two_lights(self):
        sc = sphere_and_plane_scene(light="both")
        img = _img(sc, small_cfg())
        one = _img(sphere_and_plane_scene(light="spot"), small_cfg())
        assert img.mean() > one.mean()  # extra light adds energy
