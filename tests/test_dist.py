"""Sharded rendering on the 8-device virtual CPU mesh (SURVEY.md §4 item 5)."""

import jax
import numpy as np
import pytest

from raytpu.config import Intersector
from raytpu.dist import make_mesh, render_image_sharded, replicate_scene
from raytpu.render import render_image
from raytpu.scene.flatten import flatten_scene

from scenes import default_camera, small_cfg, sphere_and_plane_scene


@pytest.fixture(scope="module")
def flat():
    return flatten_scene(sphere_and_plane_scene(reflect=0.4, textured=True))


def test_mesh_spans_all_devices():
    mesh = make_mesh()
    assert mesh.size == len(jax.devices()) == 8


@pytest.mark.parametrize(
    "intersector", [Intersector.BRUTE, Intersector.OCTREE, Intersector.PALLAS]
)
def test_sharded_matches_single_device(flat, intersector):
    cfg = small_cfg(width=32, height=24, intersector=intersector)
    cam = default_camera(aspect=32 / 24)
    mesh = make_mesh()
    scene_rep = replicate_scene(flat, mesh)
    img_sharded = np.asarray(render_image_sharded(scene_rep, cfg, cam, mesh))
    img_single = np.asarray(render_image(flat, cfg, cam))
    np.testing.assert_allclose(img_sharded, img_single, atol=1e-6)


def test_sharded_2d_mesh(flat):
    """hosts×chips mesh (simulated 2×4) renders identically."""
    cfg = small_cfg(width=16, height=16)
    cam = default_camera()
    mesh = make_mesh(axes=("hosts", "chips"), shape=(2, 4))
    scene_rep = replicate_scene(flat, mesh)
    img = np.asarray(render_image_sharded(scene_rep, cfg, cam, mesh))
    ref = np.asarray(render_image(flat, cfg, cam))
    np.testing.assert_allclose(img, ref, atol=1e-6)


def test_ragged_ray_count(flat):
    """Width×height not divisible by devices×tile still renders exactly."""
    cfg = small_cfg(width=19, height=13, tile_pixels=32)
    cam = default_camera(aspect=19 / 13)
    mesh = make_mesh()
    img = np.asarray(render_image_sharded(flat, cfg, cam, mesh))
    ref = np.asarray(render_image(flat, cfg, cam))
    assert img.shape == (13, 19, 3)
    np.testing.assert_allclose(img, ref, atol=1e-6)
