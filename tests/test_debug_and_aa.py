"""Single-ray debug casting (render/debug.py) and adaptive supersampling.

The debug cast is the reference's ray visualizer (Game1.cs:289-328,
RayTracer.cs:740-747); supersampling is RenderInternalWithMultisampling
(RayTracer.cs:128-311).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from raytpu.config import Intersector, Quantize, RenderConfig
from raytpu.core.camera import Camera
from raytpu.render import render_image
from raytpu.render.debug import (PRIMARY, REFLECTION, REFRACTION,
                                 cast_ray_debug, cast_screen_ray)
from tests.scenes import sphere_and_plane_scene


@pytest.fixture(scope="module")
def flat():
    return sphere_and_plane_scene(reflect=0.5).flatten(
        leaf_threshold=16, max_depth=8
    )


@pytest.fixture(scope="module")
def flat_glass():
    return sphere_and_plane_scene(reflect=0.3, transparent=True).flatten(
        leaf_threshold=16, max_depth=8
    )


def _cfg(**kw):
    kw.setdefault("width", 32)
    kw.setdefault("height", 32)
    kw.setdefault("max_reflections", 2)
    kw.setdefault("intersector", Intersector.OCTREE)
    return RenderConfig(**kw)


class TestDebugCast:
    def test_center_ray_hits_sphere_and_reflects(self, flat):
        cfg = _cfg()
        cam = Camera(position=(0.0, 16.0, 32.0), aspect=1.0)
        path = cast_screen_ray(flat, cfg, cam)
        prim = path.kind == PRIMARY
        assert prim.sum() == 1
        assert path.hit[prim].all()
        # Segment chain is connected: each child segment starts at its
        # parent's end point.
        refl = (path.kind == REFLECTION) & (path.level == 1)
        assert refl.sum() == 1
        np.testing.assert_allclose(path.start[refl][0], path.end[prim][0],
                                   rtol=1e-5)
        # Levels are capped by max_reflections.
        assert path.level.max() <= cfg.max_reflections

    def test_miss_ray_draws_escape_segment(self, flat):
        cfg = _cfg(max_reflections=0)
        o = jnp.asarray([[0.0, 5.0, 40.0]])
        d = jnp.asarray([[0.0, 1.0, 0.0]])  # straight up: hits nothing
        path = cast_ray_debug(flat, cfg, o, d)
        assert len(path.ray) == 1
        assert not path.hit[0]
        np.testing.assert_allclose(
            path.end[0], np.asarray([0.0, 305.0, 40.0]), rtol=1e-5
        )

    def test_refraction_branches_captured(self, flat_glass):
        cfg = _cfg(max_reflections=2)
        cam = Camera(position=(0.0, 16.0, 32.0), aspect=1.0)
        path = cast_screen_ray(flat_glass, cfg, cam)
        kinds = set(path.kind.tolist())
        assert REFRACTION in kinds and REFLECTION in kinds

    def test_batch_indices(self, flat):
        cfg = _cfg(max_reflections=1)
        cam = Camera(position=(0.0, 16.0, 32.0), aspect=1.0)
        from raytpu.core.camera import camera_rays

        o, d = camera_rays(cam, 4, 4)
        path = cast_ray_debug(flat, cfg, o, d)
        assert set(path.ray.tolist()) <= set(range(16))
        prim = path.kind == PRIMARY
        assert prim.sum() == 16  # every input ray has a primary segment


class TestSupersampling:
    def test_smooth_region_matches_single_sample(self, flat):
        # In the flat-color interior, the 4 corner rays agree, no
        # subdivision happens, and the quadrant average equals the
        # single-ray color to quantization.
        cfg1 = _cfg(width=16, height=16, max_reflections=0,
                    quantize=Quantize.NONE)
        cfg4 = _cfg(width=16, height=16, max_reflections=0,
                    use_multisampling=True, multisample_quality=1,
                    quantize=Quantize.NONE)
        cam = Camera(position=(0.0, 16.0, 32.0), aspect=1.0)
        img1 = np.asarray(render_image(flat, cfg1, cam))
        img4 = np.asarray(render_image(flat, cfg4, cam))
        assert img4.shape == img1.shape
        # AA changes edges; interior plain pixels stay close.
        diff = np.abs(img1 - img4).max(axis=-1)
        assert np.median(diff) < 0.08

    def test_quality_zero_is_plain_four_corner_average(self, flat):
        cfg = _cfg(width=8, height=8, max_reflections=0,
                   use_multisampling=True, multisample_quality=0,
                   quantize=Quantize.NONE)
        cam = Camera(position=(0.0, 16.0, 32.0), aspect=1.0)
        img = np.asarray(render_image(flat, cfg, cam))
        assert img.shape == (8, 8, 3)
        assert np.isfinite(img).all()

    def test_lr_bug_replication_changes_edges_only(self, flat):
        cam = Camera(position=(0.0, 16.0, 32.0), aspect=1.0)
        base = dict(width=16, height=16, max_reflections=0,
                    use_multisampling=True, multisample_quality=2,
                    quantize=Quantize.NONE)
        img_fixed = np.asarray(render_image(flat, _cfg(**base), cam))
        img_bug = np.asarray(render_image(
            flat, _cfg(**base, replicate_lr_bug=True), cam))
        # The bug only affects subdivided (edge) quadrants.
        frac_diff = (np.abs(img_fixed - img_bug).max(-1) > 1e-6).mean()
        assert frac_diff < 0.5


class TestDiagnosticRenderModes:
    """DEBUG_NORMALS / DEBUG_CONVEXFLAG equivalents (RayTracer.cs:563-566)."""

    def test_normals_mode_matches_geometry(self):
        from raytpu.config import RenderMode
        from tests.scenes import default_camera, small_cfg, sphere_and_plane_scene

        flat = sphere_and_plane_scene().flatten(leaf_threshold=16, max_depth=8)
        cfg = small_cfg(render_mode=RenderMode.NORMALS, max_reflections=0)
        img = np.asarray(render_image(flat, cfg, default_camera()))
        # The ground plane faces +Y: its pixels are exactly (0, 1, 0).
        # (XNA Color(Vector3) clamps; x/z of the up normal are 0.)
        greens = np.all(np.abs(img - [0.0, 1.0, 0.0]) < 1e-6, axis=-1)
        assert greens.mean() > 0.3  # plane dominates the lower frame
        # Sphere pixels vary; some must be non-axis colors.
        hit = img.any(axis=-1)
        assert (hit & ~greens).sum() > 20

    def test_convexflag_mode(self):
        from raytpu.config import RenderMode
        from tests.scenes import default_camera, small_cfg, sphere_and_plane_scene

        flat = sphere_and_plane_scene(convex_sphere=True).flatten(
            leaf_threshold=16, max_depth=8)
        cfg = small_cfg(render_mode=RenderMode.CONVEXFLAG, max_reflections=0)
        img = np.asarray(render_image(flat, cfg, default_camera()))
        green = np.all(np.abs(img - [0.0, 128.0 / 255.0, 0.0]) < 1e-6, axis=-1)
        red = np.all(np.abs(img - [1.0, 0.0, 0.0]) < 1e-6, axis=-1)
        assert green.any() and red.any()
        # Every hit pixel is exactly one of the two flag colors.
        hit = img.any(axis=-1)
        assert (hit == (green | red)).all()

    def test_watch_writes_partial_frames(self, tmp_path):
        from tests.scenes import default_camera, small_cfg, sphere_and_plane_scene

        flat = sphere_and_plane_scene().flatten(leaf_threshold=16, max_depth=8)
        cfg = small_cfg(max_reflections=0, tile_pixels=64)
        out = tmp_path / "watch.png"
        seen = []
        orig_write = None

        import raytpu.io.image as image_mod

        orig_write = image_mod.write_image

        def spy(path, img):
            seen.append(np.asarray(img).copy())
            return orig_write(path, img)

        image_mod.write_image = spy
        try:
            img = render_image(flat, cfg, default_camera(),
                               watch_path=str(out), watch_every=2)
        finally:
            image_mod.write_image = orig_write
        assert out.exists()
        assert len(seen) >= 2  # partial frames were written
        # Partials only ever add pixels; the traced prefix matches the
        # final image.
        final = np.asarray(img)
        for part in seen:
            filled = part.any(axis=-1)
            np.testing.assert_allclose(part[filled], final[filled], atol=1e-6)
