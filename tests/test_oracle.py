"""JAX renderer vs the NumPy oracle (the BASELINE correctness requirement).

Byte-quantized (BOUNCE) images must match the oracle exactly on nearly all
pixels; a tiny number of silhouette pixels may flip hit/miss between float32
(JAX) and the oracle's mixed double-precision scalar math, so the assertion
is "≥ 99% of pixels exactly equal, every mismatch confined to byte steps".
HDR (NONE) images must be allclose (atol 1e-3 away from silhouettes).
"""

import numpy as np
import pytest

from raytpu.config import Quantize, TextureFiltering, UVAddressMode
from raytpu.ref_oracle.tracer import render_image_oracle
from raytpu.render.wavefront import render_image
from tests.scenes import (
    crate_scene,
    default_camera,
    small_cfg,
    sphere_and_plane_scene,
)


def _compare(scene, cfg, min_exact=0.99):
    flat = scene.flatten(leaf_threshold=16, max_depth=8)
    cam = default_camera()
    got = np.asarray(render_image(flat, cfg, cam))
    want = render_image_oracle(flat, cfg, cam)
    exact = np.all(np.abs(got - want) < 1e-6, axis=-1).mean()
    assert exact >= min_exact, f"only {exact:.3%} pixels exact"
    # Any mismatch stays within a couple of byte steps.
    assert np.abs(got - want).max() <= 3.0 / 255.0 + 1e-6


class TestOracleParity:
    def test_primary_only(self):
        cfg = small_cfg(max_reflections=0, quantize=Quantize.BOUNCE)
        _compare(sphere_and_plane_scene(), cfg)

    def test_reflections(self):
        cfg = small_cfg(max_reflections=2, quantize=Quantize.BOUNCE)
        _compare(sphere_and_plane_scene(reflect=0.6), cfg)

    @pytest.mark.parametrize("filtering", [TextureFiltering.POINT,
                                           TextureFiltering.BILINEAR])
    @pytest.mark.parametrize("address", [UVAddressMode.CLAMP,
                                         UVAddressMode.WRAP,
                                         UVAddressMode.MIRROR])
    def test_textured_matrix(self, filtering, address):
        """All {POINT, BILINEAR} x {CLAMP, WRAP, MIRROR} combos, with UVs
        remapped to [-0.75, 1.75] so every out-of-range quirk fires:
        WRAP's negative-side remainder, MIRROR's C# int-% sign behaviour
        (Material.cs:115-122), CLAMP saturation."""
        cfg = small_cfg(
            max_reflections=1,
            quantize=Quantize.BOUNCE,
            filtering=filtering,
            address_mode=address,
        )
        _compare(crate_scene(uv_scale=2.5, uv_offset=-0.75), cfg)

    def test_transparent_refraction(self):
        cfg = small_cfg(max_reflections=2, quantize=Quantize.BOUNCE)
        _compare(sphere_and_plane_scene(transparent=True), cfg, min_exact=0.97)

    def test_directional_light(self):
        cfg = small_cfg(max_reflections=1, quantize=Quantize.BOUNCE)
        _compare(sphere_and_plane_scene(light="directional"), cfg)

    def test_hdr_allclose(self):
        cfg = small_cfg(max_reflections=1, quantize=Quantize.NONE)
        flat = sphere_and_plane_scene().flatten(leaf_threshold=16, max_depth=8)
        cam = default_camera()
        got = np.asarray(render_image(flat, cfg, cam))
        want = render_image_oracle(flat, cfg, cam)
        diff = np.abs(got - want).max(axis=-1)
        # Away from hit/miss silhouette flips, float32 vs float64 drift only.
        assert np.quantile(diff, 0.99) < 1e-3
