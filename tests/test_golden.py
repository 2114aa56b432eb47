"""Golden-image regression tests — BASELINE configs at reduced scale.

SURVEY.md §4 test-strategy item 3: golden renders for the benchmark
configurations, stored as PNGs in tests/goldens/.  These are REGRESSION
anchors, not correctness oracles (tests/test_oracle.py is the oracle):
any intentional change to shading/traversal semantics must regenerate them
(`python tests/test_golden.py regen`) and justify the diff.

Configs (BASELINE.md, miniaturized):
  g1 — textured crate, primary rays + Phong           (config 1)
  g2 — sphere + plane, spot shadow rays               (config 2)
  g3 — reflective multi-mesh scene, one mirror bounce (config 3)
  g4 — transparent sphere, refraction path            (refraction slice)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

from raytpu.config import Intersector, Quantize, RenderConfig
from raytpu.core.camera import Camera
from raytpu.io.image import read_image, write_image
from raytpu.render import render_image
from tests.scenes import crate_scene, sphere_and_plane_scene

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _cfg(**kw):
    kw.setdefault("width", 48)
    kw.setdefault("height", 48)
    kw.setdefault("intersector", Intersector.OCTREE)
    kw.setdefault("quantize", Quantize.FINAL)
    return RenderConfig(**kw)


def _cases():
    cam = Camera(position=(0.0, 16.0, 32.0), aspect=1.0)
    return {
        "g1_crate_primary": (
            crate_scene(), _cfg(max_reflections=0), cam),
        "g2_shadowed_sphere": (
            sphere_and_plane_scene(reflect=0.0, textured=True),
            _cfg(max_reflections=0), cam),
        "g3_mirror_bounce": (
            sphere_and_plane_scene(reflect=0.7, textured=True),
            _cfg(max_reflections=1), cam),
        "g4_refraction": (
            sphere_and_plane_scene(reflect=0.3, transparent=True),
            _cfg(max_reflections=2), cam),
    }


def _render(scene, cfg, cam):
    flat = scene.flatten(leaf_threshold=16, max_depth=8)
    return np.asarray(render_image(flat, cfg, cam))


@pytest.mark.parametrize("name", sorted(_cases()))
def test_golden(name):
    scene, cfg, cam = _cases()[name]
    path = os.path.join(GOLDEN_DIR, name + ".png")
    assert os.path.exists(path), (
        f"golden {name} missing — run `python tests/test_golden.py regen`"
    )
    img = _render(scene, cfg, cam)
    got = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    want = read_image(path)
    # FINAL quantization makes the comparison a straight byte compare with
    # a 1-step tolerance for cross-platform fp rounding.
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"{name}: max byte diff {diff.max()}"
    assert (diff > 0).mean() < 0.01, (
        f"{name}: {100 * (diff > 0).mean():.2f}% of bytes changed"
    )


def regen():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, (scene, cfg, cam) in sorted(_cases().items()):
        img = _render(scene, cfg, cam)
        write_image(os.path.join(GOLDEN_DIR, name + ".png"), img)
        print(f"wrote {name}.png (mean {img.mean():.4f})")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        regen()
