"""Elastic recovery / fault injection (dist/elastic.py, SURVEY.md §5)."""

import numpy as np

from raytpu.dist.elastic import UnitResult, failed_units, render_units


def test_all_units_succeed():
    res = render_units(range(5), lambda u: u * u)
    assert all(r.ok for r in res)
    assert [r.result for r in res] == [0, 1, 4, 9, 16]
    assert failed_units(res) == []


def test_injected_failure_retried_and_recovered():
    # Unit 2 fails on its first two attempts, succeeds on the third.
    res = render_units(
        range(4), lambda u: u,
        inject_failure=lambda i, attempt: i == 2 and attempt < 3,
        backoff_s=0.0,
    )
    assert all(r.ok for r in res)
    assert res[2].attempts == 3
    assert res[0].attempts == 1


def test_permanent_failure_reported_not_raised():
    res = render_units(
        range(3), lambda u: u,
        inject_failure=lambda i, attempt: i == 1,
        max_attempts=2, backoff_s=0.0,
    )
    assert [r.ok for r in res] == [True, False, True]
    assert failed_units(res) == [1]
    assert "injected" in res[1].error


def test_redispatch_loop_drains_failures():
    # First pass: units 1 and 3 fail every attempt.  Second pass (the
    # elastic re-dispatch) succeeds because the "host came back".
    flaky = {1, 3}
    res1 = render_units(
        range(5), lambda u: u,
        inject_failure=lambda i, a: i in flaky,
        max_attempts=1,
    )
    todo = failed_units(res1)
    assert todo == [1, 3]
    flaky.clear()
    res2 = render_units(
        todo, lambda u: u, inject_failure=lambda i, a: False
    )
    assert all(r.ok for r in res2)
    assert [r.result for r in res2] == [1, 3]


def test_render_tiles_end_to_end():
    """Real use: tile units through the renderer with one injected fault."""
    import sys
    sys.path.insert(0, "tests")
    from scenes import default_camera, small_cfg, sphere_and_plane_scene

    from raytpu.core.camera import camera_rays
    from raytpu.render.wavefront import trace_colors

    flat = sphere_and_plane_scene().flatten(leaf_threshold=16, max_depth=8)
    cfg = small_cfg(width=16, height=16, max_reflections=0)
    cam = default_camera()
    o, d = camera_rays(cam, 16, 16)
    tiles = [(o[i:i + 64], d[i:i + 64]) for i in range(0, 256, 64)]

    def render_tile(unit):
        to, td = unit
        return np.asarray(trace_colors(flat, cfg, to, td))

    res = render_units(tiles, render_tile, backoff_s=0.0,
                       inject_failure=lambda i, a: i == 1 and a == 1)
    assert all(r.ok for r in res)
    img = np.concatenate([r.result for r in res])
    ref = np.asarray(trace_colors(flat, cfg, o, d))
    np.testing.assert_allclose(img, ref, atol=1e-6)
