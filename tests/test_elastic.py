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


def test_watchdog_interrupts_hung_call():
    """A hung device call no longer hangs the driver: the watchdog abandons
    it at timeout_s and the unit is retried / reported failed fast."""
    import time

    from raytpu.dist.elastic import render_units

    hang_first = {"done": False}

    def render_one(unit):
        if unit == "hang" and not hang_first["done"]:
            hang_first["done"] = True
            time.sleep(30.0)  # simulated silent hang
        return f"ok:{unit}"

    t0 = time.perf_counter()
    results = render_units(["a", "hang", "b"], render_one,
                           max_attempts=2, timeout_s=0.3, backoff_s=0.01)
    elapsed = time.perf_counter() - t0
    assert elapsed < 5.0  # driver returned long before the 30s hang
    assert [r.ok for r in results] == [True, True, True]
    # The hung attempt was detected and retried.
    assert results[1].attempts == 2
    assert results[1].result == "ok:hang"


def test_watchdog_reports_unrecovered_hang():
    import time

    from raytpu.dist.elastic import failed_units, render_units

    def render_one(unit):
        time.sleep(10.0)
        return unit

    t0 = time.perf_counter()
    results = render_units([0], render_one, max_attempts=2, timeout_s=0.2,
                           backoff_s=0.01)
    assert time.perf_counter() - t0 < 5.0
    assert failed_units(results) == [0]
    assert "watchdog" in results[0].error
