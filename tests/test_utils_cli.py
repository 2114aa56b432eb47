"""utils/profiling + CLI argument plumbing."""

import os
import sys

import numpy as np

from raytpu.utils.profiling import PhaseTimer, render_stats


class TestPhaseTimer:
    def test_phases_and_report(self):
        t = PhaseTimer()
        with t.phase("a"):
            sum(range(1000))
        with t.phase("b"):
            pass
        names = [n for n, _ in t.phases]
        assert names == ["a", "b"]
        assert t.total() >= 0
        rep = t.report(rays=1000)
        assert "a" in rep and "throughput" in rep


class TestRenderStats:
    def test_stats_shape(self):
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: x * 2.0)
        s = render_stats(f, (jnp.ones((8, 3)),), rays=8, reps=2)
        assert set(s) == {"compile_s", "best_s", "median_s", "rays_per_s"}
        assert s["rays_per_s"] > 0


class TestCliPlumbing:
    def test_render_command_end_to_end(self, tmp_path):
        from raytpu.cli.main import main

        out = str(tmp_path / "r.png")
        rc = main([
            "render", "--scene", "spheres", "--out", out,
            "--width", "16", "--height", "16", "--max-reflections", "0",
            "--intersector", "brute", "--progress",
        ])
        assert rc == 0
        assert os.path.exists(out)
        assert os.path.exists(str(tmp_path / "r.config.json"))

    def test_animate_command_writes_avi_and_frames(self, tmp_path):
        from raytpu.cli.main import main

        out = str(tmp_path / "t.avi")
        rc = main([
            "animate", "--scene", "spheres", "--out", out,
            "--frames", "2", "--width", "16", "--height", "16",
            "--max-reflections", "0", "--intersector", "brute",
        ])
        assert rc == 0
        assert os.path.exists(out)
        fdir = str(tmp_path / "t_frames")
        assert sorted(os.listdir(fdir)) == ["frame_0000.png",
                                            "frame_0001.png"]

    def test_config_round_trip(self):
        from raytpu.config import Intersector, RenderConfig

        cfg = RenderConfig(width=99, intersector=Intersector.PALLAS)
        back = RenderConfig.from_json(cfg.to_json())
        assert back == cfg
