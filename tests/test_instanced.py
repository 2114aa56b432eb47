"""Two-level instanced intersection vs baked flatten (accel/instanced.py).

The oracle is the default path: baking the same instances into world-space
triangles must give identical hits (same triangles, same world distances) —
the equivalence the reference maintains between its per-object octrees and
world-space geometry (OctreeSpatialManager.cs:312-482).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from raytpu.accel.instanced import make_instance, nearest_hit_instanced
from raytpu.accel.traverse import nearest_hit_brute
from raytpu.config import Intersector
from raytpu.core import xna
from raytpu.scene.procedural import box, uv_sphere
from raytpu.scene.types import Material, Scene, SceneObject


def _bake_single(mesh):
    return Scene(objects=[SceneObject(meshes=[mesh])]).flatten(
        build_octree=False, cluster_size=16
    )


def _world(scale, rotation, position):
    return np.asarray(
        xna.compose_world_np(scale, rotation, position), np.float32
    )


@pytest.fixture(scope="module")
def setup():
    sphere = uv_sphere(radius=1.0, stacks=8, slices=12,
                       material=Material())
    crate = box(size=(2.0, 2.0, 2.0), material=Material())
    bakes = [_bake_single(sphere), _bake_single(crate)]
    placements = [
        (0, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0), (-3.0, 1.0, 0.0)),
        (0, (2.0, 2.0, 2.0), (0.0, 0.7, 0.0), (3.0, 2.0, -1.0)),
        (1, (1.0, 3.0, 1.0), (0.2, 0.0, 0.4), (0.0, 1.5, 2.0)),  # non-uniform
    ]
    instances = [
        make_instance(mi, _world(s, r, p)) for mi, s, r, p in placements
    ]
    # Baked oracle: same meshes instanced through SceneObject transforms.
    meshes = [sphere, crate]
    baked = Scene(objects=[
        SceneObject(meshes=[meshes[mi]], scale=s, rotation=r, position=p)
        for mi, s, r, p in placements
    ]).flatten(build_octree=False, cluster_size=16)
    return bakes, instances, baked


def _rays(n=96, seed=3):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, size=(n, 3)).astype(np.float32)
    o[:, 1] += 9.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestInstancedVsBaked:
    def test_hits_and_world_distances_match(self, setup):
        bakes, instances, baked = setup
        o, d = _rays()
        hi = nearest_hit_instanced(bakes, instances, o, d,
                                   intersector=Intersector.BRUTE)
        hb = nearest_hit_brute(baked, o, d, block=512)
        np.testing.assert_array_equal(np.asarray(hi.hit), np.asarray(hb.hit))
        m = np.asarray(hb.hit)
        # World distances agree (baked t is along a unit world direction).
        np.testing.assert_allclose(np.asarray(hi.t_world)[m],
                                   np.asarray(hb.t)[m], rtol=2e-4, atol=1e-4)

    def test_nonuniform_scale_direction_transform(self, setup):
        """Rays along an axis against the non-uniformly scaled crate: the
        two-point direction transform must land the same world hits as the
        baked geometry (the naive direction transform would not)."""
        bakes, instances, baked = setup
        n = 32
        xs = np.linspace(-0.8, 0.8, n).astype(np.float32)
        o = np.stack([xs, np.full(n, 1.5, np.float32),
                      np.full(n, 10.0, np.float32)], axis=1)
        d = np.tile(np.asarray([[0.0, 0.0, -1.0]], np.float32), (n, 1))
        hi = nearest_hit_instanced(bakes, instances, jnp.asarray(o),
                                   jnp.asarray(d),
                                   intersector=Intersector.BRUTE)
        hb = nearest_hit_brute(baked, jnp.asarray(o), jnp.asarray(d),
                               block=512)
        np.testing.assert_array_equal(np.asarray(hi.hit), np.asarray(hb.hit))
        m = np.asarray(hb.hit)
        assert m.any()
        np.testing.assert_allclose(np.asarray(hi.t_world)[m],
                                   np.asarray(hb.t)[m], rtol=2e-4, atol=1e-4)
        # Winning instance is the crate placement.
        assert (np.asarray(hi.instance)[m] == 2).all()

    def test_instance_sharing_reduces_memory(self, setup):
        bakes, instances, baked = setup
        shared_tris = sum(b.num_tris for b in bakes)
        assert baked.num_tris > shared_tris  # two sphere instances baked


class TestSceneLevelPruning:
    """World-AABB ray pruning (OctreeSpatialManager.cs:457-482 analog)."""

    def test_prune_parity(self, setup):
        """Pruned and unpruned passes return the same hits.

        Discrete fields match exactly; t_world only to fp tolerance — the
        lax.cond pass skip (skip_empty) changes XLA fusion inside the
        pass, which can shift FMA contraction by an ulp."""
        bakes, instances, _ = setup
        o, d = _rays()
        h1 = nearest_hit_instanced(bakes, instances, o, d, prune=True,
                                   intersector=Intersector.BRUTE)
        h0 = nearest_hit_instanced(bakes, instances, o, d, prune=False,
                                   intersector=Intersector.BRUTE)
        for f in ("hit", "u", "v", "tri", "instance"):
            np.testing.assert_array_equal(
                np.asarray(getattr(h1, f)), np.asarray(getattr(h0, f)))
        np.testing.assert_allclose(np.asarray(h1.t_world),
                                   np.asarray(h0.t_world), rtol=1e-6)

    def test_rays_at_one_instance_skip_the_others(self, setup):
        """Rays converging on instance 0's sphere enter the other two
        instances' passes as dead lanes (live count 0): the N-instance
        cost is no longer O(instances) per ray."""
        bakes, instances, _ = setup
        n = 64
        # Aim every ray from just outside instance 0 (-3, 1, 0) at its
        # center; the other instances sit well off these ray lines.
        rng = np.random.default_rng(7)
        target = np.asarray([-3.0, 1.0, 0.0], np.float32)
        o = (target + np.asarray([-2.5, 0.6, 0.0], np.float32)
             + 0.05 * rng.normal(size=(n, 3)).astype(np.float32))
        d = target - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        h, stats = nearest_hit_instanced(
            bakes, instances, jnp.asarray(o), jnp.asarray(d),
            intersector=Intersector.BRUTE, return_stats=True)
        stats = np.asarray(stats)
        assert stats[0] == n            # all rays live for the target
        assert stats[1] == 0 and stats[2] == 0
        assert np.asarray(h.hit).all()
        np.testing.assert_array_equal(np.asarray(h.instance), 0)

    def test_prune_respects_running_best(self, setup):
        """A ray that already found a nearer hit prunes instances whose
        AABB entry lies beyond it (entry-vs-best cap)."""
        bakes, instances, _ = setup
        # Ray along -x through instance 0's sphere at (-3, 1, 0), fired
        # from +x beyond instance 1's sphere at (3, 2, -1): it passes near
        # both, hits whichever is nearer first.
        o = jnp.asarray([[8.0, 1.0, 0.0]], jnp.float32)
        d = jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32)
        h1 = nearest_hit_instanced(bakes, instances, o, d, prune=True,
                                   intersector=Intersector.BRUTE)
        h0 = nearest_hit_instanced(bakes, instances, o, d, prune=False,
                                   intersector=Intersector.BRUTE)
        for a, b in zip(h1, h0):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestInstanceHierarchy:
    """64-instance scaling (accel/instanced.py skip_empty + ordering): the
    world-AABB hierarchy prunes passes to the instances a ray batch can
    actually reach — pruned passes are skipped at runtime — with exact
    parity vs the baked world-space scene."""

    @pytest.fixture(scope="class")
    def grid64(self):
        sphere = uv_sphere(radius=0.45, stacks=6, slices=10,
                           material=Material())
        bake = _bake_single(sphere)
        placements = []
        for gz in range(8):
            for gx in range(8):
                placements.append((float(gx * 4 - 14), 0.5,
                                   float(gz * 4 - 14)))
        instances = [
            make_instance(0, _world((1.0, 1.0, 1.0), (0.0, 0.0, 0.0), p))
            for p in placements
        ]
        baked = Scene(objects=[
            SceneObject(meshes=[uv_sphere(radius=0.45, stacks=6, slices=10,
                                          material=Material())],
                        position=p)
            for p in placements
        ]).flatten(build_octree=False, cluster_size=16)
        return [bake], instances, placements, baked

    def test_64_instances_prune_and_match_baked(self, grid64):
        from raytpu.accel.instanced import order_front_to_back

        bakes, instances, placements, baked = grid64
        # Camera-style rays from one corner aimed at the nearest spheres:
        # most of the 8x8 grid is never reachable closer than the running
        # best once the near instances have resolved.
        eye = np.array([-16.0, 1.0, -16.0], np.float32)
        targets = np.array(placements[:12], np.float32)
        rng = np.random.default_rng(5)
        pts = targets[rng.integers(0, 12, size=96)]
        pts += rng.normal(0, 0.3, pts.shape).astype(np.float32)
        o = jnp.asarray(np.tile(eye, (96, 1)))
        d = pts - np.asarray(o)
        d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

        order = order_front_to_back(instances, bakes, eye)
        h, stats = nearest_hit_instanced(
            bakes, instances, o, d, intersector=Intersector.BRUTE,
            return_stats=True, order=order)
        hb = nearest_hit_brute(baked, o, d, block=256)
        np.testing.assert_array_equal(np.asarray(h.hit), np.asarray(hb.hit))
        m = np.asarray(hb.hit)
        np.testing.assert_allclose(np.asarray(h.t_world)[m],
                                   np.asarray(hb.t)[m], rtol=1e-4,
                                   atol=1e-4)
        # The hierarchy prunes: far passes see zero live rays (skipped at
        # runtime by lax.cond) — live passes must be a small fraction of I.
        live_passes = int((np.asarray(stats) > 0).sum())
        assert live_passes <= 16, (live_passes, np.asarray(stats))

    def test_order_is_pure_permutation(self, grid64):
        bakes, instances, placements, baked = grid64
        o, d = _rays(64, seed=9)
        h1 = nearest_hit_instanced(bakes, instances, o, d,
                                   intersector=Intersector.BRUTE)
        order = list(reversed(range(len(instances))))
        h2 = nearest_hit_instanced(bakes, instances, o, d,
                                   intersector=Intersector.BRUTE,
                                   order=order)
        np.testing.assert_array_equal(np.asarray(h1.hit),
                                      np.asarray(h2.hit))
        m = np.asarray(h1.hit)
        np.testing.assert_allclose(np.asarray(h1.t_world)[m],
                                   np.asarray(h2.t_world)[m], rtol=1e-5)


class TestScanInstancing:
    """r5 scan-based instanced path (nearest_hit_instanced_scan): one
    compiled pass per UNIQUE MESH regardless of instance count, in-graph
    front-to-back ordering, exact parity with the unrolled path."""

    def test_matches_unrolled_and_baked(self, grid64=None):
        from raytpu.accel.instanced import nearest_hit_instanced_scan

        sphere = uv_sphere(radius=0.45, stacks=6, slices=10,
                           material=Material())
        bake = _bake_single(sphere)
        placements = [(float(gx * 4 - 14), 0.5, float(gz * 4 - 14))
                      for gz in range(8) for gx in range(8)]
        instances = [
            make_instance(0, _world((1.0, 1.0, 1.0), (0.0, 0.0, 0.0), p))
            for p in placements
        ]
        baked = Scene(objects=[
            SceneObject(meshes=[uv_sphere(radius=0.45, stacks=6, slices=10,
                                          material=Material())],
                        position=p)
            for p in placements
        ]).flatten(build_octree=False, cluster_size=16)

        eye = np.array([-16.0, 1.0, -16.0], np.float32)
        targets = np.array(placements[:12], np.float32)
        rng = np.random.default_rng(5)
        pts = targets[rng.integers(0, 12, size=96)]
        pts += rng.normal(0, 0.3, pts.shape).astype(np.float32)
        o = jnp.asarray(np.tile(eye, (96, 1)))
        d = pts - np.asarray(o)
        d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

        h, stats = nearest_hit_instanced_scan(
            [bake], instances, o, d, intersector=Intersector.BRUTE,
            return_stats=True)
        hb = nearest_hit_brute(baked, o, d, block=256)
        np.testing.assert_array_equal(np.asarray(h.hit),
                                      np.asarray(hb.hit))
        m = np.asarray(hb.hit)
        np.testing.assert_allclose(np.asarray(h.t_world)[m],
                                   np.asarray(hb.t)[m], rtol=1e-4,
                                   atol=1e-4)
        # Winning instance indices must be ORIGINAL positions.
        winners = np.asarray(h.instance)[m]
        assert winners.min() >= 0 and winners.max() < 64
        # Runtime pruning still holds under the scan.
        live_passes = int((np.asarray(stats) > 0).sum())
        assert live_passes <= 16, (live_passes,)

    def test_traced_program_is_sublinear_in_instances(self):
        """The jaxpr of the scan path must not grow with the instance
        count (one pass per unique mesh), unlike the unrolled path."""
        import jax

        from raytpu.accel.instanced import nearest_hit_instanced_scan

        sphere = uv_sphere(radius=0.45, stacks=4, slices=8,
                           material=Material())
        bake = _bake_single(sphere)

        def make(n):
            placements = [(float(i * 3), 0.5, 0.0) for i in range(n)]
            return [
                make_instance(0, _world((1.0, 1.0, 1.0), (0.0, 0.0, 0.0),
                                        p))
                for p in placements
            ]

        o, d = _rays(32, seed=3)

        def size_of(n):
            jx = jax.make_jaxpr(
                lambda oo, dd: nearest_hit_instanced_scan(
                    [bake], make(n), oo, dd,
                    intersector=Intersector.BRUTE))(o, d)
            return len(str(jx))

        s8, s64 = size_of(8), size_of(64)
        assert s64 < s8 * 1.2, (s8, s64)

    def test_ignore_tri_per_instance(self):
        from raytpu.accel.instanced import (nearest_hit_instanced,
                                            nearest_hit_instanced_scan)

        sphere = uv_sphere(radius=0.8, stacks=6, slices=10,
                           material=Material())
        bake = _bake_single(sphere)
        instances = [
            make_instance(0, _world((1.0, 1.0, 1.0), (0.0, 0.0, 0.0),
                                    (float(i * 2 - 2), 0.0, 0.0)))
            for i in range(3)
        ]
        o, d = _rays(48, seed=11)
        h0 = nearest_hit_instanced_scan([bake], instances, o, d,
                                        intersector=Intersector.BRUTE)
        itri = np.asarray(h0.tri)
        iinst = np.asarray(h0.instance)
        h1 = nearest_hit_instanced_scan(
            [bake], instances, o, d, ignore_tri=jnp.asarray(itri),
            ignore_instance=jnp.asarray(iinst),
            intersector=Intersector.BRUTE)
        h2 = nearest_hit_instanced(
            [bake], instances, o, d, ignore_tri=jnp.asarray(itri),
            ignore_instance=jnp.asarray(iinst),
            intersector=Intersector.BRUTE)
        np.testing.assert_array_equal(np.asarray(h1.hit),
                                      np.asarray(h2.hit))
        m = np.asarray(h1.hit)
        np.testing.assert_allclose(np.asarray(h1.t_world)[m],
                                   np.asarray(h2.t_world)[m], rtol=1e-5)
