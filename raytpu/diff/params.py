"""Trainable-parameter views over a FlatScene.

The reference has no notion of optimization — differentiability is the
north-star capability added on top of its forward semantics (BASELINE.md,
config 4: "differentiable vertex+texture optimization").  A parameter set is
just a dict of FlatScene field arrays; ``apply_params`` merges it back and
recomputes the derived quantities (face normals) so the scene stays
self-consistent the way TracerModelProcessor.cs:199-203 defines them
(``surfaceNormal = normalize(cross(e2, e1))``).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

from raytpu.core.math3d import cross, normalize
from raytpu.scene.types import FlatScene

#: Parameter groups a fit can select (BASELINE config 4 uses GEOMETRY+TEXTURE).
GEOMETRY = ("tri_v1", "tri_e1", "tri_e2")

# Fields whose gradients flow through the NON-geometry tri_shade channels:
# training any of these requires cfg.grad_channels == "all" (the packed
# gather's geometry-pruned VJP would silently zero them —
# render/wavefront.py::_gather_rows_geo).  tri_snormal is NOT here: its
# channel (24:27) is kept by the pruned VJP.
SHADE_CONST_FIELDS = frozenset({
    "tri_n1", "tri_n2", "tri_n3", "tri_uv1", "tri_uv2", "tri_uv3",
    "tri_color", "tri_mesh",
})
NORMALS = ("tri_n1", "tri_n2", "tri_n3")
TEXTURE = ("textures",)
VERTEX_COLORS = ("tri_color",)
MATERIALS = ("mat_reflect", "mat_refraction")


def extract_params(scene: FlatScene,
                   fields: Sequence[str] = GEOMETRY + TEXTURE
                   ) -> Dict[str, jnp.ndarray]:
    """Pull the requested FlatScene fields out as the trainable pytree."""
    return {f: getattr(scene, f) for f in fields}


def apply_params(scene: FlatScene, params: Dict[str, jnp.ndarray]) -> FlatScene:
    """Merge trained fields back; refresh face normals if geometry moved.

    Note: the octree is *not* rebuilt here (host-side structure).  Fits on
    moving geometry should use Intersector.BRUTE, or rebuild the octree
    between optimization epochs with accel.octree.build_octree on loosened
    bounds — see diff/fit.py docstring.
    """
    scene = scene.replace(**params)
    if any(f in params for f in GEOMETRY):
        snorm = normalize(cross(scene.tri_e2, scene.tri_e1))
        scene = scene.replace(tri_snormal=snorm)
    if scene.tri_shade is not None:
        # Rebuild the packed shading row IN-GRAPH so shading reads the
        # trained values and gradients flow through tri_shade back into the
        # parameter fields (wavefront._gather_tri reads tri_shade only).
        scene = scene.replace(tri_shade=pack_shade(scene))
    return scene


def pack_shade(scene: FlatScene) -> jnp.ndarray:
    """(N, 32) packed shading row from the individual FlatScene fields.

    jnp (differentiable) twin of the NumPy bake in scene/flatten.py — keep
    the column layout in sync with FlatScene.tri_shade's docstring.
    """
    import jax

    mesh_bits = jax.lax.bitcast_convert_type(
        scene.tri_mesh.astype(jnp.int32), jnp.float32
    )
    return jnp.concatenate(
        [
            scene.tri_v1, scene.tri_e1, scene.tri_e2,
            scene.tri_n1, scene.tri_n2, scene.tri_n3,
            scene.tri_uv1, scene.tri_uv2, scene.tri_uv3,
            scene.tri_snormal, scene.tri_color,
            mesh_bits[:, None],
        ],
        axis=-1,
    )
