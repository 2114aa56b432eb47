from raytpu.core import xna, math3d, intersect, camera  # noqa: F401
