from raytpu.accel.octree import FlatOctree, build_octree  # noqa: F401
