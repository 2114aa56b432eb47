"""Pallas TPU kernels — the framework's native compute components.

The reference's performance-critical inner loops are C# hot loops
(Möller–Trumbore in RayExtensions.cs:13-75, the leaf triangle scan in
MeshOctree.cs:288-304); here they are fused Pallas kernels that keep ray
state in VMEM and stream candidate triangle clusters from HBM with
double-buffered DMA (kernels/intersect.py).
"""

from raytpu.kernels.dispatch import nearest_hit_pallas  # noqa: F401
