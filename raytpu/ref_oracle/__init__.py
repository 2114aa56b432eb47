"""CPU oracle: a faithful NumPy port of the reference tracer's semantics.

Used for allclose validation of the JAX renderer (BASELINE.md correctness
target).  See ref_oracle.tracer.
"""

from raytpu.ref_oracle.tracer import OracleScene, render_image_oracle  # noqa: F401
