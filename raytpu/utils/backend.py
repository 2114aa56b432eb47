"""Backend predicates shared by every dispatch site.

One definition of "running on real accelerator hardware" — the fused
kernel's interpret default, the AUTO intersector choice and the ring's
in-shard dispatch must agree, or adding a backend name silently downgrades
one of them to a fallback path.
"""

from __future__ import annotations

import jax

#: Backend names that lower Pallas kernels to hardware ("axon" is the
#: remote-tunnel TPU platform used in development).
ACCELERATOR_BACKENDS = ("tpu", "axon")


def on_accelerator() -> bool:
    return jax.default_backend() in ACCELERATOR_BACKENDS
