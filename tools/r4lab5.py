"""Round-4 lab #5: is the ~40ms zero-walk floor output-block DMA count?

Variants of the no-math kernel over the 1M-ray pack:

  a3: three (1,1,ts) output blocks per step      (lab4 k0 shape)
  a1: ONE (1,8,ts) folded output block per step
  m4: ONE folded block, 4 tiles per grid step    (grid NT/4)
  m16: ONE folded block, 16 tiles per grid step
  xla: jnp identity reshape of the same bytes    (hardware floor)

Usage: python tools/r4lab5.py [--res 1024] [--reps 4]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.r4lab import _sync, timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from raytpu.kernels.fused import ROWS

    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()

    rr = args.res * args.res
    ts = 256
    nt = rr // ts
    f32 = jnp.float32
    packed = jax.device_put(jnp.ones((ROWS, rr), f32))

    def kern_a3(rays, o1, o2, o3):
        r0 = rays[0:1, :]
        o1[0, 0, :] = r0[0, :]
        o2[0, 0, :] = (r0[0, :] + 1.0)
        o3[0, 0, :] = (r0[0, :] + 2.0)

    def kern_a1(rays, out):
        r0 = rays[0:1, :]
        for k in range(8):
            out[0, k, :] = (r0 + f32(k))[0, :]

    def run_a3():
        return pl.pallas_call(
            kern_a3, grid=(nt,),
            in_specs=[pl.BlockSpec((ROWS, ts), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)] * 3,
            out_shape=[jax.ShapeDtypeStruct((nt, 1, ts), f32)] * 3,
        )(packed)

    def run_a1():
        return pl.pallas_call(
            kern_a1, grid=(nt,),
            in_specs=[pl.BlockSpec((ROWS, ts), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, ts), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt, 8, ts), f32),
        )(packed)

    def run_m(mt):
        tsm = ts * mt
        ntm = nt // mt

        def kern(rays, out):
            r0 = rays[0:1, :]
            for k in range(8):
                out[0, k, :] = (r0 + f32(k))[0, :]

        return pl.pallas_call(
            kern, grid=(ntm,),
            in_specs=[pl.BlockSpec((ROWS, tsm), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, tsm), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ntm, 8, tsm), f32),
        )(packed)

    def run_xla():
        a = packed[0].reshape(nt, 1, ts)
        return jnp.concatenate([a + k for k in range(8)], axis=1)

    timed(jax.jit(run_a3), (), args.reps, "a3-3outs")
    timed(jax.jit(run_a1), (), args.reps, "a1-folded")
    timed(jax.jit(functools.partial(run_m, 4)), (), args.reps, "m4")
    timed(jax.jit(functools.partial(run_m, 16)), (), args.reps, "m16")
    timed(jax.jit(run_xla), (), args.reps, "xla-ref")


if __name__ == "__main__":
    main()
