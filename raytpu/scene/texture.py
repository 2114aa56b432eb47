"""Texture addressing and sampling (jnp), faithful to Material.cs.

- Address modes Clamp/Wrap/Mirror exactly as Material.cs:102-143, including
  the Mirror quirk that an in-range coordinate is flipped (``1 - uv``) when
  ``(int)(orig - folded) % 2 == 0``, which is true for the 0 case.
- Point filtering (Material.cs:145-160): ``x = (int)(u * (W-1))`` truncation,
  raw byte channels scaled by 1/255.
- Bilinear filtering (Material.cs:162-232) including its quirks: texel
  snapping via ``Math.IEEERemainder`` (round-half-even remainder), truncating
  index math, and the suspicious ``+0.5`` in the blend weights
  (Material.cs:221-222) — replicated verbatim so images match.

Textures are stored as float32 raw byte values (0..255); sampling multiplies
by 1/255 at the end exactly like the reference's BYTE_RECIPROCAL.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytpu.config import TextureFiltering, UVAddressMode

BYTE_RECIPROCAL = jnp.float32(1.0 / 255.0)


def _wrap1(x):
    # Material.WrapUV (Material.cs:125-136): C# % is fmod (sign of dividend).
    x = jnp.where(x > 1.0, jnp.fmod(x, 1.0), x)
    x = jnp.where(x < 0.0, 1.0 + jnp.fmod(x, 1.0), x)
    return x


def address_uv(uv, mode: UVAddressMode):
    """Apply an address mode to (..., 2) UVs (Material.LookupUV dispatch)."""
    if mode == UVAddressMode.CLAMP:
        return jnp.clip(uv, 0.0, 1.0)
    if mode == UVAddressMode.WRAP:
        return _wrap1(uv)
    if mode == UVAddressMode.MIRROR:
        folded = _wrap1(uv)
        # (int)(original - folded) % 2 == 0 → flip (Material.cs:115-122).
        diff = jnp.trunc(uv - folded).astype(jnp.int32)
        flip = diff % 2 == 0  # note: C# int % keeps sign, but parity test
        # only needs evenness and -2 % 2 == 0 in both conventions; odd
        # negatives give -1 ≠ 0 in C# and 1 ≠ 0 here — same outcome.
        return jnp.where(flip, 1.0 - folded, folded)
    raise ValueError(mode)


def sample_point(images, tex_id, height, width, uv, fetch=None):
    """Point filtering (Material.cs:145-160).

    ``images``: (T, H_pad, W_pad, 3) raw byte values; ``tex_id``: (...,)
    int32 per-sample texture index; ``height/width``: (...,) true sizes
    (gathered from ``tex_hw``); ``uv``: (..., 2) addressed UVs.

    ``fetch(tex_id, y, x) -> (..., 3)`` raw bytes (optional): texel
    backend injection — the ring-sharded >HBM atlas path
    (dist/bigscene.py::make_texel_fetch_ring) resolves texels from
    shards; ``images`` may then be None.
    """
    wf = (width - 1).astype(jnp.float32)
    hf = (height - 1).astype(jnp.float32)
    x = jnp.trunc(uv[..., 0] * wf).astype(jnp.int32)
    y = jnp.trunc(uv[..., 1] * hf).astype(jnp.int32)
    x = jnp.clip(x, 0, width - 1)
    y = jnp.clip(y, 0, height - 1)
    if fetch is None:
        fetch = lambda t, yy, xx: images[t, yy, xx]
    return fetch(tex_id, y, x) * BYTE_RECIPROCAL


def _ieee_remainder(x, y):
    """.NET Math.IEEERemainder: x - y * round(x / y), round-half-to-even."""
    return x - y * jnp.rint(x / y)


def sample_bilinear(images, tex_id, height, width, uv, fetch=None):
    """Bilinear filtering with the reference's exact quirks (Material.cs:162-232).

    ``fetch``: texel backend injection (see sample_point)."""
    wf = width.astype(jnp.float32)
    hf = height.astype(jnp.float32)
    texel_w = 1.0 / wf  # texelDensity (Material.cs:67)
    texel_h = 1.0 / hf
    rem_x = _ieee_remainder(uv[..., 0], texel_w)
    rem_y = _ieee_remainder(uv[..., 1], texel_h)
    u = uv[..., 0] - rem_x
    v = uv[..., 1] - rem_y
    x = jnp.trunc(u * (wf - 1.0)).astype(jnp.int32)
    y = jnp.trunc(v * (hf - 1.0)).astype(jnp.int32)
    x2 = jnp.trunc((u + texel_w) * (wf - 1.0)).astype(jnp.int32)
    y2 = jnp.trunc((v + texel_h) * (hf - 1.0)).astype(jnp.int32)
    x = jnp.clip(x, 0, width - 1)
    y = jnp.clip(y, 0, height - 1)
    x2 = jnp.clip(x2, 0, width - 1)
    y2 = jnp.clip(y2, 0, height - 1)
    if fetch is None:
        fetch = lambda t, yy, xx: images[t, yy, xx]
    c_base = fetch(tex_id, y, x)
    c_x = fetch(tex_id, y, x2)
    c_y = fetch(tex_id, y2, x)
    c_xy = fetch(tex_id, y2, x2)
    # The reference's (buggy but replicated) +0.5 weights (Material.cs:221-224).
    dx = (rem_x * wf + 0.5)[..., None]
    dy = (rem_y * hf + 0.5)[..., None]
    inv_dx = 1.0 - dx
    inv_dy = 1.0 - dy
    return (
        c_base * inv_dx * inv_dy
        + c_y * inv_dx * dy
        + c_x * dx * inv_dy
        + c_xy * dx * dy
    ) * BYTE_RECIPROCAL


def lookup_uv(images, tex_id, height, width, uv, address_mode: UVAddressMode,
              filtering: TextureFiltering, fetch=None):
    """Material.LookupUV (Material.cs:71-100).

    ``fetch``: texel backend injection (see sample_point)."""
    uv = address_uv(uv, address_mode)
    if filtering == TextureFiltering.POINT:
        return sample_point(images, tex_id, height, width, uv, fetch=fetch)
    if filtering == TextureFiltering.BILINEAR:
        return sample_bilinear(images, tex_id, height, width, uv,
                               fetch=fetch)
    raise ValueError(filtering)
