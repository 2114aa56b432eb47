"""Vector math helpers shared by the tracer (jnp, broadcasting over (..., 3))."""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(dot(v, v))


def normalize(v):
    """XNA ``Vector3.Normalize``: divide by length (no epsilon guard)."""
    return v / length(v)[..., None]


def safe_normalize(v, eps=1e-20):
    """Gradient-safe normalize for the differentiable path."""
    n2 = dot(v, v)
    return v * jnp.where(n2 > eps, jnp.sqrt(n2), 1.0)[..., None] ** -1


def reflect(d, n):
    """XNA ``Vector3.Reflect``: d - 2*dot(d, n)*n (RayTracer.cs:549)."""
    return d - 2.0 * dot(d, n)[..., None] * n


def lerp(a, b, t):
    """XNA ``Vector3.Lerp``: a + (b - a) * t (RayTracer.cs:584)."""
    return a + (b - a) * t


def refract_xna(direction, normal, n1, n2):
    """The reference's vector Snell refraction (RayTracer.cs:675-690).

    Returns the *unnormalized* refraction direction; the caller normalizes
    (RayTracer.cs:694).  Total internal reflection produces NaN (the C# code
    takes sqrt of a negative), which downstream intersection tests treat as a
    miss — replicated deliberately.
    """
    ratio = jnp.asarray(n1 / n2, jnp.float32)
    cos1 = dot(normal, -direction)
    cos2 = jnp.sqrt(1.0 - ratio**2 * (1.0 - cos1**2))
    term = (ratio * cos1 - cos2)[..., None]
    base = ratio[..., None] * direction if jnp.ndim(ratio) else ratio * direction
    refr_pos = base + term * normal
    refr_neg = base - term * normal
    return jnp.where((cos1 >= 0.0)[..., None], refr_pos, refr_neg)
