"""RNG + sampling utilities.

Provides both the reference-parity hash RNG (WangHash / xor32,
tools.cl:6-13) for tests that compare against the reference's sequences,
and samplers used by the path tracer. Production rendering uses
jax.random (threefry) — the idiomatic TPU choice — but these integer
hashes are useful for stateless per-pixel seeds.
"""

from __future__ import annotations

import jax.numpy as jnp


def wang_hash(x):
    """WangHash (≙ tools.cl:6-9); x: uint32 array."""
    x = jnp.asarray(x, jnp.uint32)
    x = (x ^ jnp.uint32(61)) ^ (x >> 16)
    x = x * jnp.uint32(9)
    x = x ^ (x >> 4)
    x = x * jnp.uint32(0x27D4EB2D)
    x = x ^ (x >> 15)
    return x


def xor32(state):
    """xorshift32 step (≙ tools.cl:10-13). Returns (new_state, u32)."""
    s = jnp.asarray(state, jnp.uint32)
    s = s ^ (s << 13)
    s = s ^ (s >> 17)
    s = s ^ (s << 5)
    return s, s


def u32_to_unit_float(x):
    """uint32 → [0, 1) float32."""
    return (x >> 8).astype(jnp.float32) * (1.0 / 16777216.0)


def cosine_hemisphere(n, r1, r2):
    """Cosine-weighted hemisphere sample around normals n (…, 3).

    ≙ tools.cl CosWeightedRandomHemisphereDirection.
    """
    import jax.numpy as jnp

    phi = 2.0 * jnp.pi * r1
    sr = jnp.sqrt(r2)
    # build tangent frame
    a = jnp.where(
        jnp.abs(n[..., 0:1]) > 0.9,
        jnp.array([0.0, 1.0, 0.0]),
        jnp.array([1.0, 0.0, 0.0]),
    )
    t = jnp.cross(n, jnp.broadcast_to(a, n.shape))
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-20)
    b = jnp.cross(n, t)
    x = jnp.cos(phi) * sr
    y = jnp.sin(phi) * sr
    z = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
    return (
        x[..., None] * t + y[..., None] * b + z[..., None] * n
    )
