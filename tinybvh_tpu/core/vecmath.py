"""L0 math substrate: AABB helpers, safe reciprocal, transforms.

TPU-native counterpart of the reference's vector-math layer
(tiny_bvh.h:322-599). Everything here operates on batched arrays with the
last axis = 3 (xyz); there are no scalar vec types — a "bvhvec3" is a row of
a (N, 3) array.
"""

from __future__ import annotations

import jax.numpy as jnp

# Miss distance, mirrors BVH_FAR (tiny_bvh.h:653).
BVH_FAR = 1e30
# Default SAH constants, mirrors C_TRAV / C_INT (tiny_bvh.h:141-146).
C_TRAV = 1.0
C_INT = 1.0


def safe_rcp(x: jnp.ndarray) -> jnp.ndarray:
    """Reciprocal that avoids inf on zero components.

    Mirrors tinybvh_safercp (tiny_bvh.h:442-444): 1/x when |x| > 1e-20,
    else a signed huge value.
    """
    big = jnp.where(x < 0, -BVH_FAR, BVH_FAR)
    return jnp.where(jnp.abs(x) > 1e-20, 1.0 / jnp.where(x == 0, 1.0, x), big)


def half_area(bmin: jnp.ndarray, bmax: jnp.ndarray) -> jnp.ndarray:
    """Half the surface area of AABBs; (…, 3) → (…,).

    Mirrors tinybvh_half_area (tiny_bvh.h:460). Degenerate (empty) boxes
    yield 0.
    """
    e = bmax - bmin
    e = jnp.maximum(e, 0.0)
    return e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] + e[..., 2] * e[..., 0]


def aabb_union(amin, amax, bmin, bmax):
    return jnp.minimum(amin, bmin), jnp.maximum(amax, bmax)


def aabb_empty(shape=(), dtype=jnp.float32):
    """(min=+FAR, max=-FAR) boxes; union identity."""
    mn = jnp.full(shape + (3,), BVH_FAR, dtype)
    mx = jnp.full(shape + (3,), -BVH_FAR, dtype)
    return mn, mx


def mat3_apply(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) @ (...,3) as an explicit f32 multiply-sum.

    NEVER use einsum/@ for ray-precision 3x3 transforms: small
    contractions lower to dot_general, and the TPU's f32 matmul default
    is bf16 multiplies — measured displacing 157-unit instanced-scene
    ray origins by ~0.5 units (the round-4 inst512 exactness failure).
    The broadcast multiply-sum stays on the VPU in full f32."""
    return (a * v[..., None, :]).sum(-1)


def transform_point(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 row-major transform(s) to points. m: (...,4,4), p: (...,3).

    Mirrors tinybvh_transform_point (tiny_bvh.h:565-573).
    """
    return mat3_apply(m[..., :3, :3], p) + m[..., :3, 3]


def transform_vector(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply rotation/scale part only (tiny_bvh.h:575-581)."""
    return mat3_apply(m[..., :3, :3], v)


def transform_aabb(m: jnp.ndarray, bmin: jnp.ndarray, bmax: jnp.ndarray):
    """Transform AABB(s) and return the enclosing world-space AABB.

    Equivalent of BLASInstance::Update's 8-corner transform
    (tiny_bvh.h:8386-8400), done arithmetically: for an affine map the
    transformed box is center' ± |A|·extent.
    """
    c = (bmin + bmax) * 0.5
    e = (bmax - bmin) * 0.5
    a = m[..., :3, :3]
    c2 = mat3_apply(a, c) + m[..., :3, 3]
    e2 = mat3_apply(jnp.abs(a), e)
    return c2 - e2, c2 + e2


def mat4_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """General 4x4 inverse (mirrors BLASInstance::InvertTransform,
    tiny_bvh.h:8402-8430). Batched."""
    return jnp.linalg.inv(m)


def normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), 1e-20)


def morton_encode_3d(q: jnp.ndarray) -> jnp.ndarray:
    """Interleave 10-bit integer coords (N, 3) uint32 → 30-bit Morton codes.

    Standard bit-spread; used by the LBVH builder (a TPU-friendly fast path
    the reference does not have — its fast path is the AVX binned builder,
    tiny_bvh.h:6400).
    """

    def spread(x):
        x = x.astype(jnp.uint32) & 0x3FF
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    return (
        (spread(q[..., 0]) << 2) | (spread(q[..., 1]) << 1) | spread(q[..., 2])
    )
