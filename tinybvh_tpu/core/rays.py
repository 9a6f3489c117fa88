"""Ray and hit records as struct-of-arrays pytrees.

TPU-native counterpart of the reference's Ray / Intersection records
(tiny_bvh.h:656-709). Where the reference keeps one 64-byte aligned struct
per ray, we keep one array per field over a whole ray batch — the natural
layout for vectorized slab tests and Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from tinybvh_tpu.core.vecmath import BVH_FAR, safe_rcp

# All rays intersect everything by default (mirrors RAY_MASK_INTERSECT_ALL,
# tiny_bvh.h:654).
RAY_MASK_ALL = 0xFFFF


@struct.dataclass
class Rays:
    """A batch of rays. All fields share the leading batch shape (...,).

    o: (..., 3) origins; d: (..., 3) directions (not necessarily unit);
    rd: (..., 3) precomputed safe reciprocal directions (as the reference
    precomputes `rD`, tiny_bvh.h:673); mask: (...,) int32 16-bit visibility
    mask tested against instance masks (tiny_bvh.h:685-687, 3326).
    """

    o: jnp.ndarray
    d: jnp.ndarray
    rd: jnp.ndarray
    mask: jnp.ndarray

    @property
    def batch_shape(self):
        return self.o.shape[:-1]


@struct.dataclass
class Hits:
    """Hit records for a ray batch (mirrors Intersection, tiny_bvh.h:693-703).

    t: (...,) hit distance, BVH_FAR on miss; u, v: barycentrics; prim: (...,)
    int32 primitive index (-1 on miss); inst: (...,) int32 instance index
    (-1 when tracing a BLAS directly).
    """

    t: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    prim: jnp.ndarray
    inst: jnp.ndarray

    @property
    def missed(self):
        return self.prim < 0


def make_rays(o, d, mask=None, t_max=None) -> Rays:
    """Build a ray batch, precomputing reciprocal directions.

    With config.validate_rays (≙ VALIDATE_RAY, tiny_bvh.h:1663-1665),
    non-finite origins/directions and zero-length directions raise here —
    at the batch boundary, where the reference's per-ray NaN gate sits."""
    from tinybvh_tpu.config import get_config

    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    del t_max  # traversal takes an explicit t_max argument
    if get_config().validate_rays:
        import numpy as _np

        oh, dh = _np.asarray(o), _np.asarray(d)
        if not (_np.isfinite(oh).all() and _np.isfinite(dh).all()):
            raise ValueError("make_rays: non-finite ray origin/direction")
        if (_np.linalg.norm(dh, axis=-1) < 1e-30).any():
            raise ValueError("make_rays: zero-length ray direction")
    if mask is None:
        mask = jnp.full(o.shape[:-1], RAY_MASK_ALL, jnp.int32)
    else:
        mask = jnp.asarray(mask, jnp.int32)
    return Rays(o=o, d=d, rd=safe_rcp(d), mask=mask)


def no_hits(batch_shape) -> Hits:
    return Hits(
        t=jnp.full(batch_shape, BVH_FAR, jnp.float32),
        u=jnp.zeros(batch_shape, jnp.float32),
        v=jnp.zeros(batch_shape, jnp.float32),
        prim=jnp.full(batch_shape, -1, jnp.int32),
        inst=jnp.full(batch_shape, -1, jnp.int32),
    )
