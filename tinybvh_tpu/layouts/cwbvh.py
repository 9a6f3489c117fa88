"""Quantized 8-wide BVH — the compressed-wide-BVH (CWBVH) counterpart.

Counterpart of BVH8_CWBVH (Ylitie 2017; tiny_bvh.h:5884-6018): child AABBs
stored as uint8 offsets under a per-node power-of-two scale, cutting node
memory ~2.6x so much larger scenes stay VMEM-resident on TPU. The
semantics are kept (exponent quantization, conservative floor/ceil
rounding); the byte layout is NOT the reference's packed float4 words —
fields live in separate SoA arrays sized for fast row gathers
(SURVEY.md §7: keep the semantics, not the byte layout).

Quantized bounds are conservative supersets, so traversal visits a
superset of nodes and returns identical hits.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.layouts.mbvh import BVH8


@struct.dataclass
class BVH8Q:
    origin: jnp.ndarray   # (M, 3) f32 node-box origin
    scale: jnp.ndarray    # (M, 3) f32 power-of-two quantization step
    qbounds: jnp.ndarray  # (M, 48) uint8: [qlox·8|qloy·8|qloz·8|qhix·8|…]
    child: jnp.ndarray    # (M, 8) i32 — same encoding as BVH8
    leaf_tris: jnp.ndarray
    leaf_prim: jnp.ndarray

    @property
    def n_nodes(self):
        return self.qbounds.shape[0]

    @property
    def n_leaves(self):
        return self.leaf_tris.shape[0]


def quantize_bvh8(bvh8: BVH8) -> BVH8Q:
    b = np.asarray(bvh8.bounds).reshape(-1, 6, 8)  # [lo3|hi3] × 8 children
    lo = b[:, :3]  # (M, 3, 8)
    hi = b[:, 3:]
    # per-node box over the valid children (empty slots are inverted)
    node_lo = np.where(lo < BVH_FAR / 2, lo, np.inf).min(axis=2)
    node_hi = np.where(hi > -BVH_FAR / 2, hi, -np.inf).max(axis=2)
    node_lo = np.where(np.isfinite(node_lo), node_lo, 0.0)
    node_hi = np.where(np.isfinite(node_hi), node_hi, 0.0)
    ext = np.maximum(node_hi - node_lo, 1e-20)
    # power-of-two step so 255 steps cover the extent (≙ the exponent
    # quantization at tiny_bvh.h:5947-5967)
    e = np.ceil(np.log2(ext / 255.0))
    scale = np.exp2(e).astype(np.float32)
    qlo = np.floor((lo - node_lo[:, :, None]) / scale[:, :, None])
    qhi = np.ceil((hi - node_lo[:, :, None]) / scale[:, :, None])
    # empty slots → inverted quantized box (detected via child sentinel at
    # traversal anyway); clamp valid ones into [0, 255]
    qlo = np.clip(qlo, 0, 255).astype(np.uint8)
    qhi = np.clip(qhi, 0, 255).astype(np.uint8)
    qb = np.concatenate([qlo, qhi], axis=1).reshape(-1, 48)
    return BVH8Q(
        origin=jnp.asarray(node_lo, jnp.float32),
        scale=jnp.asarray(scale, jnp.float32),
        qbounds=jnp.asarray(qb),
        child=bvh8.child,
        leaf_tris=bvh8.leaf_tris,
        leaf_prim=bvh8.leaf_prim,
    )


def dequantize_bounds(q: BVH8Q, rows) -> jnp.ndarray:
    """Gather + reconstruct (R, 48) float bounds rows for given node rows."""
    qb = q.qbounds[rows].astype(jnp.float32).reshape(-1, 6, 8)
    o = q.origin[rows]  # (R, 3)
    s = q.scale[rows]
    lo = o[:, :, None] + qb[:, :3] * s[:, :, None]
    hi = o[:, :, None] + qb[:, 3:] * s[:, :, None]
    return jnp.concatenate([lo, hi], axis=1).reshape(-1, 48)


def to_bvh8(q: BVH8Q) -> BVH8:
    """Full-precision reconstruction (conservative superset bounds)."""
    rows = jnp.arange(q.n_nodes)
    return BVH8(
        bounds=dequantize_bounds(q, rows),
        child=q.child,
        leaf_tris=q.leaf_tris,
        leaf_prim=q.leaf_prim,
    )
