"""The canonical 2-wide SoA BVH — every other layout converts from this.

TPU-native counterpart of the reference's `BVH` class (32-byte Wald nodes,
tiny_bvh.h:857-866), re-designed as struct-of-arrays with static padded
shapes so the whole structure is a jit-friendly pytree:

  node_min/node_max : (M, 3) f32   child AABBs
  left_first        : (M,)  i32    interior: left child (right = left+1)
                                   leaf: first slot in prim_idx
  count             : (M,)  i32    0 for interior, #prims for leaf
  prim_idx          : (N,)  i32    permutation of primitive ids

Node 0 is the root; node 1 is reserved/unused so children always sit in
aligned pairs (the reference keeps the same convention, tiny_bvh.h:2290).
Unused pool slots are degenerate (min=+FAR > max=-FAR) and unreachable.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from tinybvh_tpu.core.vecmath import BVH_FAR, C_INT, C_TRAV, half_area


@struct.dataclass
class BVH2:
    node_min: jnp.ndarray  # (M, 3)
    node_max: jnp.ndarray  # (M, 3)
    left_first: jnp.ndarray  # (M,)
    count: jnp.ndarray  # (M,)
    prim_idx: jnp.ndarray  # (N,)
    n_nodes: jnp.ndarray  # () i32 — number of used slots (incl. reserved #1)

    @property
    def n_prims(self):
        return self.prim_idx.shape[0]

    @property
    def capacity(self):
        return self.left_first.shape[0]


def sah_cost(bvh: BVH2, c_trav: float = C_TRAV, c_int: float = C_INT):
    """Total SAH cost of the tree (mirrors BVHBase::SAHCost,
    tiny_bvh.h:1889-1897): sum over interior nodes of c_trav·SA plus leaves
    of c_int·count·SA, normalized by the root's surface area."""
    area = half_area(bvh.node_min, bvh.node_max)
    used = (
        jnp.arange(bvh.capacity) < bvh.n_nodes
    ) & (jnp.arange(bvh.capacity) != 1)
    # a used node is a leaf iff count > 0
    is_leaf = bvh.count > 0
    node_cost = jnp.where(is_leaf, c_int * bvh.count * area, c_trav * area)
    total = jnp.sum(jnp.where(used, node_cost, 0.0))
    return total / jnp.maximum(area[0], 1e-30)


def node_counts(bvh: BVH2):
    """(total_nodes, leaf_nodes, prim_refs) — mirrors NodeCount/LeafCount/
    PrimCount (tiny_bvh.h:3698-3731)."""
    used = (
        jnp.arange(bvh.capacity) < bvh.n_nodes
    ) & (jnp.arange(bvh.capacity) != 1)
    is_leaf = used & (bvh.count > 0)
    return (
        jnp.sum(used),
        jnp.sum(is_leaf),
        jnp.sum(jnp.where(is_leaf, bvh.count, 0)),
    )


def validate_host(bvh: BVH2, tris=None, strict_perm: bool = True):
    """Host-side structural validation (the analogue of BVH_Verbose::CheckFit,
    tiny_bvh.h:4264-4289, plus permutation completeness). Raises on failure.
    """
    mn = np.asarray(bvh.node_min)
    mx = np.asarray(bvh.node_max)
    lf = np.asarray(bvh.left_first)
    ct = np.asarray(bvh.count)
    pidx = np.asarray(bvh.prim_idx)
    n = int(bvh.n_nodes)

    seen_prims = []
    stack = [0]
    visited = 0
    while stack:
        i = stack.pop()
        visited += 1
        assert 0 <= i < n, f"node index {i} out of range"
        if ct[i] > 0:  # leaf
            s, c = lf[i], ct[i]
            assert 0 <= s and s + c <= pidx.shape[0]
            seen_prims.append(pidx[s : s + c])
        else:
            l = lf[i]
            assert 2 <= l and l + 1 < n, f"bad child ptr {l} in node {i}"
            for child in (l, l + 1):
                assert np.all(mn[child] >= mn[i] - 1e-4), (i, child)
                assert np.all(mx[child] <= mx[i] + 1e-4), (i, child)
                stack.append(child)
    if strict_perm:
        got = np.sort(np.concatenate(seen_prims)) if seen_prims else np.array([])
        np.testing.assert_array_equal(got, np.arange(pidx.shape[0]))
    if tris is not None:
        # leaves must contain their triangles
        t = np.asarray(tris)
        stack = [0]
        while stack:
            i = stack.pop()
            if ct[i] > 0:
                ids = pidx[lf[i] : lf[i] + ct[i]]
                tmin = t[ids].min(axis=(0, 1))
                tmax = t[ids].max(axis=(0, 1))
                assert np.all(tmin >= mn[i] - 1e-3)
                assert np.all(tmax <= mx[i] + 1e-3)
            else:
                stack.extend((lf[i], lf[i] + 1))
    return True


def node_depths_host(bvh: BVH2) -> np.ndarray:
    """Per-node depth (root=0) computed host-side; -1 for unused slots."""
    lf = np.asarray(bvh.left_first)
    ct = np.asarray(bvh.count)
    n = int(bvh.n_nodes)
    depth = np.full(lf.shape[0], -1, np.int32)
    depth[0] = 0
    stack = [0]
    while stack:
        i = stack.pop()
        if ct[i] == 0 and i < n:
            l = lf[i]
            depth[l] = depth[l + 1] = depth[i] + 1
            stack.extend((l, l + 1))
    return depth
