"""Bottom-up BVH refit as level-parallel segmented updates.

Counterpart of BVH::Refit (tiny_bvh.h:3055-3093). The reference walks nodes
in reverse allocation order (children are allocated after parents, so one
reverse sweep suffices). On TPU we precompute per-depth node buckets once
per topology (host-side) and then update whole levels at a time with pure
array ops — the refit itself is jittable and runs fully on device.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from tinybvh_tpu.layouts.bvh2 import BVH2, node_depths_host


def refit_plan(bvh: BVH2):
    """Precompute padded per-level node-id buckets, deepest first.

    Returns a list of int32 arrays (one per depth, deepest level first).
    Topology-dependent but geometry-independent: reusable across frames as
    long as the tree shape is unchanged (the reference has the same
    constraint — refit forbidden after spatial splits, tiny_bvh.h:3057).
    """
    depth = node_depths_host(bvh)
    max_d = int(depth.max())
    levels = []
    for d in range(max_d, -1, -1):
        ids = np.nonzero(depth == d)[0].astype(np.int32)
        if ids.size:
            levels.append(jnp.asarray(ids))
    return levels


def refit(bvh: BVH2, packed_tris, plan=None, leaf_max: int = 16) -> BVH2:
    """Recompute node AABBs for deformed geometry, keeping topology.

    packed_tris: (N, 3, 3) triangles already in prim_idx order (see
    traverse.stack.pack_tris). Jittable when `plan` is provided.
    """
    if plan is None:
        plan = refit_plan(bvh)
    return _refit_impl(bvh, packed_tris, tuple(plan), leaf_max)


@partial(jax.jit, static_argnames=("leaf_max",))
def _refit_impl(bvh: BVH2, packed_tris, plan, leaf_max):
    tri_min = jnp.min(packed_tris, axis=1)  # (N, 3)
    tri_max = jnp.max(packed_tris, axis=1)
    # prefix min/max over packed order → O(1) leaf bounds via cummin diff?
    # Leaves are contiguous ranges [first, first+count): use cumulative
    # running min/max with exclusive-scan lookups.
    node_min = bvh.node_min
    node_max = bvh.node_max
    N = tri_min.shape[0]

    for ids in plan:
        lf = bvh.left_first[ids]
        ct = bvh.count[ids]
        is_leaf = ct > 0
        # leaf bounds: masked reduce over up-to-leaf_max window
        idx = jnp.clip(lf[:, None] + jnp.arange(leaf_max)[None, :], 0, N - 1)
        lane = jnp.arange(leaf_max)[None, :] < ct[:, None]
        lmn = jnp.min(jnp.where(lane[..., None], tri_min[idx], 1e30), axis=1)
        lmx = jnp.max(jnp.where(lane[..., None], tri_max[idx], -1e30), axis=1)
        # interior bounds from children (already updated: deeper level first)
        l = jnp.clip(lf, 0, node_min.shape[0] - 2)
        imn = jnp.minimum(node_min[l], node_min[l + 1])
        imx = jnp.maximum(node_max[l], node_max[l + 1])
        new_min = jnp.where(is_leaf[:, None], lmn, imn)
        new_max = jnp.where(is_leaf[:, None], lmx, imx)
        node_min = node_min.at[ids].set(new_min)
        node_max = node_max.at[ids].set(new_max)

    return bvh.replace(node_min=node_min, node_max=node_max)
