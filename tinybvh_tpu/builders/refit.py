"""Bottom-up BVH refit as level-parallel segmented updates.

Counterpart of BVH::Refit (tiny_bvh.h:3055-3093) and MBVH<M>::Refit
(tiny_bvh.h:4925-4961). The reference walks nodes in reverse allocation
order (children are allocated after parents, so one reverse sweep
suffices). On TPU we precompute per-depth node buckets once per topology
(host-side) and then update whole levels at a time with pure array ops —
the refit itself is jittable and runs fully on device.

Two refit paths:

  * `refit`       — the canonical BVH2 (feeds rebuild/collapse pipelines).
  * `refit_bvh8`  — DIRECT refit of the 8-wide layout: regathers the packed
    leaf triangles from the deformed vertex array and rebuilds every node's
    8 child boxes bottom-up, keeping the collapse topology. This is the
    per-frame path for animated rigid meshes (≙ BVH8_CPU::Refit,
    tiny_bvh.h:5653): no host round-trip, no re-collapse. Refresh the
    packet tables afterwards with traverse.packet2.build_packet_aux (also
    jitted) for the packet engines.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from tinybvh_tpu.core.vecmath import BVH_FAR
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


# ---------------------------------------------------------------------------
# Direct 8-wide refit (≙ MBVH<M>::Refit, tiny_bvh.h:4925-4961)
# ---------------------------------------------------------------------------

def bvh8_refit_plan(child_host):
    """Per-depth node-row buckets of a BVH8 child table, deepest first.

    child_host: (M, 8) int numpy child table (layouts.mbvh conventions:
    >=0 node row, <0 leaf, EMPTY_SLOT unused). Topology-dependent but
    geometry-independent — compute once per collapse, reuse every frame.
    """
    from tinybvh_tpu.layouts.mbvh import EMPTY_SLOT

    child = np.asarray(child_host)
    m = child.shape[0]
    depth = np.full(m, -1, np.int32)
    depth[0] = 0
    frontier = np.array([0], np.int64)
    d = 0
    while frontier.size:
        kids = child[frontier].reshape(-1)
        kids = kids[(kids >= 0) & (kids != EMPTY_SLOT)]
        d += 1
        depth[kids] = d
        frontier = kids
    levels = []
    for lv in range(int(depth.max()), -1, -1):
        ids = np.nonzero(depth == lv)[0].astype(np.int32)
        if ids.size:
            levels.append(jnp.asarray(ids))
    return tuple(levels)


def refit_bvh8(bvh8, tris, plan=None):
    """Refit the 8-wide layout in place for deformed geometry.

    tris: (N, 3, 3) deformed triangle array (device or host); leaf_tris
    are regathered from it via leaf_prim and every node's 8 child boxes
    are recomputed level-synchronously. Jittable when `plan` is given
    (pass bvh8_refit_plan(child) — host child table). Returns a BVH8
    with new bounds + leaf_tris; child/leaf_prim (topology) unchanged,
    exactly the reference's refit contract (tiny_bvh.h:4925-4961).
    """
    if plan is None:
        plan = bvh8_refit_plan(np.asarray(bvh8.child))
    else:
        # a plan computed for a different collapse topology would scatter
        # bounds to wrong rows silently (JAX clamps OOB scatter ids)
        n_plan = sum(int(ids.shape[0]) for ids in plan)
        if n_plan > bvh8.child.shape[0]:
            raise ValueError(
                f"refit plan covers {n_plan} node rows but BVH8 has "
                f"{bvh8.child.shape[0]}: stale plan for a rebuilt tree")
    return _refit_bvh8_impl(bvh8, jnp.asarray(tris, jnp.float32), plan)


@jax.jit
def _refit_bvh8_impl(bvh8, tris, plan):
    from tinybvh_tpu.layouts.mbvh import EMPTY_SLOT

    lp = bvh8.leaf_prim                                   # (L, 4)
    n = tris.shape[0]
    valid = (lp >= 0)[..., None, None]
    lt = jnp.where(valid, tris[jnp.clip(lp, 0, n - 1)], 0.0)
    leaf_lo = jnp.where(valid, lt, BVH_FAR).min(axis=(1, 2))   # (L, 3)
    leaf_hi = jnp.where(valid, lt, -BVH_FAR).max(axis=(1, 2))

    bounds = bvh8.bounds
    m = bounds.shape[0]
    l_rows = leaf_lo.shape[0]
    node_lo = jnp.full((m, 3), BVH_FAR, jnp.float32)
    node_hi = -node_lo
    for ids in plan:
        ch = bvh8.child[ids]                              # (B, 8)
        empty = ch == EMPTY_SLOT
        is_leaf = (ch < 0) & ~empty
        lrow = jnp.clip(-(ch + 1), 0, l_rows - 1)
        crow = jnp.clip(ch, 0, m - 1)
        slo = jnp.where(is_leaf[..., None], leaf_lo[lrow], node_lo[crow])
        shi = jnp.where(is_leaf[..., None], leaf_hi[lrow], node_hi[crow])
        slo = jnp.where(empty[..., None], BVH_FAR, slo)   # (B, 8, 3)
        shi = jnp.where(empty[..., None], -BVH_FAR, shi)
        rows = jnp.concatenate(
            [slo.transpose(0, 2, 1).reshape(-1, 24),
             shi.transpose(0, 2, 1).reshape(-1, 24)], axis=1)  # (B, 48)
        bounds = bounds.at[ids].set(rows)
        node_lo = node_lo.at[ids].set(slo.min(axis=1))
        node_hi = node_hi.at[ids].set(shi.max(axis=1))
    return bvh8.replace(bounds=bounds, leaf_tris=lt)
