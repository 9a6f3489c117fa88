"""Batched BVH2 traversal: closest-hit and any-hit.

TPU-native counterpart of BVH::Intersect / IsOccluded
(tiny_bvh.h:3247-3453). The reference walks one ray at a time with a
256-entry stack and octant-specialized slab macros; here a whole ray batch
advances in lockstep through one `lax.while_loop`, with per-ray stacks kept
as (R, S) arrays and every memory access expressed as a batched gather —
the formulation XLA can vectorize on the VPU.

Distance-keyed stack entries let us prune pushed nodes that became useless
after a closer hit (the reference's ordered traversal achieves the same with
its `dist < t` pop check).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from tinybvh_tpu.core.intersect import (
    leaf_intersect, moller_trumbore, precompute_baldwin_weber, tri_edges,
)
from tinybvh_tpu.core.rays import Hits, Rays, no_hits
from tinybvh_tpu.core.vecmath import BVH_FAR

# Covers the binned builder's depth bound (builders/binned.py _MAX_LEVELS =
# 128): ordered BVH2 descent pushes at most one node per level, so 130
# slots can never silently overwrite the top slot on any buildable tree
# (the reference plays it safer still with a 256-entry stack,
# tiny_bvh.h:3249).
STACK_DEPTH = 130


def pack_tris(bvh, tris):
    """Reorder triangles into prim_idx order so leaves are contiguous.

    The reference gathers through primIdx per leaf prim (tiny_bvh.h:3265);
    packing once instead makes every leaf read a contiguous slab — the
    gather-friendly layout for TPU.
    """
    return jnp.asarray(tris, jnp.float32)[bvh.prim_idx]


def intersect_bvh2(
    bvh, packed_tris, rays: Rays, t_max=BVH_FAR, leaf_max: int = 16,
    with_cost: bool = False, tri_test: str | None = None,
):
    """Closest-hit traversal. Returns Hits (and per-ray cost if requested).

    packed_tris must come from pack_tris(bvh, tris). leaf_max is a static
    upper bound on leaf primitive count. The optional cost channel mirrors
    the reference's traversal-cost instrumentation (tiny_bvh.h:3251-3303):
    c_trav per visited node + c_int per triangle test. tri_test selects
    the leaf triangle test (None → Config.tri_test), ≙ WATERTIGHT_TRITEST
    (tiny_bvh.h:131, 8486-8507).
    """
    if tri_test is None:
        from tinybvh_tpu.config import get_config

        tri_test = get_config().tri_test
    return _intersect_bvh2(bvh, packed_tris, rays, t_max,
                           leaf_max=leaf_max, with_cost=with_cost,
                           tri_test=tri_test)


@partial(jax.jit, static_argnames=("leaf_max", "with_cost", "tri_test"))
def _intersect_bvh2(
    bvh, packed_tris, rays: Rays, t_max=BVH_FAR, leaf_max: int = 16,
    with_cost: bool = False, tri_test: str = "mt",
):
    o, d, rd = rays.o, rays.d, rays.rd
    R = o.shape[0]
    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

    v0all, e1all, e2all = tri_edges(packed_tris)
    bw_all = (precompute_baldwin_weber(packed_tris)
              if tri_test == "baldwin" else None)

    state = dict(
        cur=jnp.zeros(R, jnp.int32),
        sp=jnp.zeros(R, jnp.int32),
        stack_node=jnp.zeros((R, STACK_DEPTH), jnp.int32),
        stack_dist=jnp.zeros((R, STACK_DEPTH), jnp.float32),
        t=t0,
        u=jnp.zeros(R, jnp.float32),
        v=jnp.zeros(R, jnp.float32),
        prim=jnp.full(R, -1, jnp.int32),
        done=jnp.zeros(R, bool),
        cost=jnp.zeros(R, jnp.float32),
    )

    node_min = bvh.node_min
    node_max = bvh.node_max
    left_first = bvh.left_first
    count = bvh.count

    def cond(s):
        return jnp.any(~s["done"])

    def body(s):
        cur, sp, done = s["cur"], s["sp"], s["done"]
        t = s["t"]

        # --- pop phase: rays with no current node fetch from the stack ----
        need_pop = (cur < 0) & ~done
        can_pop = need_pop & (sp > 0)
        new_sp = jnp.where(can_pop, sp - 1, sp)
        pidx = jnp.clip(new_sp, 0, STACK_DEPTH - 1)
        popped_node = jnp.take_along_axis(s["stack_node"], pidx[:, None], 1)[:, 0]
        popped_dist = jnp.take_along_axis(s["stack_dist"], pidx[:, None], 1)[:, 0]
        take = can_pop & (popped_dist < t)
        cur = jnp.where(take, popped_node, cur)
        done = done | (need_pop & (sp == 0))
        sp = new_sp

        # --- process phase ------------------------------------------------
        proc = (cur >= 0) & ~done
        node = jnp.maximum(cur, 0)
        lf = left_first[node]
        ct = count[node]
        is_leaf = proc & (ct > 0)
        is_int = proc & (ct == 0)

        # leaf: up to leaf_max contiguous triangles
        base = jnp.where(is_leaf, lf, 0)
        idx = base[:, None] + jnp.arange(leaf_max, dtype=jnp.int32)[None, :]
        idx = jnp.clip(idx, 0, v0all.shape[0] - 1)
        if tri_test == "mt":
            hit, th, uh, vh = moller_trumbore(
                o[:, None, :], d[:, None, :],
                v0all[idx], e1all[idx], e2all[idx], t[:, None])
        else:
            # raw vertices (NOT v0+e1: watertightness needs bit-identical
            # shared edge endpoints)
            tri = packed_tris[idx]
            hit, th, uh, vh = leaf_intersect(
                tri_test, o[:, None, :], d[:, None, :], rd[:, None, :],
                tri[..., 0, :], tri[..., 1, :], tri[..., 2, :], t[:, None],
                bw_rows=None if bw_all is None else bw_all[idx],
            )
        lane_ok = jnp.arange(leaf_max)[None, :] < ct[:, None]
        th = jnp.where(hit & lane_ok & is_leaf[:, None], th, BVH_FAR)
        best = jnp.argmin(th, axis=1)
        bt = jnp.take_along_axis(th, best[:, None], 1)[:, 0]
        improved = bt < t
        bsel = lambda new, old: jnp.where(improved, new, old)
        t = bsel(bt, t)
        u = bsel(jnp.take_along_axis(uh, best[:, None], 1)[:, 0], s["u"])
        v = bsel(jnp.take_along_axis(vh, best[:, None], 1)[:, 0], s["v"])
        prim = bsel((base + best).astype(jnp.int32), s["prim"])

        # interior: slab-test both children, near-first ordering
        l = jnp.where(is_int, lf, 0)
        r = l + 1
        dl = _slab(o, rd, t, node_min[l], node_max[l])
        dr = _slab(o, rd, t, node_min[r], node_max[r])
        swap = dr < dl
        near_n = jnp.where(swap, r, l)
        far_n = jnp.where(swap, l, r)
        near_d = jnp.minimum(dl, dr)
        far_d = jnp.maximum(dl, dr)
        near_hit = is_int & (near_d < BVH_FAR)
        far_hit = is_int & (far_d < BVH_FAR)

        # push far child when both hit
        push = near_hit & far_hit
        sidx = jnp.clip(sp, 0, STACK_DEPTH - 1)
        stack_node = _scatter_row(s["stack_node"], sidx, far_n, push)
        stack_dist = _scatter_row(s["stack_dist"], sidx, far_d, push)
        sp = jnp.where(push, sp + 1, sp)

        # next node: near child if hit, else pop
        cur = jnp.where(is_int, jnp.where(near_hit, near_n, -1), cur)
        cur = jnp.where(is_leaf, -1, cur)

        cost = s["cost"] + jnp.where(proc, 1.0, 0.0) + jnp.where(
            is_leaf, ct.astype(jnp.float32), 0.0
        )
        return dict(
            cur=cur, sp=sp, stack_node=stack_node, stack_dist=stack_dist,
            t=t, u=u, v=v, prim=prim, done=done, cost=cost,
        )

    s = lax.while_loop(cond, body, state)
    hit_valid = s["prim"] >= 0
    hits = Hits(
        t=jnp.where(hit_valid, s["t"], BVH_FAR),
        u=s["u"],
        v=s["v"],
        prim=jnp.where(hit_valid, bvh.prim_idx[jnp.maximum(s["prim"], 0)], -1),
        inst=jnp.full(R, -1, jnp.int32),
    )
    if with_cost:
        return hits, s["cost"]
    return hits


def is_occluded_bvh2(bvh, packed_tris, rays: Rays, t_max, leaf_max: int = 16,
                     tri_test: str | None = None):
    """Any-hit traversal: True where geometry lies within (0, t_max).

    Mirrors BVH::IsOccluded (tiny_bvh.h:3382-3453): no ordering, early exit
    per ray on first hit. tri_test as in intersect_bvh2.
    """
    if tri_test is None:
        from tinybvh_tpu.config import get_config

        tri_test = get_config().tri_test
    return _is_occluded_bvh2(bvh, packed_tris, rays, t_max,
                             leaf_max=leaf_max, tri_test=tri_test)


@partial(jax.jit, static_argnames=("leaf_max", "tri_test"))
def _is_occluded_bvh2(bvh, packed_tris, rays: Rays, t_max,
                      leaf_max: int = 16, tri_test: str = "mt"):
    o, d, rd = rays.o, rays.d, rays.rd
    R = o.shape[0]
    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    v0all, e1all, e2all = tri_edges(packed_tris)
    bw_all = (precompute_baldwin_weber(packed_tris)
              if tri_test == "baldwin" else None)

    state = dict(
        cur=jnp.zeros(R, jnp.int32),
        sp=jnp.zeros(R, jnp.int32),
        stack_node=jnp.zeros((R, STACK_DEPTH), jnp.int32),
        occluded=jnp.zeros(R, bool),
        done=jnp.zeros(R, bool),
    )

    node_min, node_max = bvh.node_min, bvh.node_max
    left_first, count = bvh.left_first, bvh.count

    def cond(s):
        return jnp.any(~s["done"])

    def body(s):
        cur, sp, done, occ = s["cur"], s["sp"], s["done"], s["occluded"]
        need_pop = (cur < 0) & ~done
        can_pop = need_pop & (sp > 0)
        new_sp = jnp.where(can_pop, sp - 1, sp)
        pidx = jnp.clip(new_sp, 0, STACK_DEPTH - 1)
        popped = jnp.take_along_axis(s["stack_node"], pidx[:, None], 1)[:, 0]
        cur = jnp.where(can_pop, popped, cur)
        done = done | (need_pop & (sp == 0))
        sp = new_sp

        proc = (cur >= 0) & ~done
        node = jnp.maximum(cur, 0)
        lf = left_first[node]
        ct = count[node]
        is_leaf = proc & (ct > 0)
        is_int = proc & (ct == 0)

        base = jnp.where(is_leaf, lf, 0)
        idx = base[:, None] + jnp.arange(leaf_max, dtype=jnp.int32)[None, :]
        idx = jnp.clip(idx, 0, v0all.shape[0] - 1)
        if tri_test == "mt":
            hit, _, _, _ = moller_trumbore(
                o[:, None, :], d[:, None, :],
                v0all[idx], e1all[idx], e2all[idx], t0[:, None])
        else:
            tri = packed_tris[idx]
            hit, _, _, _ = leaf_intersect(
                tri_test, o[:, None, :], d[:, None, :], rd[:, None, :],
                tri[..., 0, :], tri[..., 1, :], tri[..., 2, :], t0[:, None],
                bw_rows=None if bw_all is None else bw_all[idx],
            )
        lane_ok = jnp.arange(leaf_max)[None, :] < ct[:, None]
        new_occ = occ | (is_leaf & jnp.any(hit & lane_ok, axis=1))
        done = done | new_occ

        l = jnp.where(is_int, lf, 0)
        r = l + 1
        dl = _slab(o, rd, t0, node_min[l], node_max[l])
        dr = _slab(o, rd, t0, node_min[r], node_max[r])
        lh = is_int & (dl < BVH_FAR)
        rh = is_int & (dr < BVH_FAR)
        push = lh & rh
        sidx = jnp.clip(sp, 0, STACK_DEPTH - 1)
        stack_node = _scatter_row(s["stack_node"], sidx, r, push)
        sp = jnp.where(push, sp + 1, sp)
        cur = jnp.where(is_int, jnp.where(lh, l, jnp.where(rh, r, -1)), cur)
        cur = jnp.where(is_leaf, -1, cur)
        return dict(cur=cur, sp=sp, stack_node=stack_node, occluded=new_occ, done=done)

    s = lax.while_loop(cond, body, state)
    return s["occluded"]


def _slab(o, rd, t, bmin, bmax):
    t1 = (bmin - o) * rd
    t2 = (bmax - o) * rd
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    ok = (tmax >= tmin) & (tmin < t) & (tmax >= 0.0)
    return jnp.where(ok, tmin, BVH_FAR)


def _scatter_row(arr, col_idx, values, mask):
    """arr: (R, S); write values (R,) at [r, col_idx[r]] where mask.

    Implemented as gather-merge-scatter of (R,) vectors so the (R, S) stack
    is only ever updated in place — a full-array select here would move the
    whole stack through HBM every traversal step.
    """
    rows = jnp.arange(arr.shape[0])
    old = arr[rows, col_idx]
    merged = jnp.where(mask, values.astype(arr.dtype), old)
    return arr.at[rows, col_idx].set(merged)
