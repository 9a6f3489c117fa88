"""Batched 8-wide BVH traversal — the TPU fast path.

Counterpart of BVH8_CPU::Intersect / IsOccluded (tiny_bvh.h:7188-7477).
The reference's AVX2 inner loop (8-wide slab test → movemask → perm-LUT
ordered push) becomes: one (R, 48) bounds-row gather + one (R, 8) child-row
gather per step, a dense (R, 8) slab test on the VPU, argmin for the near
child, and a scatter-free stack.

TPU-dictated design rules (measured in benchmarks/xla_patterns_probe.py):
  * row gathers `table[idx]` are fast (≈13 G lookups/s) — node fetches are
    gathers from (M, 48)/(M, 8) tables, VMEM-resident for typical scenes;
  * per-element scatters are SERIAL on TPU — per-ray stacks are therefore
    (S, R) arrays updated with one-hot compare/select arithmetic that XLA
    fuses into a single pass over the stack inside the while_loop;
  * pops are one-hot masked sums (gather-free), pushes place up to 7
    entries via exclusive-rank one-hot selects.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from tinybvh_tpu.core.intersect import moller_trumbore, tri_edges
from tinybvh_tpu.core.rays import Hits, Rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.layouts.mbvh import BVH8, EMPTY_SLOT

STACK_DEPTH = 32
_EMPTY = jnp.int32(-(2**31) + 1)  # "no current entry" sentinel


def _slab8(o, rd, t, bounds):
    """o, rd: (R, 3); t: (R,); bounds: (R, 48) → entry dists (R, 8)."""
    b = bounds.reshape(-1, 6, 8)
    t1x = (b[:, 0] - o[:, 0:1]) * rd[:, 0:1]
    t2x = (b[:, 3] - o[:, 0:1]) * rd[:, 0:1]
    t1y = (b[:, 1] - o[:, 1:2]) * rd[:, 1:2]
    t2y = (b[:, 4] - o[:, 1:2]) * rd[:, 1:2]
    t1z = (b[:, 2] - o[:, 2:3]) * rd[:, 2:3]
    t2z = (b[:, 5] - o[:, 2:3]) * rd[:, 2:3]
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    hit = (tmax >= tmin) & (tmin < t[:, None]) & (tmax >= 0.0)
    return jnp.where(hit, tmin, BVH_FAR)


def _pop(stack, col, can_pop, fill):
    """One-hot masked 'gather' of stack[col[r], r] without per-element
    indexing: a single fused pass over the (S, R) stack."""
    S = stack.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    m = (iota == col[None, :]) & can_pop[None, :]
    return jnp.where(m, stack, fill).sum(axis=0)


def _push8(stack_e, stack_d, sp, kids, dist, pushmask):
    """Push up to 8 (entry, dist) pairs per ray, scatter-free.

    kids/dist/pushmask: (R, 8). Each pushed lane k lands at stack row
    sp + rank_k where rank is the exclusive prefix count of pushed lanes.
    Eight one-hot selects over the (S, R) stack fuse into one pass.
    """
    S = stack_e.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    rank = jnp.cumsum(pushmask.astype(jnp.int32), axis=1) - pushmask
    target = sp[:, None] + rank  # (R, 8)
    pushmask = pushmask & (target < S)  # drop overflow (pathological scenes)
    for k in range(8):
        m = (iota == target[:, k][None, :]) & pushmask[:, k][None, :]
        stack_e = jnp.where(m, kids[:, k][None, :], stack_e)
        stack_d = jnp.where(m, dist[:, k][None, :], stack_d)
    n_push = pushmask.sum(axis=1).astype(jnp.int32)
    return stack_e, stack_d, sp + n_push


@partial(jax.jit, static_argnames=("with_cost",))
def intersect_bvh8(bvh8: BVH8, rays: Rays, t_max=BVH_FAR, with_cost=False,
                   omap=None):
    """Closest-hit traversal over the 8-wide layout. Returns Hits with
    global primitive ids.

    omap: optional (L, 4, S, S) bool opacity micromaps aligned with the
    leaf-triangle table (see ops.omap.leaf_align); a triangle hit whose
    barycentric cell bit is 0 is transparent and ignored (≙ the
    opacity-micromap test after the tri hit, tiny_bvh.h:8514-8522).
    """
    o, d, rd = rays.o, rays.d, rays.rd
    R = o.shape[0]
    rows = jnp.arange(R)
    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    v0t, e1t, e2t = tri_edges(bvh8.leaf_tris)  # (L, 4, 3)

    state = dict(
        cur=jnp.zeros(R, jnp.int32),  # start at root row 0
        sp=jnp.zeros(R, jnp.int32),
        stack_e=jnp.zeros((STACK_DEPTH, R), jnp.int32),
        stack_d=jnp.zeros((STACK_DEPTH, R), jnp.float32),
        t=t0,
        u=jnp.zeros(R, jnp.float32),
        v=jnp.zeros(R, jnp.float32),
        prim=jnp.full(R, -1, jnp.int32),
        done=jnp.zeros(R, bool),
        cost=jnp.zeros(R, jnp.float32),
    )

    def cond(s):
        return jnp.any(~s["done"])

    def body(s):
        cur, sp, done, t = s["cur"], s["sp"], s["done"], s["t"]

        # ---- pop ---------------------------------------------------------
        need_pop = (cur == _EMPTY) & ~done
        can_pop = need_pop & (sp > 0)
        nsp = jnp.where(can_pop, sp - 1, sp)
        pe = _pop(s["stack_e"], nsp, can_pop, 0)
        pd = _pop(s["stack_d"], nsp, can_pop, 0.0)
        take = can_pop & (pd < t)
        cur = jnp.where(take, pe, cur)
        done = done | (need_pop & (sp == 0))
        sp = nsp

        proc = (cur != _EMPTY) & ~done
        is_node = proc & (cur >= 0)
        is_leaf = proc & (cur < 0)

        # ---- interior: 8-wide slab test ---------------------------------
        nrow = jnp.where(is_node, cur, 0)
        dist = _slab8(o, rd, t, bvh8.bounds[nrow])  # (R, 8)
        kids = bvh8.child[nrow]  # (R, 8)
        valid = (dist < BVH_FAR) & (kids != EMPTY_SLOT) & is_node[:, None]
        dist = jnp.where(valid, dist, BVH_FAR)
        near = jnp.argmin(dist, axis=1)  # (R,)
        any_valid = valid.any(axis=1)
        next_node = jnp.where(any_valid, kids[rows, near], _EMPTY)

        lanes8 = jnp.arange(8, dtype=jnp.int32)
        pushmask = valid & (lanes8[None, :] != near[:, None])
        stack_e, stack_d, sp = _push8(
            s["stack_e"], s["stack_d"], sp, kids, dist, pushmask
        )

        # ---- leaf: dense 4-tri Möller–Trumbore --------------------------
        lrow = jnp.where(is_leaf, -cur - 1, 0)
        hit, th, uh, vh = moller_trumbore(
            o[:, None, :], d[:, None, :], v0t[lrow], e1t[lrow], e2t[lrow],
            t[:, None],
        )
        if omap is not None:
            S = omap.shape[-1]
            iu = jnp.clip((uh * S).astype(jnp.int32), 0, S - 1)
            iv = jnp.clip((vh * S).astype(jnp.int32), 0, S - 1)
            lanes4 = jnp.arange(4, dtype=jnp.int32)
            opaque = omap[lrow[:, None], lanes4[None, :], iu, iv]
            hit = hit & opaque
        th = jnp.where(hit & is_leaf[:, None], th, BVH_FAR)
        best = jnp.argmin(th, axis=1)
        bt = jnp.min(th, axis=1)
        improved = bt < t
        t = jnp.where(improved, bt, t)
        u = jnp.where(improved, jnp.take_along_axis(uh, best[:, None], 1)[:, 0], s["u"])
        v = jnp.where(improved, jnp.take_along_axis(vh, best[:, None], 1)[:, 0], s["v"])
        prim = jnp.where(
            improved,
            jnp.take_along_axis(bvh8.leaf_prim[lrow], best[:, None], 1)[:, 0],
            s["prim"],
        )

        cur = jnp.where(is_node, next_node, _EMPTY)
        cost = s["cost"] + jnp.where(is_node, 1.0, 0.0) + jnp.where(
            is_leaf, 4.0, 0.0
        )
        return dict(
            cur=cur, sp=sp, stack_e=stack_e, stack_d=stack_d,
            t=t, u=u, v=v, prim=prim, done=done, cost=cost,
        )

    s = lax.while_loop(cond, body, state)
    ok = s["prim"] >= 0
    hits = Hits(
        t=jnp.where(ok, s["t"], BVH_FAR),
        u=s["u"], v=s["v"], prim=s["prim"],
        inst=jnp.full(R, -1, jnp.int32),
    )
    if with_cost:
        return hits, s["cost"]
    return hits


@jax.jit
def is_occluded_bvh8(bvh8: BVH8, rays: Rays, t_max):
    """Any-hit traversal: unordered descent, early exit on first hit."""
    o, d, rd = rays.o, rays.d, rays.rd
    R = o.shape[0]
    rows = jnp.arange(R)
    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    v0t, e1t, e2t = tri_edges(bvh8.leaf_tris)

    state = dict(
        cur=jnp.zeros(R, jnp.int32),
        sp=jnp.zeros(R, jnp.int32),
        stack_e=jnp.zeros((STACK_DEPTH, R), jnp.int32),
        occ=jnp.zeros(R, bool),
        done=jnp.zeros(R, bool),
    )

    def cond(s):
        return jnp.any(~s["done"])

    def body(s):
        cur, sp, done, occ = s["cur"], s["sp"], s["done"], s["occ"]
        need_pop = (cur == _EMPTY) & ~done
        can_pop = need_pop & (sp > 0)
        nsp = jnp.where(can_pop, sp - 1, sp)
        pe = _pop(s["stack_e"], nsp, can_pop, 0)
        cur = jnp.where(can_pop, pe, cur)
        done = done | (need_pop & (sp == 0))
        sp = nsp

        proc = (cur != _EMPTY) & ~done
        is_node = proc & (cur >= 0)
        is_leaf = proc & (cur < 0)

        nrow = jnp.where(is_node, cur, 0)
        dist = _slab8(o, rd, t0, bvh8.bounds[nrow])
        kids = bvh8.child[nrow]
        valid = (dist < BVH_FAR) & (kids != EMPTY_SLOT) & is_node[:, None]
        near = jnp.argmax(valid, axis=1)  # first valid lane
        any_valid = valid.any(axis=1)
        next_node = jnp.where(any_valid, kids[rows, near], _EMPTY)

        lanes8 = jnp.arange(8, dtype=jnp.int32)
        pushmask = valid & (lanes8[None, :] != near[:, None])
        stack_e, _, sp = _push8(
            s["stack_e"], jnp.zeros_like(s["stack_e"], jnp.float32), sp,
            kids, jnp.where(valid, 0.0, BVH_FAR), pushmask,
        )

        lrow = jnp.where(is_leaf, -cur - 1, 0)
        hit, _, _, _ = moller_trumbore(
            o[:, None, :], d[:, None, :], v0t[lrow], e1t[lrow], e2t[lrow],
            t0[:, None],
        )
        new_occ = occ | (is_leaf & jnp.any(hit, axis=1))
        done = done | new_occ

        cur = jnp.where(is_node, next_node, _EMPTY)
        return dict(cur=cur, sp=sp, stack_e=stack_e, occ=new_occ, done=done)

    s = lax.while_loop(cond, body, state)
    return s["occ"]
