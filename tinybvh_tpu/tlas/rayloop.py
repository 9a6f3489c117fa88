"""Two-level (TLAS -> BLAS) per-ray ordered traversal with round compaction.

The incoherent-ray engine for instanced scenes: the rayloop architecture
(traverse/rayloop.py) extended with an instance *frame* per ray. Fills the
role of the reference's recursive TLAS Intersect — walk the instance
hierarchy, re-transform the ray on instance entry, continue into the BLAS
(tiny_bvh.h:3306-3380) — but as one flat state machine over the merged
node table that `tlas.instance.TLAS8` already encodes:

  child word e >= 0          -> node row (TLAS rows first, then BLAS rows)
  -L <= e <= -1              -> BLAS leaf row (-e - 1)
  e < -L                     -> instance (-e - 1 - L)

Per-ray state adds `frame` (current instance, -1 = world) next to the
distance-keyed short stack; stack entries carry the frame they were pushed
under, so a pop across instances restores it. Directions are NOT
normalized after the world->BLAS transform, so hit-t is identical in both
spaces (same trick as tiny_bvh.h:3329-3333) and one world-t prunes every
frame's slab tests.

Leaf hits stay DEFERRED like the single-BLAS engine: steps append
(leaf row, frame) pairs, and the round-end dense Moller-Trumbore resolve
re-derives each slot's frame-local ray from a rank-2 gather of the
(I+1, 16) inverse-transform table.

This replaces the lockstep `intersect_tlas8` (0.06 MRays/s class) as the
exact per-ray path for instanced scenes — both as the bench oracle and as
the escalation target for bucketed-packet overflow.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from tinybvh_tpu.core.intersect import moller_trumbore, tri_edges
from tinybvh_tpu.core.rays import Hits, Rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.layouts.mbvh import EMPTY_SLOT
from tinybvh_tpu.tlas.instance import TLAS8
from tinybvh_tpu.traverse.rayloop import _compact, _ladder, _slab8_rows

_EMPTY = jnp.int32(-(2**31) + 1)  # "need pop" sentinel for cur


@struct.dataclass
class TLASRayLoopTables:
    """Flat rank-2 gather tables for the two-level rayloop engine."""

    bounds: jnp.ndarray  # (M, 48) f32 merged node table
    child: jnp.ndarray  # (M, 8) i32 encoded child words
    leaf_row: jnp.ndarray  # (L, 36) f32 [v0 x4x3 | e1 | e2] (BLAS-local)
    leaf_prim: jnp.ndarray  # (L, 4) i32 BLAS-local prim ids
    inv_flat: jnp.ndarray  # (I+1, 16) f32 world->BLAS; row I = identity
    inst_mask: jnp.ndarray  # (I+1,) i32 visibility; row I = all bits
    inst_root: jnp.ndarray  # (I+1,) i32 merged root row; row I = 0
    n_leaf_rows: int = struct.field(pytree_node=False)
    n_inst: int = struct.field(pytree_node=False)


@jax.jit
def _leaf_rows(leaf_tris):
    v0, e1, e2 = tri_edges(leaf_tris)  # (L, 4, 3)
    return jnp.concatenate(
        [v0.reshape(-1, 12), e1.reshape(-1, 12), e2.reshape(-1, 12)], axis=1)


def make_tlas_rayloop_tables(tlas: TLAS8) -> TLASRayLoopTables:
    """Derive the flat tables from a TLAS8 (one-time, device-side)."""
    n_inst = int(tlas.inst_inv.shape[0])
    inv_flat = jnp.concatenate(
        [tlas.inst_inv.reshape(n_inst, 16),
         jnp.eye(4, dtype=jnp.float32).reshape(1, 16)])
    inst_mask = jnp.concatenate(
        [tlas.inst_mask.astype(jnp.int32),
         jnp.full((1,), 0xFFFF, jnp.int32)])
    inst_root = jnp.concatenate(
        [tlas.inst_root.astype(jnp.int32), jnp.zeros((1,), jnp.int32)])
    return TLASRayLoopTables(
        bounds=tlas.bounds, child=tlas.child,
        leaf_row=_leaf_rows(tlas.leaf_tris), leaf_prim=tlas.leaf_prim,
        inv_flat=inv_flat, inst_mask=inst_mask, inst_root=inst_root,
        n_leaf_rows=int(tlas.n_leaf_rows), n_inst=n_inst)


def _init_state(rays: Rays, t_max, S: int, LQ: int, anyhit: bool):
    R = rays.o.shape[0]
    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    mask = rays.mask if rays.mask is not None else jnp.full(
        R, 0xFFFF, jnp.int32)
    s = dict(
        o=rays.o, d=rays.d,
        mask=mask.astype(jnp.int32),
        rid=jnp.arange(R, dtype=jnp.int32),
        cur=jnp.zeros(R, jnp.int32),
        frame=jnp.full(R, -1, jnp.int32),
        sp=jnp.zeros(R, jnp.int32),
        se=jnp.zeros((R, S), jnp.int32),
        sd=jnp.zeros((R, S), jnp.float32),
        sf=jnp.full((R, S), -1, jnp.int32),
        t=t0,
        lq=jnp.full((R, LQ), -1, jnp.int32),
        lqf=jnp.full((R, LQ), -1, jnp.int32),
        lc=jnp.zeros(R, jnp.int32),
        done=jnp.zeros(R, bool),
        sovf=jnp.zeros(R, bool),
    )
    if anyhit:
        s["occ"] = jnp.zeros(R, bool)
    else:
        s["u"] = jnp.zeros(R, jnp.float32)
        s["v"] = jnp.zeros(R, jnp.float32)
        s["prim"] = jnp.full(R, -1, jnp.int32)
        s["inst"] = jnp.full(R, -1, jnp.int32)
    return s


def _frame_ray(tb: TLASRayLoopTables, frame, o, d):
    """Gather world->BLAS transforms and apply (identity for frame = -1)."""
    from tinybvh_tpu.core.vecmath import mat3_apply, safe_rcp

    fi = jnp.where(frame < 0, tb.n_inst, frame)
    inv = tb.inv_flat[fi].reshape(-1, 4, 4)
    o2 = mat3_apply(inv[:, :3, :3], o) + inv[:, :3, 3]
    d2 = mat3_apply(inv[:, :3, :3], d)
    return o2, d2, safe_rcp(d2)


def _step(tb: TLASRayLoopTables, s, S: int, LQ: int):
    """One step: pop (frame-restoring) -> instance entry -> slab-test 8
    children -> emit leaf slots -> descend nearest, push the rest."""
    cur, frame, sp = s["cur"], s["frame"], s["sp"]
    done, t, lc = s["done"], s["t"], s["lc"]
    se, sd, sf = s["se"], s["sd"], s["sf"]
    L = tb.n_leaf_rows
    iota_s = jnp.arange(S, dtype=jnp.int32)
    lanes8 = jnp.arange(8, dtype=jnp.int32)

    # ---- pop (one-hot multiply-sum; restores the pushed frame) ------------
    need = (cur == _EMPTY) & ~done
    done = done | (need & (sp == 0))
    can = need & (sp > 0)
    nsp = jnp.where(can, sp - 1, sp)
    oh = (iota_s[None, :] == nsp[:, None]) & can[:, None]
    pe = jnp.sum(jnp.where(oh, se, 0), axis=1)
    pd = jnp.sum(jnp.where(oh, sd, 0.0), axis=1)
    pf = jnp.sum(jnp.where(oh, sf, 0), axis=1)
    take = can & (pd < t)
    cur = jnp.where(take, pe, cur)  # pruned pops stay _EMPTY
    frame = jnp.where(take, pf, frame)
    sp = nsp

    # ---- instance entry: decode code, mask-gate, jump to BLAS root --------
    live = ~done & (cur != _EMPTY)
    is_inst = live & (cur < -L)
    iid = jnp.where(is_inst, -cur - 1 - L, tb.n_inst)
    mok = (tb.inst_mask[iid] & s["mask"]) != 0
    enter = is_inst & mok
    cur = jnp.where(enter, tb.inst_root[iid],
                    jnp.where(is_inst, _EMPTY, cur))
    frame = jnp.where(enter, iid, frame)

    # ---- frame-local ray (rank-2 (R,16) gather; identity in world) --------
    o2, d2, rd2 = _frame_ray(tb, frame, s["o"], s["d"])

    # ---- process the current node (pause while the leaf list is full) -----
    ready = (cur >= 0) & ~done & (lc + 8 <= LQ)
    nrow = jnp.where(ready, cur, 0)
    dist = _slab8_rows(o2, rd2, t, tb.bounds[nrow])
    kids = tb.child[nrow]
    valid = (dist < BVH_FAR) & (kids != EMPTY_SLOT) & ready[:, None]

    # ---- emit leaf children (with their frame) into the per-ray list ------
    leafmask = valid & (kids < 0) & (kids >= -L)
    lrank = jnp.cumsum(leafmask.astype(jnp.int32), axis=1) - leafmask
    ltgt = jnp.where(leafmask, lc[:, None] + lrank, -1)  # (R, 8)
    iota_q = jnp.arange(LQ, dtype=jnp.int32)
    mq = iota_q[None, :, None] == ltgt[:, None, :]  # (R, LQ, 8)
    any_mq = jnp.any(mq, axis=2)
    leaf_ids = -kids - 1
    lq = jnp.where(any_mq,
                   jnp.sum(jnp.where(mq, leaf_ids[:, None, :], 0), axis=2),
                   s["lq"])
    lqf = jnp.where(any_mq, frame[:, None], s["lqf"])
    lc = lc + jnp.sum(leafmask, axis=1)

    # ---- descend nearest node-or-instance child, push the rest ------------
    imask = valid & ((kids >= 0) | (kids < -L))
    idist = jnp.where(imask, dist, BVH_FAR)
    near = jnp.argmin(idist, axis=1)
    any_i = imask.any(axis=1)
    nxt = jnp.where(any_i, jnp.take_along_axis(kids, near[:, None], 1)[:, 0],
                    _EMPTY)
    pushmask = imask & (lanes8[None, :] != near[:, None])
    rank = jnp.cumsum(pushmask.astype(jnp.int32), axis=1) - pushmask
    tgt = jnp.where(pushmask, sp[:, None] + rank, -1)
    sovf = s["sovf"] | jnp.any(tgt >= S, axis=1)
    tgt = jnp.where(tgt < S, tgt, -1)
    ms = iota_s[None, :, None] == tgt[:, None, :]  # (R, S, 8)
    any_ms = jnp.any(ms, axis=2)
    se = jnp.where(any_ms,
                   jnp.sum(jnp.where(ms, kids[:, None, :], 0), axis=2), se)
    sd = jnp.where(any_ms,
                   jnp.sum(jnp.where(ms, idist[:, None, :], 0.0), axis=2), sd)
    sf = jnp.where(any_ms, frame[:, None], sf)
    sp = sp + jnp.sum((tgt >= 0).astype(jnp.int32), axis=1)

    cur = jnp.where(ready, nxt, cur)
    return dict(s, cur=cur, frame=frame, sp=sp, se=se, sd=sd, sf=sf, t=t,
                lq=lq, lqf=lqf, lc=lc, done=done, sovf=sovf)


def _resolve(tb: TLASRayLoopTables, s, LQ: int, anyhit: bool):
    """Dense Moller-Trumbore over the (R, LQ) leaf lists; each slot's ray
    is re-derived in its own instance frame. Feeds t/occlusion back."""
    lq, lqf, t = s["lq"], s["lqf"], s["t"]
    R = lq.shape[0]
    has = lq >= 0
    lidx = jnp.maximum(lq, 0).reshape(-1)
    row = tb.leaf_row[lidx]  # (R*LQ, 36) — rank-2 gather
    v0 = row[:, 0:12].reshape(R, LQ, 4, 3)
    e1 = row[:, 12:24].reshape(R, LQ, 4, 3)
    e2 = row[:, 24:36].reshape(R, LQ, 4, 3)
    o_f = jnp.broadcast_to(s["o"][:, None, :], (R, LQ, 3)).reshape(-1, 3)
    d_f = jnp.broadcast_to(s["d"][:, None, :], (R, LQ, 3)).reshape(-1, 3)
    o2, d2, _ = _frame_ray(tb, lqf.reshape(-1), o_f, d_f)
    hit, th, uh, vh = moller_trumbore(
        o2.reshape(R, LQ, 1, 3), d2.reshape(R, LQ, 1, 3), v0, e1, e2,
        t[:, None, None])
    hit = hit & has[:, :, None]
    if anyhit:
        occ = s["occ"] | jnp.any(hit, axis=(1, 2))
        return dict(s, occ=occ, done=s["done"] | occ,
                    lq=jnp.full_like(lq, -1), lqf=jnp.full_like(lqf, -1),
                    lc=jnp.zeros_like(s["lc"]))
    thv = jnp.where(hit, th, BVH_FAR).reshape(R, LQ * 4)
    best = jnp.argmin(thv, axis=1)
    bt = jnp.min(thv, axis=1)
    improved = bt < t
    prim_rows = tb.leaf_prim[lidx].reshape(R, LQ * 4)
    inst_rows = jnp.broadcast_to(lqf[:, :, None], (R, LQ, 4)).reshape(
        R, LQ * 4)
    pick = lambda a: jnp.take_along_axis(a, best[:, None], 1)[:, 0]
    t = jnp.where(improved, bt, t)
    u = jnp.where(improved, pick(uh.reshape(R, LQ * 4)), s["u"])
    v = jnp.where(improved, pick(vh.reshape(R, LQ * 4)), s["v"])
    prim = jnp.where(improved, pick(prim_rows), s["prim"])
    inst = jnp.where(improved, pick(inst_rows), s["inst"])
    return dict(s, t=t, u=u, v=v, prim=prim, inst=inst,
                lq=jnp.full_like(lq, -1), lqf=jnp.full_like(lqf, -1),
                lc=jnp.zeros_like(s["lc"]))


def _round(tb, s, k: int, S: int, LQ: int, anyhit: bool):
    s = lax.fori_loop(0, k, lambda i, st: _step(tb, st, S, LQ), s)
    return _resolve(tb, s, LQ, anyhit)


def _scatter_out(outs, s):
    rid = s["rid"]
    def put(a, v):
        return a.at[rid].set(v, mode="drop")
    outs = dict(outs)
    for k in ("occ", "t", "u", "v", "prim", "inst"):
        if k in outs:
            outs[k] = put(outs[k], s[k])
    outs["sovf"] = put(outs["sovf"], s["sovf"])
    return outs


@partial(jax.jit, static_argnames=(
    "anyhit", "k", "S", "LQ", "shrink", "min_size", "levels", "max_rounds"))
def _run(tb: TLASRayLoopTables, rays: Rays, t_max, anyhit=False, k=8, S=32,
         LQ=16, shrink=4, min_size=4096, levels=4, max_rounds=512):
    R0 = rays.o.shape[0]
    sizes = _ladder(R0, shrink, min_size, levels)
    s = _init_state(rays, t_max, S, LQ, anyhit)
    outs = dict(sovf=jnp.zeros(R0, bool))
    if anyhit:
        outs["occ"] = jnp.zeros(R0, bool)
    else:
        outs["t"] = jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32), (R0,)).astype(jnp.float32)
        outs["u"] = jnp.zeros(R0, jnp.float32)
        outs["v"] = jnp.zeros(R0, jnp.float32)
        outs["prim"] = jnp.full(R0, -1, jnp.int32)
        outs["inst"] = jnp.full(R0, -1, jnp.int32)

    for li, size in enumerate(sizes):
        last = li == len(sizes) - 1
        thresh = 0 if last else sizes[li + 1]

        def cond(carry):
            st, rounds = carry
            alive = jnp.sum((~st["done"]).astype(jnp.int32))
            return (alive > thresh) & (rounds < max_rounds)

        def body(carry):
            st, rounds = carry
            return _round(tb, st, k, S, LQ, anyhit), rounds + 1

        s, _ = lax.while_loop(cond, body, (s, jnp.int32(0)))
        outs = _scatter_out(outs, s)
        if not last:
            s = _compact(s, sizes[li + 1], R0, anyhit)
    return outs


def intersect_tlas_rayloop(tables: TLASRayLoopTables, rays: Rays,
                           t_max=BVH_FAR, k: int = 8, S: int = 32,
                           LQ: int = 16, shrink: int = 4,
                           min_size: int = 4096, levels: int = 4):
    """Exact closest-hit two-level trace. Returns (Hits, overflow_mask);
    Hits.inst is the instance id, Hits.prim the BLAS-local prim id
    (matching the reference's Intersection record, tiny_bvh.h:693-703)."""
    outs = _run(tables, rays, t_max, anyhit=False, k=k, S=S, LQ=LQ,
                shrink=shrink, min_size=min_size, levels=levels)
    ok = outs["prim"] >= 0
    hits = Hits(t=jnp.where(ok, outs["t"], BVH_FAR), u=outs["u"],
                v=outs["v"], prim=outs["prim"], inst=outs["inst"])
    return hits, outs["sovf"]


def is_occluded_tlas_rayloop(tables: TLASRayLoopTables, rays: Rays,
                             t_max, k: int = 8, S: int = 32, LQ: int = 16,
                             shrink: int = 4, min_size: int = 4096,
                             levels: int = 4):
    """Exact any-hit two-level occlusion. Returns (occluded, overflow)."""
    outs = _run(tables, rays, t_max, anyhit=True, k=k, S=S, LQ=LQ,
                shrink=shrink, min_size=min_size, levels=levels)
    return outs["occ"], outs["sovf"]
