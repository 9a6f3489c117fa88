"""Per-ray ordered BVH8 traversal with round compaction — the incoherent
ray engine.

TPU-native counterpart of the reference's per-thread ordered traversals —
BVH8_CPU::Intersect's distance-keyed stack (tiny_bvh.h:7188-7363) and the
CWBVH GPU kernel (traverse_cwbvh.cl:124-569) — re-designed around three
measured facts about this hardware (benchmarks/rayloop_probe*.py):

  * rank-2 row gathers from node/leaf tables are fast (~0.4 ms per step at
    409k rays); rank-3 gathers are ~70x slower — every gathered table here
    is a flat (rows, cols) array;
  * an incoherent ray finishes in ~4 node visits on average while the
    lockstep maximum is >100 — so traversal runs in k-step ROUNDS with
    active-ray compaction down a static size ladder between rounds, all
    inside one jit (lax.while_loop per level: no host syncs, no drops);
  * in-loop triangle work is the dominant per-step cost — leaf hits are
    therefore DEFERRED: steps only append leaf ids to a per-ray list, and
    each round ends with one dense (R, LQ, 4) Möller–Trumbore resolve
    whose result feeds back into the traversal's t-pruning.

Exactness: every leaf whose slab test passes with tmin < t is either
resolved or (if the per-ray list is full) the ray pauses until the next
resolve — nothing is dropped. The only escape is per-ray stack overflow
(S entries), which is counted and returned so callers can escalate; with
S=24 it never fires on the bench scenes.

The quantized variant gathers uint8 CWBVH-style bounds (layouts/cwbvh.py)
plus an (M, 8) f32 origin/scale row and decodes in-loop — the fast
consumer of the compressed layout (node gather traffic drops ~3.4x).
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
from tinybvh_tpu.layouts.mbvh import BVH8, EMPTY_SLOT

_EMPTY = jnp.int32(-(2**31) + 1)  # "need pop" sentinel for cur


@struct.dataclass
class RayLoopTables:
    """Flat gather tables for the rayloop engine (all rank-2)."""

    bounds: jnp.ndarray | None  # (M, 48) f32, or None when quantized
    qbounds: jnp.ndarray | None  # (M, 48) uint8 (quantized variant)
    qmeta: jnp.ndarray | None  # (M, 8) f32 [origin xyz | scale xyz | 0 0]
    child: jnp.ndarray  # (M, 8) i32
    leaf_row: jnp.ndarray  # (L, 36) f32 [v0 x4x3 | e1 | e2]
    leaf_prim: jnp.ndarray  # (L, 4) i32

    @property
    def quantized(self) -> bool:
        return self.bounds is None


def make_rayloop_tables(bvh8: BVH8, quantized: bool = False,
                        host: dict | None = None) -> RayLoopTables:
    """Build the flat tables. host: optional dict of numpy arrays
    (bounds/child/leaf_tris/leaf_prim) to avoid device readbacks."""
    if host is not None:
        lt = host["leaf_tris"]
        v0 = lt[:, :, 0]
        leaf_row = np.concatenate(
            [v0.reshape(-1, 12),
             (lt[:, :, 1] - v0).reshape(-1, 12),
             (lt[:, :, 2] - v0).reshape(-1, 12)], axis=1).astype(np.float32)
        leaf_row = jnp.asarray(leaf_row)
        leaf_prim = jnp.asarray(host["leaf_prim"])
        child = jnp.asarray(host["child"])
        bounds_src = host["bounds"]
    else:
        v0, e1, e2 = tri_edges(bvh8.leaf_tris)  # (L, 4, 3)
        leaf_row = jnp.concatenate(
            [v0.reshape(-1, 12), e1.reshape(-1, 12), e2.reshape(-1, 12)],
            axis=1)
        leaf_prim = bvh8.leaf_prim
        child = bvh8.child
        bounds_src = bvh8.bounds
    if not quantized:
        b = (jnp.asarray(bounds_src) if host is not None else bounds_src)
        return RayLoopTables(bounds=b, qbounds=None, qmeta=None, child=child,
                             leaf_row=leaf_row, leaf_prim=leaf_prim)
    # conservative exponent quantization (≙ tiny_bvh.h:5947-5967; same
    # scheme as layouts.cwbvh.quantize_bvh8, done here on whichever host
    # the bounds live on)
    bnp = np.asarray(bounds_src).reshape(-1, 6, 8)
    lo, hi = bnp[:, :3], bnp[:, 3:]
    node_lo = np.where(lo < BVH_FAR / 2, lo, np.inf).min(axis=2)
    node_hi = np.where(hi > -BVH_FAR / 2, hi, -np.inf).max(axis=2)
    node_lo = np.where(np.isfinite(node_lo), node_lo, 0.0)
    node_hi = np.where(np.isfinite(node_hi), node_hi, 0.0)
    ext = np.maximum(node_hi - node_lo, 1e-20)
    scale = np.exp2(np.ceil(np.log2(ext / 255.0))).astype(np.float32)
    qlo = np.floor((lo - node_lo[:, :, None]) / scale[:, :, None])
    qhi = np.ceil((hi - node_lo[:, :, None]) / scale[:, :, None])
    # empty slots keep an inverted box after clipping: qlo=255, qhi=0
    empty = lo >= BVH_FAR / 2
    qlo = np.where(empty, 255, np.clip(qlo, 0, 255)).astype(np.uint8)
    qhi = np.where(empty, 0, np.clip(qhi, 0, 255)).astype(np.uint8)
    qb = np.concatenate([qlo, qhi], axis=1).reshape(-1, 48)
    qmeta = np.zeros((bnp.shape[0], 8), np.float32)
    qmeta[:, 0:3] = node_lo
    qmeta[:, 3:6] = scale
    return RayLoopTables(bounds=None, qbounds=jnp.asarray(qb),
                         qmeta=jnp.asarray(qmeta), child=child,
                         leaf_row=leaf_row, leaf_prim=leaf_prim)


def _slab8_rows(o, rd, t, bounds48):
    """(R,3) rays vs (R,48) bounds rows → (R,8) entry dists (FAR=miss)."""
    b = bounds48.reshape(-1, 6, 8)
    t1x = (b[:, 0] - o[:, 0:1]) * rd[:, 0:1]
    t2x = (b[:, 3] - o[:, 0:1]) * rd[:, 0:1]
    t1y = (b[:, 1] - o[:, 1:2]) * rd[:, 1:2]
    t2y = (b[:, 4] - o[:, 1:2]) * rd[:, 1:2]
    t1z = (b[:, 2] - o[:, 2:3]) * rd[:, 2:3]
    t2z = (b[:, 5] - o[:, 2:3]) * rd[:, 2:3]
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z))
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z))
    hit = (tmax >= tmin) & (tmin < t[:, None]) & (tmax >= 0.0)
    return jnp.where(hit, tmin, BVH_FAR)


def _init_state(rays: Rays, t_max, S: int, LQ: int, anyhit: bool):
    R = rays.o.shape[0]
    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    s = dict(
        o=rays.o, d=rays.d, rd=rays.rd,
        rid=jnp.arange(R, dtype=jnp.int32),
        cur=jnp.zeros(R, jnp.int32),
        sp=jnp.zeros(R, jnp.int32),
        se=jnp.zeros((R, S), jnp.int32),
        sd=jnp.zeros((R, S), jnp.float32),
        t=t0,
        lq=jnp.full((R, LQ), -1, jnp.int32),
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
    return s


def _step(tb: RayLoopTables, s, S: int, LQ: int):
    """One traversal step: pop → slab-test 8 children → emit leaf slots →
    descend nearest internal child, push the rest distance-keyed."""
    cur, sp, done, t, lc = s["cur"], s["sp"], s["done"], s["t"], s["lc"]
    se, sd = s["se"], s["sd"]
    iota_s = jnp.arange(S, dtype=jnp.int32)
    lanes8 = jnp.arange(8, dtype=jnp.int32)

    # ---- pop (one-hot multiply-sum over the (R,S) stack) ------------------
    need = (cur == _EMPTY) & ~done
    done = done | (need & (sp == 0))
    can = need & (sp > 0)
    nsp = jnp.where(can, sp - 1, sp)
    oh = (iota_s[None, :] == nsp[:, None]) & can[:, None]
    pe = jnp.sum(jnp.where(oh, se, 0), axis=1)
    pd = jnp.sum(jnp.where(oh, sd, 0.0), axis=1)
    cur = jnp.where(can & (pd < t), pe, cur)  # pruned pops stay _EMPTY
    sp = nsp

    # ---- process the current node (pause while the leaf list is full) ----
    ready = (cur >= 0) & ~done & (lc + 8 <= LQ)
    nrow = jnp.where(ready, cur, 0)
    if tb.quantized:
        qb = tb.qbounds[nrow].astype(jnp.float32).reshape(-1, 6, 8)
        qm = tb.qmeta[nrow]
        org = qm[:, 0:3]
        scl = qm[:, 3:6]
        lo = org[:, :, None] + qb[:, :3] * scl[:, :, None]
        hi = org[:, :, None] + qb[:, 3:] * scl[:, :, None]
        bounds = jnp.concatenate([lo, hi], axis=1).reshape(-1, 48)
    else:
        bounds = tb.bounds[nrow]
    dist = _slab8_rows(s["o"], s["rd"], t, bounds)
    kids = tb.child[nrow]
    valid = (dist < BVH_FAR) & (kids != EMPTY_SLOT) & ready[:, None]

    # ---- emit leaf children into the per-ray list -------------------------
    leafmask = valid & (kids < 0)
    lrank = jnp.cumsum(leafmask.astype(jnp.int32), axis=1) - leafmask
    ltgt = jnp.where(leafmask, lc[:, None] + lrank, -1)  # (R, 8)
    iota_q = jnp.arange(LQ, dtype=jnp.int32)
    mq = iota_q[None, :, None] == ltgt[:, None, :]  # (R, LQ, 8)
    leaf_ids = -kids - 1
    lq = jnp.where(jnp.any(mq, axis=2),
                   jnp.sum(jnp.where(mq, leaf_ids[:, None, :], 0), axis=2),
                   s["lq"])
    lc = lc + jnp.sum(leafmask, axis=1)

    # ---- descend nearest internal child, push the rest --------------------
    imask = valid & (kids >= 0)
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
    sp = sp + jnp.sum((tgt >= 0).astype(jnp.int32), axis=1)

    cur = jnp.where(ready, nxt, cur)
    return dict(s, cur=cur, sp=sp, se=se, sd=sd, t=t, lq=lq, lc=lc,
                done=done, sovf=sovf)


def _resolve(tb: RayLoopTables, s, LQ: int, anyhit: bool):
    """Dense Möller–Trumbore over the emitted (R, LQ) leaf lists; feeds t
    (or occlusion) back into the traversal state and clears the lists."""
    lq, t = s["lq"], s["t"]
    R = lq.shape[0]
    has = lq >= 0
    lidx = jnp.maximum(lq, 0).reshape(-1)
    row = tb.leaf_row[lidx]  # (R*LQ, 36) — rank-2 gather
    v0 = row[:, 0:12].reshape(R, LQ, 4, 3)
    e1 = row[:, 12:24].reshape(R, LQ, 4, 3)
    e2 = row[:, 24:36].reshape(R, LQ, 4, 3)
    hit, th, uh, vh = moller_trumbore(
        s["o"][:, None, None, :], s["d"][:, None, None, :], v0, e1, e2,
        t[:, None, None])
    hit = hit & has[:, :, None]
    if anyhit:
        occ = s["occ"] | jnp.any(hit, axis=(1, 2))
        return dict(s, occ=occ, done=s["done"] | occ,
                    lq=jnp.full_like(lq, -1), lc=jnp.zeros_like(s["lc"]))
    thv = jnp.where(hit, th, BVH_FAR).reshape(R, LQ * 4)
    best = jnp.argmin(thv, axis=1)
    bt = jnp.min(thv, axis=1)
    improved = bt < t
    prim_rows = tb.leaf_prim[lidx].reshape(R, LQ * 4)
    pick = lambda a: jnp.take_along_axis(a, best[:, None], 1)[:, 0]
    t = jnp.where(improved, bt, t)
    u = jnp.where(improved, pick(uh.reshape(R, LQ * 4)), s["u"])
    v = jnp.where(improved, pick(vh.reshape(R, LQ * 4)), s["v"])
    prim = jnp.where(improved, pick(prim_rows), s["prim"])
    return dict(s, t=t, u=u, v=v, prim=prim,
                lq=jnp.full_like(lq, -1), lc=jnp.zeros_like(s["lc"]))


def _round(tb: RayLoopTables, s, k: int, S: int, LQ: int, anyhit: bool):
    s = lax.fori_loop(0, k, lambda i, st: _step(tb, st, S, LQ), s)
    return _resolve(tb, s, LQ, anyhit)


def _compact(s, cap: int, R0: int, anyhit: bool):
    """Gather the alive rays into a cap-sized batch (callers guarantee
    alive <= cap via the level while-loop condition)."""
    R = s["done"].shape[0]
    idx = jnp.nonzero(~s["done"], size=cap, fill_value=R)[0]
    pad = idx >= R
    g = jnp.minimum(idx, R - 1)
    out = {k: v[g] for k, v in s.items()}
    out["done"] = jnp.where(pad, True, out["done"])
    out["rid"] = jnp.where(pad, R0, out["rid"])  # scatter mode='drop'
    return out


def _scatter_out(outs, s, anyhit: bool):
    rid = s["rid"]
    def put(a, v):
        return a.at[rid].set(v, mode="drop")
    outs = dict(outs)
    if anyhit:
        outs["occ"] = put(outs["occ"], s["occ"])
    else:
        outs["t"] = put(outs["t"], s["t"])
        outs["u"] = put(outs["u"], s["u"])
        outs["v"] = put(outs["v"], s["v"])
        outs["prim"] = put(outs["prim"], s["prim"])
    outs["sovf"] = put(outs["sovf"], s["sovf"])
    return outs


def _ladder(R: int, shrink: int, min_size: int, levels: int):
    sizes = [R]
    while len(sizes) < levels and sizes[-1] // shrink >= min_size:
        sizes.append(sizes[-1] // shrink)
    return tuple(sizes)


@partial(jax.jit, static_argnames=(
    "anyhit", "k", "S", "LQ", "shrink", "min_size", "levels", "max_rounds"))
def _run(tb: RayLoopTables, rays: Rays, t_max, anyhit=False, k=8, S=24,
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

    for li, size in enumerate(sizes):
        last = li == len(sizes) - 1
        # run rounds at this size until the alive set fits the next level
        # (or, at the last level, until every ray is done); while_loop on
        # device — no host syncs, nothing ever dropped
        thresh = 0 if last else sizes[li + 1]

        def cond(carry):
            st, rounds = carry
            alive = jnp.sum((~st["done"]).astype(jnp.int32))
            return (alive > thresh) & (rounds < max_rounds)

        def body(carry):
            st, rounds = carry
            return _round(tb, st, k, S, LQ, anyhit), rounds + 1

        s, _ = lax.while_loop(cond, body, (s, jnp.int32(0)))
        outs = _scatter_out(outs, s, anyhit)
        if not last:
            s = _compact(s, sizes[li + 1], R0, anyhit)
    return outs


def intersect_rayloop(tables: RayLoopTables, rays: Rays,
                      t_max=BVH_FAR, k: int = 8, S: int = 24, LQ: int = 16,
                      shrink: int = 4, min_size: int = 4096,
                      levels: int = 4):
    """Exact closest-hit trace of an incoherent ray batch.

    Returns (Hits, stack_overflow_mask). The mask is all-False for sane
    scenes (S=24 covers BVH8 depths ~30+); callers treating it as an
    exactness gate should escalate flagged rays with a larger S.
    """
    outs = _run(tables, rays, t_max, anyhit=False, k=k, S=S, LQ=LQ,
                shrink=shrink, min_size=min_size, levels=levels)
    ok = outs["prim"] >= 0
    hits = Hits(t=jnp.where(ok, outs["t"], BVH_FAR), u=outs["u"],
                v=outs["v"], prim=outs["prim"],
                inst=jnp.full(outs["prim"].shape, -1, jnp.int32))
    return hits, outs["sovf"]


def is_occluded_rayloop(tables: RayLoopTables, rays: Rays,
                        t_max, k: int = 8, S: int = 24, LQ: int = 16,
                        shrink: int = 4, min_size: int = 4096,
                        levels: int = 4):
    """Exact any-hit occlusion for an incoherent ray batch.

    Returns (occluded_mask, stack_overflow_mask)."""
    outs = _run(tables, rays, t_max, anyhit=True, k=k, S=S, LQ=LQ,
                shrink=shrink, min_size=min_size, levels=levels)
    return outs["occ"], outs["sovf"]
