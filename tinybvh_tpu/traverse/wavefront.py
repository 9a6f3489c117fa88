"""Wavefront traversal: level-synchronous BFS over (ray, node) pairs.

The TPU-native formulation of BVH traversal (SURVEY.md §2.5 P3/P4): instead
of per-ray stacks advancing in lockstep (which pays per-iteration sync × the
MAXIMUM per-ray path length — hundreds of while_loop iterations), the whole
frontier of (ray, node) pairs advances one tree LEVEL per iteration:

  level k pairs ──gather──► 8-wide slab tests ──compact──► level k+1 pairs

so the loop runs ~tree-depth (≈7-15) times with large dense ops.

Primitive choices are driven by measured costs on the target TPU
(benchmarks/op_cost_probe.py):
  * jnp.searchsorted is ~160 ms at 1M — NEVER used. Stream compaction is
    instead scatter-max of segment heads + cummax ("where did slot j come
    from"), both ~7 ms/0.3 ms.
  * general per-element scatter is serial — only COMMUTATIVE scatters
    (min/max/add) are used, which lower to TPU-parallelizable form.
  * per-ray closest-hit folding uses the monotone-bitcast trick: positive
    f32 distances bitcast to i32 preserve order, so a single scatter-min
    reduces (t, payload) lexicographically when t is packed into high bits
    of separate keys; barycentrics are recovered at the end by
    re-intersecting each ray's single winning triangle.

Equivalent query semantics to BVH8_CPU::Intersect (tiny_bvh.h:7188): same
hits, different evaluation order; t-pruning uses the best hit known as of
the previous level (BFS lag) instead of DFS ordering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from tinybvh_tpu.core.intersect import (
    leaf_intersect, moller_trumbore, precompute_baldwin_weber, tri_edges,
)
from tinybvh_tpu.core.rays import Hits, Rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.layouts.mbvh import BVH8, EMPTY_SLOT

MAX_LEVELS = 64
_I32MAX = 2**31 - 1  # plain int: a module-level jnp scalar becomes a
# mesh-committed device constant on first shard_map use and poisons later
# traces under a different Mesh


def _slab8(o, rd, t, bounds):
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


def _t_key(t):
    """Monotone i32 key for non-negative f32 distances (bitcast preserves
    order for positive floats)."""
    return lax.bitcast_convert_type(t, jnp.int32)


def intersect_wavefront(
    bvh8: BVH8, rays: Rays, t_max=BVH_FAR, cap_factor: int = 3,
    any_hit: bool = False, omap=None, tri_test: str | None = None,
):
    """Closest-hit (or any-hit) wavefront traversal.

    cap_factor bounds the frontier at cap_factor·R pairs; overflow drops
    pairs (returned flag reports it — raise cap_factor if it ever fires).

    omap: optional (L, 4, S, S) bool opacity micromaps aligned with the
    leaf-triangle table (ops.omap.leaf_align); a triangle hit whose
    barycentric cell is transparent is discarded (≙ the reference's
    in-traversal omap test, tiny_bvh.h:8514-8522 — consulted in its fast
    engines too, which this wavefront is the analog of).

    tri_test selects the leaf triangle test (None → Config.tri_test),
    ≙ WATERTIGHT_TRITEST (tiny_bvh.h:131, 8486-8507).
    """
    if tri_test is None:
        from tinybvh_tpu.config import get_config

        tri_test = get_config().tri_test
    return _intersect_wavefront(bvh8, rays, t_max, cap_factor=cap_factor,
                                any_hit=any_hit, omap=omap,
                                tri_test=tri_test)


@partial(jax.jit, static_argnames=("cap_factor", "any_hit", "tri_test"))
def _intersect_wavefront(
    bvh8: BVH8, rays: Rays, t_max=BVH_FAR, cap_factor: int = 3,
    any_hit: bool = False, omap=None, tri_test: str = "mt",
):
    from tinybvh_tpu.layouts.cwbvh import BVH8Q, dequantize_bounds

    o_all, d_all, rd_all = rays.o, rays.d, rays.rd
    R = o_all.shape[0]
    P = cap_factor * R
    if isinstance(bvh8, BVH8Q):
        get_bounds = lambda rows: dequantize_bounds(bvh8, rows)
    else:
        get_bounds = lambda rows: bvh8.bounds[rows]
    v0t, e1t, e2t = tri_edges(bvh8.leaf_tris)  # (L, 4, 3)
    # fuse the leaf geometry into one wide row: [v0|e1|e2] x 4 lanes → 36,
    # padded to 48 floats — narrow-row gathers are ~5x slower on TPU.
    # Baldwin–Weber rows are exactly 4 lanes x 12 = 48 floats, so they
    # ride the SAME fused-gather slot when tri_test == "baldwin".
    L4 = v0t.shape[0]
    bw_t = None
    if tri_test == "baldwin":
        bw_t = precompute_baldwin_weber(
            bvh8.leaf_tris.reshape(-1, 3, 3)).reshape(L4, 4, 12)
        leaf_geom = bw_t.reshape(L4, 48)
    elif tri_test == "watertight":
        # RAW vertices [v0|v1|v2]: watertightness needs bit-identical
        # shared edge endpoints (v0+e1 reconstruction would leak)
        leaf_geom = jnp.concatenate(
            [bvh8.leaf_tris.reshape(L4, 36),
             jnp.zeros((L4, 12), jnp.float32)], axis=1)
    else:
        leaf_geom = jnp.concatenate(
            [v0t.reshape(-1, 12), e1t.reshape(-1, 12), e2t.reshape(-1, 12),
             jnp.zeros((L4, 12), jnp.float32)], axis=1)  # (L, 48)
    # one fused per-pair ray-data gather: [o | d | rd | pad] → (R, 16)
    ray_data = jnp.concatenate(
        [o_all, d_all, rd_all, jnp.zeros((o_all.shape[0], 7), jnp.float32)],
        axis=1)

    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

    slot = jnp.arange(P, dtype=jnp.int32)
    pair_ray = jnp.where(slot < R, slot, R - 1)
    pair_code = jnp.zeros(P, jnp.int32)  # root row 0 (code >= 0 → node)
    pair_tmin = jnp.where(slot < R, 0.0, BVH_FAR)
    n_pairs = jnp.asarray(R, jnp.int32)

    tkey0 = _t_key(t0)
    state = dict(
        pair_ray=pair_ray, pair_code=pair_code, pair_tmin=pair_tmin,
        n_pairs=n_pairs,
        tkey=tkey0,               # (R,) best-hit distance as sortable i32
        win=jnp.full(R, _I32MAX, jnp.int32),  # packed winner leafrow*4+lane
        overflow=jnp.zeros((), bool),
        level=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return (s["n_pairs"] > 0) & (s["level"] < MAX_LEVELS)

    def body(s):
        pr, pc, pt = s["pair_ray"], s["pair_code"], s["pair_tmin"]
        tkey = s["tkey"]
        t_best = lax.bitcast_convert_type(tkey, jnp.float32)
        active = (slot < s["n_pairs"]) & (pt < t_best[pr])
        if any_hit:
            # a ray is settled once anything closer than its t_max was found
            active = active & ~(tkey < tkey0)[pr]
        is_node = active & (pc >= 0)
        is_leaf = active & (pc < 0)

        rdat = ray_data[pr]  # (P, 16)
        o = rdat[:, 0:3]
        d = rdat[:, 3:6]
        rd = rdat[:, 6:9]
        tb = t_best[pr]

        # ---- expand node pairs ------------------------------------------
        nrow = jnp.where(is_node, pc, 0)
        dist = _slab8(o, rd, tb, get_bounds(nrow))  # (P, 8)
        kids = bvh8.child[nrow]
        valid = (dist < BVH_FAR) & (kids != EMPTY_SLOT) & is_node[:, None]

        # ---- leaf pairs: 4-wide Möller–Trumbore -------------------------
        lrow = jnp.where(is_leaf, -pc - 1, 0)
        geom = leaf_geom[lrow]  # one wide gather
        if tri_test == "baldwin":
            hit, th, uu, vv = leaf_intersect(
                tri_test, o[:, None, :], d[:, None, :], rd[:, None, :],
                None, None, None, tb[:, None],
                bw_rows=geom[:, 0:48].reshape(-1, 4, 12))
        elif tri_test == "watertight":
            tri4 = geom[:, 0:36].reshape(-1, 4, 3, 3)
            hit, th, uu, vv = leaf_intersect(
                tri_test, o[:, None, :], d[:, None, :], rd[:, None, :],
                tri4[:, :, 0], tri4[:, :, 1], tri4[:, :, 2], tb[:, None])
        else:
            gv0 = geom[:, 0:12].reshape(-1, 4, 3)
            ge1 = geom[:, 12:24].reshape(-1, 4, 3)
            ge2 = geom[:, 24:36].reshape(-1, 4, 3)
            hit, th, uu, vv = moller_trumbore(
                o[:, None, :], d[:, None, :], gv0, ge1, ge2, tb[:, None])
        if omap is not None:
            S = omap.shape[-1]
            iu = jnp.clip((uu * S).astype(jnp.int32), 0, S - 1)
            iv = jnp.clip((vv * S).astype(jnp.int32), 0, S - 1)
            lanes4 = jnp.arange(4, dtype=jnp.int32)
            hit = hit & omap[lrow[:, None], lanes4[None, :], iu, iv]
        th = jnp.where(hit & is_leaf[:, None], th, BVH_FAR)
        lbest = jnp.argmin(th, axis=1)
        cand_t = jnp.min(th, axis=1)  # (P,)
        has_cand = cand_t < BVH_FAR

        # fold candidates into per-ray best: two commutative scatter-mins
        ckey = jnp.where(has_cand, _t_key(cand_t), _I32MAX)
        ray_ix = jnp.where(has_cand, pr, 0)
        new_tkey = tkey.at[ray_ix].min(ckey)
        is_winner = has_cand & (ckey == new_tkey[pr])
        packed = jnp.where(
            is_winner, lrow * 4 + lbest.astype(jnp.int32), _I32MAX
        )
        # reset stale winners for improved rays, then take the new one
        improved = new_tkey < tkey
        win = jnp.where(improved, _I32MAX, s["win"])
        win = win.at[ray_ix].min(packed)

        # ---- compact next-level pairs -----------------------------------
        t_best2 = lax.bitcast_convert_type(new_tkey, jnp.float32)
        valid = valid & (dist < t_best2[pr][:, None])
        counts = valid.sum(axis=1).astype(jnp.int32)
        offs = jnp.cumsum(counts) - counts  # exclusive
        total = jnp.minimum(offs[-1] + counts[-1], P)

        # src map: for output slot j, which pair produced it?
        # scatter-max pair index at its segment head, then cummax fills.
        head = jnp.full(P, -1, jnp.int32)
        head_pos = jnp.where(counts > 0, jnp.minimum(offs, P - 1), P - 1)
        head_val = jnp.where(counts > 0, slot, -1)
        head = head.at[head_pos].max(head_val)
        src = lax.associative_scan(jnp.maximum, head)
        src = jnp.maximum(src, 0)

        lane_rank = slot - offs[src]  # rank within the source pair
        # rank → lane: select the lane whose exclusive-rank matches
        rank = jnp.cumsum(valid, axis=1) - valid  # (P, 8)
        lane_lookup = _rank_to_lane(rank, valid)

        lane = lane_lookup.reshape(-1)[src * 8 + (lane_rank % 8)]
        flat_idx = src * 8 + lane
        in_range = slot < total
        np_ray = jnp.where(in_range, pr[src], R - 1)
        np_code = jnp.where(in_range, kids.reshape(-1)[flat_idx], 0)
        np_tmin = jnp.where(in_range, dist.reshape(-1)[flat_idx], BVH_FAR)

        overflow = s["overflow"] | (offs[-1] + counts[-1] > P)
        return dict(
            pair_ray=np_ray, pair_code=np_code, pair_tmin=np_tmin,
            n_pairs=total,
            tkey=new_tkey, win=win,
            overflow=overflow, level=s["level"] + 1,
        )

    s = lax.while_loop(cond, body, state)
    # the loop stopping at MAX_LEVELS with pairs still pending is silent
    # truncation (deep/unbalanced trees) — surface it as overflow
    truncated = (s["n_pairs"] > 0) & (s["level"] >= MAX_LEVELS)
    s["overflow"] = s["overflow"] | truncated

    # ---- recover the full hit record from (tkey, win) -------------------
    win = s["win"]
    ok = win != _I32MAX
    wl = jnp.where(ok, win >> 2, 0)  # leaf row
    wk = jnp.where(ok, win & 3, 0)  # lane
    prim = jnp.where(ok, bvh8.leaf_prim[wl, wk], -1)
    # one final leaf test against the winning triangle for u/v (same
    # tri_test as the traversal so barycentric conventions agree)
    wtri = bvh8.leaf_tris[wl, wk]                     # (R, 3, 3) raw verts
    _, tt, uu, vv = leaf_intersect(
        tri_test, o_all, d_all, rd_all,
        wtri[:, 0], wtri[:, 1], wtri[:, 2],
        jnp.full(R, BVH_FAR, jnp.float32),
        bw_rows=None if bw_t is None else bw_t[wl, wk],
    )
    t_fin = lax.bitcast_convert_type(s["tkey"], jnp.float32)
    hits = Hits(
        t=jnp.where(ok, t_fin, BVH_FAR),
        u=jnp.where(ok, uu, 0.0),
        v=jnp.where(ok, vv, 0.0),
        prim=prim,
        inst=jnp.full(R, -1, jnp.int32),
    )
    if any_hit:
        return hits, s["tkey"] < tkey0, s["overflow"]
    return hits, s["overflow"]


def _rank_to_lane(rank, valid):
    """(P, 8) exclusive ranks + validity → lane_lookup[p, r] = lane index of
    the r-th valid lane — a one-hot reduction (3 ops) instead of an 8-step
    select chain (~24 ops; per-op dispatch cost dominates this loop)."""
    lanes8 = jnp.arange(8, dtype=jnp.int32)
    onehot = (rank[:, :, None] == lanes8[None, None, :]) \
        & valid[:, :, None]                               # (P, 8k, 8r)
    return jnp.sum(onehot * lanes8[:, None], axis=1, dtype=jnp.int32)


def is_occluded_wavefront(bvh8: BVH8, rays: Rays, t_max, omap=None):
    _, occ, _ = intersect_wavefront(bvh8, rays, t_max, any_hit=True,
                                    omap=omap)
    return occ
