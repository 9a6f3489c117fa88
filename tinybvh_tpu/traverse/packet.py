"""Packet traversal: per-tile frustum culling + dense leaf testing.

Counterpart of Intersect256Rays (tiny_bvh.h:3528-3696): the reference walks
the BVH once per 256-ray packet, culling nodes against the packet's corner
frustum and tracking the first/last active ray. The TPU formulation splits
the same idea into two fully-dense phases:

  1. frustum BFS — a (tile, node) frontier walks the BVH8 testing node
     AABBs against each tile's 4 corner planes (one test per TILE, not per
     ray), collecting up to K leaf rows per tile (scatter-min writes);
  2. dense leaf resolve — every ray tests its tile's K leaves with a
     chunked (T, 256, k, 4) Möller–Trumbore; no per-ray gathers at all —
     the compute is pure VPU tensor math, the ideal TPU shape.

Assumes packets of 256 coherent rays in 16×16 scan order sharing one
origin (the reference makes the same assumption). Tiles whose leaf list
overflows K report in the returned mask — retrace those with
intersect_wavefront.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from tinybvh_tpu.core.rays import Hits, Rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.layouts.mbvh import BVH8, EMPTY_SLOT

TILE = 256
_I32MAX = jnp.int32(2**31 - 1)
MAX_LEVELS = 32


def _tile_planes(o, d):
    """Per-tile frustum: 4 conservative planes bounding ALL tile directions.

    ≙ the corner-plane construction at tiny_bvh.h:3545-3560, but instead of
    assuming a grid-ordered pinhole tile (grab the 4 corner rays), bound the
    bundle in gnomonic coordinates around the mean direction — valid for ANY
    shared-origin bundle, e.g. shadow rays fanning out from a point light.

    o: (T, 3) shared origins (unused; planes pass through the origin);
    d: (T, 256, 3), need not be normalized. Returns (T, 4, 3) inward
    normals n with dot(d_i, n) >= 0 for every ray of the tile. Tiles whose
    bundle spans >= 90 degrees from the mean get all-pass planes (never
    cull) — still correct, just unculled.
    """
    m = d.mean(axis=1)
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-20)
    ref = jnp.where((jnp.abs(m[:, 1]) < 0.9)[:, None],
                    jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    u = jnp.cross(ref, m)
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-20)
    v = jnp.cross(m, u)
    # explicit multiply-sums: bf16-default dot_general would loosen the
    # gnomonic bounds the plane validity proof rests on
    dm = (d * m[:, None, :]).sum(-1)  # (T, 256)
    da = (d * u[:, None, :]).sum(-1)
    db = (d * v[:, None, :]).sum(-1)
    wide = (dm <= 1e-9).any(axis=1)  # bundle not within 90° of mean
    safe = jnp.where(dm <= 1e-9, 1.0, dm)
    a = da / safe
    b = db / safe
    amin = a.min(axis=1)[:, None]
    amax = a.max(axis=1)[:, None]
    bmin = b.min(axis=1)[:, None]
    bmax = b.max(axis=1)[:, None]
    # dot(d, u - amin·m) = dm·(a - amin) >= 0, etc.
    n = jnp.stack([u - amin * m, amax * m - u,
                   v - bmin * m, bmax * m - v], axis=1)  # (T, 4, 3)
    return jnp.where(wide[:, None, None], 0.0, n)


def _aabb_outside(planes, o, lo, hi):
    """(P, 4, 3) planes, (P, 3) origins, boxes (P, 8, 3)+(P, 8, 3) →
    (P, 8) True where the box is fully outside any plane."""
    # farthest corner along each normal
    n = planes[:, None, :, :]  # (P, 1, 4, 3)
    corner = jnp.where(n > 0, hi[:, :, None, :], lo[:, :, None, :])
    dist = jnp.sum(n * (corner - o[:, None, None, :]), axis=-1)  # (P, 8, 4)
    return (dist < 0).any(axis=-1)


@partial(jax.jit, static_argnames=("max_leaves", "pair_cap_factor"))
def collect_tile_leaves(bvh8: BVH8, tile_o, tile_d, max_leaves: int = 128,
                        pair_cap_factor: int = 64, tile_ohi=None):
    """Phase 1: per-tile frustum BFS → (T, K) leaf rows (-pad I32MAX),
    plus an overflow mask.

    tile_o is each tile's origin — or, with tile_ohi given, the per-tile
    origin-AABB low corner: culling then uses the conservative
    min over the box of n·o (= relu(n)·olo + min(n,0)·ohi), which makes
    packets valid for sorted INCOHERENT bundles, not just pinhole tiles."""
    T = tile_o.shape[0]
    tile_olo = tile_o
    if tile_ohi is None:
        tile_ohi = tile_o
    planes = _tile_planes(tile_o, tile_d)
    C = max(T * pair_cap_factor, 8192)
    slot = jnp.arange(C, dtype=jnp.int32)

    state = dict(
        p_tile=jnp.where(slot < T, slot, T - 1),
        p_node=jnp.zeros(C, jnp.int32),
        n_pairs=jnp.asarray(T, jnp.int32),
        leaves=jnp.full((T * max_leaves,), _I32MAX, jnp.int32),
        n_leaves=jnp.zeros(T, jnp.int32),
        overflow=jnp.zeros(T, bool),
        level=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return (s["n_pairs"] > 0) & (s["level"] < MAX_LEVELS)

    def body(s):
        pt, pn = s["p_tile"], s["p_node"]
        active = slot < s["n_pairs"]
        nrow = jnp.where(active, pn, 0)
        b = bvh8.bounds[nrow].reshape(-1, 6, 8)
        kids = bvh8.child[nrow]
        # transpose-free frustum test, all 4 planes at once. The farthest
        # corner along n is hi where n>0 else lo, so
        #   n·corner = relu(n)·hi + (-relu(-n))·lo
        # which turns the per-component select loop into two batched
        # einsums — fewer, larger ops win here (per-op dispatch tax
        # dominates at this frontier size)
        pl_t = planes[pt]           # (C, 4, 3)
        pl_pos = jnp.maximum(pl_t, 0.0)
        pl_neg = jnp.minimum(pl_t, 0.0)
        # conservative over the tile's origin box: min_o n·o. Explicit
        # multiply-sums (K=3): einsum lowers to dot_general whose TPU f32
        # default is bf16 multiplies — unacceptable for cull tests
        o_min = ((pl_pos * tile_olo[pt][:, None, :]).sum(-1)
                 + (pl_neg * tile_ohi[pt][:, None, :]).sum(-1))
        dist = (
            (pl_pos[:, :, :, None] * b[:, None, 3:6]).sum(2)
            + (pl_neg[:, :, :, None] * b[:, None, 0:3]).sum(2)
            - o_min[:, :, None]
        )  # (C, 4, 8)
        culled = (dist < 0).any(axis=1)
        valid = active[:, None] & ~culled & (kids != EMPTY_SLOT)
        is_node_child = valid & (kids >= 0)
        is_leaf_child = valid & (kids < 0)

        # append leaf children to per-tile lists (unique-target scatter-min)
        lrank = jnp.cumsum(is_leaf_child, axis=1) - is_leaf_child
        # per-tile offset: pairs are tile-sorted, so per-tile leaf rank =
        # global leaf rank − first global rank of that tile
        flat_leaf = is_leaf_child.reshape(-1)
        grank = (jnp.cumsum(flat_leaf) - flat_leaf).reshape(-1, 8)
        pair_first = jnp.min(
            jnp.where(is_leaf_child, grank, _I32MAX), axis=1
        )
        tile_first = jnp.full(T, _I32MAX, jnp.int32).at[pt].min(pair_first)
        in_tile_rank = grank - tile_first[pt][:, None]
        pos = s["n_leaves"][pt][:, None] + in_tile_rank
        ok = is_leaf_child & (pos < max_leaves) & (pos >= 0)
        flat_idx = jnp.where(
            ok, pt[:, None] * max_leaves + pos, T * max_leaves - 1
        )
        leaf_row = jnp.where(ok, -kids - 1, _I32MAX)
        leaves = s["leaves"].at[flat_idx.reshape(-1)].min(leaf_row.reshape(-1))
        add = jnp.zeros(T, jnp.int32).at[pt].add(
            is_leaf_child.sum(axis=1).astype(jnp.int32)
        )
        n_leaves = s["n_leaves"] + add
        overflow = s["overflow"] | (n_leaves > max_leaves)

        # compact node children into the next frontier (order-preserving)
        counts = is_node_child.sum(axis=1).astype(jnp.int32)
        offs = jnp.cumsum(counts) - counts
        want = offs[-1] + counts[-1]
        total = jnp.minimum(want, C)
        # pair-frontier truncation loses nodes for ALL later tiles: flag
        # every tile so callers retrace (raise pair_cap_factor to avoid)
        overflow = overflow | (want > C)
        head = jnp.full(C, -1, jnp.int32)
        head_pos = jnp.where(counts > 0, jnp.minimum(offs, C - 1), C - 1)
        head = head.at[head_pos].max(jnp.where(counts > 0, slot, -1))
        src = jnp.maximum(lax.associative_scan(jnp.maximum, head), 0)
        lane_rank = slot - offs[src]
        nrank = jnp.cumsum(is_node_child, axis=1) - is_node_child
        lanes8 = jnp.arange(8, dtype=jnp.int32)
        # lookup[c, r] = lane k with (nrank[c,k]==r & is_node_child[c,k]):
        # one-hot reduction instead of an 8-step select chain (3 ops vs ~24)
        onehot = (nrank[:, :, None] == lanes8[None, None, :]) \
            & is_node_child[:, :, None]                       # (C, 8k, 8r)
        lookup = jnp.sum(onehot * lanes8[:, None], axis=1, dtype=jnp.int32)
        lane = lookup.reshape(-1)[src * 8 + (lane_rank % 8)]
        in_range = slot < total
        np_tile = jnp.where(in_range, pt[src], T - 1)
        np_node = jnp.where(in_range,
                            kids.reshape(-1)[src * 8 + lane], 0)
        return dict(
            p_tile=np_tile, p_node=np_node, n_pairs=total,
            leaves=leaves, n_leaves=n_leaves, overflow=overflow,
            level=s["level"] + 1,
        )

    s = lax.while_loop(cond, body, state)
    return s["leaves"].reshape(T, max_leaves), s["overflow"]


@partial(jax.jit, static_argnames=("max_leaves", "pair_cap_factor"))
def collect_tile_leaves_flat(bvh8: BVH8, tile_o, tile_d,
                             max_leaves: int = 128,
                             pair_cap_factor: int = 64):
    """Phase 1 variant: instead of maintaining per-tile leaf lists inside
    the BFS loop (3 scatters + segmented ranking per level), append
    (tile, leaf) pairs to ONE flat buffer with a running cursor (1 scatter
    per level), then resolve per-tile lists with a single post-loop sort.

    MEASURED SLOWER than collect_tile_leaves on the bunny bench (2.46 vs
    3.41 MRays/s end-to-end): scatter cost scales with the SIZE of the
    scattered operand, and the two per-level scatters into the (T*K,)
    flat buffer cost more than the three small (T,)-target scatters they
    replaced, plus the O(T*K) sort. Kept as a measured data point —
    intersect_packets defaults to the classic path."""
    T = tile_o.shape[0]
    planes = _tile_planes(tile_o, tile_d)
    C = max(T * pair_cap_factor, 8192)
    P = T * max_leaves  # flat pair budget
    slot = jnp.arange(C, dtype=jnp.int32)

    state = dict(
        p_tile=jnp.where(slot < T, slot, T - 1),
        p_node=jnp.zeros(C, jnp.int32),
        n_pairs=jnp.asarray(T, jnp.int32),
        pr_tile=jnp.full(P, _I32MAX, jnp.int32),
        pr_leaf=jnp.full(P, _I32MAX, jnp.int32),
        cursor=jnp.zeros((), jnp.int32),
        all_overflow=jnp.zeros((), bool),
        level=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return (s["n_pairs"] > 0) & (s["level"] < MAX_LEVELS)

    def body(s):
        pt, pn = s["p_tile"], s["p_node"]
        active = slot < s["n_pairs"]
        nrow = jnp.where(active, pn, 0)
        b = bvh8.bounds[nrow].reshape(-1, 6, 8)
        kids = bvh8.child[nrow]
        pl_t = planes[pt]
        o_t = tile_o[pt]
        # explicit multiply-sums (K=3): einsum lowers to dot_general whose
        # TPU f32 default is bf16 multiplies — unacceptable for cull tests
        dist = (
            (jnp.maximum(pl_t, 0.0)[:, :, :, None] * b[:, None, 3:6]).sum(2)
            + (jnp.minimum(pl_t, 0.0)[:, :, :, None] * b[:, None, 0:3]).sum(2)
            - (pl_t * o_t[:, None, :]).sum(-1)[:, :, None]
        )
        culled = (dist < 0).any(axis=1)
        valid = active[:, None] & ~culled & (kids != EMPTY_SLOT)
        is_node_child = valid & (kids >= 0)
        is_leaf_child = valid & (kids < 0)

        # append leaf pairs to the flat buffer (single scatter)
        flat_leaf = is_leaf_child.reshape(-1)
        rank = jnp.cumsum(flat_leaf) - flat_leaf
        pos = s["cursor"] + rank
        ok = flat_leaf & (pos < P)
        tgt = jnp.where(ok, pos, P - 1).astype(jnp.int32)
        enc_t = jnp.where(ok, jnp.repeat(pt, 8), _I32MAX)
        enc_l = jnp.where(ok, (-kids - 1).reshape(-1), _I32MAX)
        pr_tile = s["pr_tile"].at[tgt].min(enc_t)
        pr_leaf = s["pr_leaf"].at[tgt].min(enc_l)
        n_added = flat_leaf.sum().astype(jnp.int32)
        cursor = s["cursor"] + n_added
        all_overflow = s["all_overflow"] | (cursor > P)

        # compact node children into the next frontier (order-preserving)
        counts = is_node_child.sum(axis=1).astype(jnp.int32)
        offs = jnp.cumsum(counts) - counts
        want = offs[-1] + counts[-1]
        total = jnp.minimum(want, C)
        all_overflow = all_overflow | (want > C)
        head = jnp.full(C, -1, jnp.int32)
        head_pos = jnp.where(counts > 0, jnp.minimum(offs, C - 1), C - 1)
        head = head.at[head_pos].max(jnp.where(counts > 0, slot, -1))
        src = jnp.maximum(lax.associative_scan(jnp.maximum, head), 0)
        lane_rank = slot - offs[src]
        nrank = jnp.cumsum(is_node_child, axis=1) - is_node_child
        lanes8 = jnp.arange(8, dtype=jnp.int32)
        onehot = (nrank[:, :, None] == lanes8[None, None, :]) \
            & is_node_child[:, :, None]
        lookup = jnp.sum(onehot * lanes8[:, None], axis=1, dtype=jnp.int32)
        lane = lookup.reshape(-1)[src * 8 + (lane_rank % 8)]
        in_range = slot < total
        np_tile = jnp.where(in_range, pt[src], T - 1)
        np_node = jnp.where(in_range,
                            kids.reshape(-1)[src * 8 + lane], 0)
        return dict(
            p_tile=np_tile, p_node=np_node, n_pairs=total,
            pr_tile=pr_tile, pr_leaf=pr_leaf, cursor=cursor,
            all_overflow=all_overflow, level=s["level"] + 1,
        )

    s = lax.while_loop(cond, body, state)

    # resolve per-tile lists: one stable sort by tile, then rank-in-tile
    tile_s, leaf_s = lax.sort((s["pr_tile"], s["pr_leaf"]),
                              num_keys=1, is_stable=True)
    valid = tile_s != _I32MAX
    pidx = jnp.arange(P, dtype=jnp.int32)
    tile_c = jnp.clip(tile_s, 0, T - 1)
    first = jnp.full(T, _I32MAX, jnp.int32).at[tile_c].min(
        jnp.where(valid, pidx, _I32MAX))
    in_rank = pidx - first[tile_c]
    ok = valid & (in_rank < max_leaves)
    tgt = jnp.where(ok, tile_c * max_leaves + in_rank, T * max_leaves - 1)
    leaves = jnp.full((T * max_leaves,), _I32MAX, jnp.int32).at[tgt].min(
        jnp.where(ok, leaf_s, _I32MAX))
    n_leaves = jnp.zeros(T, jnp.int32).at[tile_c].add(
        valid.astype(jnp.int32))
    overflow = (n_leaves > max_leaves) | s["all_overflow"]
    return leaves.reshape(T, max_leaves), overflow


@partial(jax.jit, static_argnames=("max_leaves", "chunk", "use_pallas",
                                   "interpret", "pair_cap_factor",
                                   "phase1_pallas", "phase1_flat"))
def intersect_packets(bvh8: BVH8, rays: Rays, max_leaves: int = 128,
                      chunk: int = 16, use_pallas: bool = False,
                      interpret: bool = False, pair_cap_factor: int = 32,
                      phase1_pallas: bool = False,
                      phase1_flat: bool = False):
    """Full packet trace. Rays must be (T·256,) in 16×16 tile scan order
    with a shared origin per tile. Returns (Hits, overflow_tile_mask).

    use_pallas: run phase 2 as the VMEM-resident Pallas kernel
    (traverse/pallas_leaf.py) instead of the XLA chunked loop; interpret
    runs that kernel in interpreter mode (for CPU tests)."""
    R = rays.o.shape[0]
    T = R // TILE
    o = rays.o.reshape(T, TILE, 3)
    d = rays.d.reshape(T, TILE, 3)
    tile_o = o[:, 0]

    if phase1_pallas:
        # phase 1 as ONE Pallas op (experimental: the serial per-tile walk
        # currently loses to the XLA frontier — see pallas_frustum.py)
        from tinybvh_tpu.traverse.pallas_frustum import (
            collect_tile_leaves_pallas,
        )

        planes = _tile_planes(tile_o, d)
        ndoto = (planes * tile_o[:, None, :]).sum(-1).reshape(T, 1, 4)
        leaves, counts = collect_tile_leaves_pallas(
            bvh8.bounds.reshape(-1, 6, 8), bvh8.child, planes, ndoto,
            max_leaves, interpret=interpret,
        )
        overflow = counts < 0
    elif phase1_flat:
        leaves, overflow = collect_tile_leaves_flat(
            bvh8, tile_o, d, max_leaves, pair_cap_factor)
    else:
        leaves, overflow = collect_tile_leaves(
            bvh8, o.min(axis=1), d, max_leaves, pair_cap_factor,
            tile_ohi=o.max(axis=1))

    # phase 2: dense chunked leaf resolve — no per-ray gathers
    lt = bvh8.leaf_tris  # (L, 4, 3, 3)
    lp = bvh8.leaf_prim
    K = max_leaves

    if use_pallas:
        from tinybvh_tpu.traverse.pallas_leaf import (
            leaf_resolve_v2, pack_tri_geom,
        )

        # per-triangle 12-float row gather. (Measured: gathering (L, 48)
        # leaf rows + "contiguous" reshape to (T, K·4, 12) is SLOWER here —
        # with 128-lane physical padding that reshape is a real relayout
        # of the padded array, costing more than the narrower gather saves.)
        tri_geom = pack_tri_geom(bvh8)  # (4L, 12)
        rows_t = jnp.clip(leaves, 0, lt.shape[0] - 1)
        live_t = leaves != _I32MAX
        lanes4 = jnp.arange(4, dtype=jnp.int32)
        tri_idx = rows_t[:, :, None] * 4 + lanes4[None, None, :]
        geom_t = jnp.where(
            live_t[:, :, None, None], tri_geom[tri_idx], 0.0
        ).reshape(T, -1, 12)  # (T, K·4, 12); dead rows zeroed → never hit
        o_t = jnp.transpose(o, (0, 2, 1))  # (T, 3, 256)
        d_t = jnp.transpose(d, (0, 2, 1))
        best_t, best_li = leaf_resolve_v2(o_t, d_t, geom_t,
                                          interpret=interpret)
        # resolve tri list position → leaf row + lane outside the kernel
        # (flat 1D gather: minor-dim take_along_axis is pathologically slow)
        li = best_li >> 2
        lane = best_li & 3
        K = rows_t.shape[1]
        trow = jnp.arange(T, dtype=jnp.int32)[:, None]
        row = rows_t.reshape(-1)[trow * K + li]
        best_pk = row * 4 + lane
        return _finish(bvh8, rays, best_t, best_pk, overflow, R, T)

    def step(carry, kchunk):
        best_t, best_pk = carry
        rows = jnp.clip(kchunk, 0, lt.shape[0] - 1)  # (T, chunk)
        live = kchunk != _I32MAX
        tri = lt[rows]  # (T, chunk, 4, 3, 3)
        v0 = tri[:, :, :, 0]
        e1 = tri[:, :, :, 1] - v0
        e2 = tri[:, :, :, 2] - v0
        # (T, 256, chunk, 4) Möller–Trumbore
        dd = d[:, :, None, None, :]
        oo = o[:, :, None, None, :]
        h = jnp.cross(dd, e2[:, None])
        det = jnp.sum(e1[:, None] * h, axis=-1)
        okd = jnp.abs(det) > 1e-9
        inv = 1.0 / jnp.where(okd, det, 1.0)
        sv = oo - v0[:, None]
        u = jnp.sum(sv * h, axis=-1) * inv
        q = jnp.cross(sv, e1[:, None])
        v = jnp.sum(dd * q, axis=-1) * inv
        tt = jnp.sum(e2[:, None] * q, axis=-1) * inv
        hit = (okd & (u >= 0) & (v >= 0) & (u + v <= 1)
               & (tt > 0) & live[:, None, :, None])
        tt = jnp.where(hit, tt, BVH_FAR)
        # reduce over (chunk, 4)
        flat = tt.reshape(T, TILE, -1)
        am = jnp.argmin(flat, axis=-1)
        m = jnp.min(flat, axis=-1)
        # packed (leaf_row, lane)
        ch_i = am // 4
        lane = am % 4
        trow = jnp.arange(T, dtype=jnp.int32)[:, None]
        rowsel = rows.reshape(-1)[trow * rows.shape[1] + ch_i.reshape(T, -1)
                                  ].reshape(T, TILE)
        pk = rowsel * 4 + lane
        better = m < best_t
        return (jnp.where(better, m, best_t),
                jnp.where(better, pk, best_pk)), None

    n_chunks = K // chunk
    kchunks = leaves.reshape(T, n_chunks, chunk).transpose(1, 0, 2)
    (best_t, best_pk), _ = lax.scan(
        step,
        (jnp.full((T, TILE), BVH_FAR), jnp.zeros((T, TILE), jnp.int32)),
        kchunks,
    )
    return _finish(bvh8, rays, best_t, best_pk, overflow, R, T)


def _finish(bvh8, rays, best_t, best_pk, overflow, R, T):
    lt = bvh8.leaf_tris
    lp = bvh8.leaf_prim
    ok = best_t < BVH_FAR
    wl = jnp.where(ok, best_pk >> 2, 0)
    wk = jnp.where(ok, best_pk & 3, 0)
    prim = jnp.where(ok, lp[wl, wk], -1).reshape(-1)
    # recover u/v by re-intersecting the winning triangle
    from tinybvh_tpu.core.intersect import moller_trumbore, tri_edges

    v0t, e1t, e2t = tri_edges(lt)
    _, _, uu, vv = moller_trumbore(
        rays.o, rays.d, v0t[wl.reshape(-1), wk.reshape(-1)],
        e1t[wl.reshape(-1), wk.reshape(-1)],
        e2t[wl.reshape(-1), wk.reshape(-1)],
        jnp.full(R, BVH_FAR),
    )
    okf = ok.reshape(-1)
    hits = Hits(
        t=jnp.where(okf, best_t.reshape(-1), BVH_FAR),
        u=jnp.where(okf, uu, 0.0),
        v=jnp.where(okf, vv, 0.0),
        prim=prim,
        inst=jnp.full(R, -1, jnp.int32),
    )
    return hits, overflow


@partial(jax.jit, static_argnames=("max_leaves", "chunk", "use_pallas",
                                   "interpret", "pair_cap_factor"))
def is_occluded_packets(bvh8: BVH8, origin, points, cutoff: float = 1.0 - 1e-3,
                        max_leaves: int = 128, chunk: int = 16,
                        use_pallas: bool = False, interpret: bool = False,
                        pair_cap_factor: int = 32):
    """Any-hit occlusion for R segments origin→points sharing ONE origin
    (e.g. shadow rays to a point light, traced light→surface so every tile
    is a coherent shared-origin packet — the reverse of the reference
    tracing surface→light one ray at a time, IsOccluded tiny_bvh.h:3382).

    points must be in 16x16-tile order (as produced by hit points of
    packet-ordered primary rays). Directions are left unnormalized so the
    hit parameter is in [0, 1] along the segment; `cutoff` < 1 excludes
    the surface itself. Returns ((R,) bool occluded, (T,) overflow)."""
    points = jnp.asarray(points, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)
    d = points - origin[None, :]
    o = jnp.broadcast_to(origin, d.shape)
    from tinybvh_tpu.core.rays import make_rays

    rays = make_rays(o, d)
    hits, overflow = intersect_packets(
        bvh8, rays, max_leaves=max_leaves, chunk=chunk,
        use_pallas=use_pallas, interpret=interpret,
        pair_cap_factor=pair_cap_factor)
    return (hits.prim >= 0) & (hits.t < cutoff), overflow


def _spread10(x):
    """Spread 10 bits to every 3rd position (morton helper)."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def sort_rays_coherent(o, d, scene_lo, scene_hi):
    """Coherence sort for incoherent rays (≙ the tiling of the reference's
    diffuse batches, tiny_bvh_speedtest.cpp:513-551, done as a sort):
    key = direction octant (3 bits) | origin morton (27 bits). Returns
    (order, inverse) permutations; consecutive 256-ray groups of `order`
    form packet tiles with one-octant direction spread and compact
    origin boxes."""
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    R = o.shape[0]
    ext = jnp.maximum(jnp.asarray(scene_hi) - jnp.asarray(scene_lo), 1e-20)
    q = jnp.clip(((o - scene_lo) / ext * 1024.0).astype(jnp.int32), 0, 1023)
    morton = (_spread10(q[:, 0]) | (_spread10(q[:, 1]) << 1)
              | (_spread10(q[:, 2]) << 2))
    octant = ((d[:, 0] < 0).astype(jnp.int32) * 4
              + (d[:, 1] < 0).astype(jnp.int32) * 2
              + (d[:, 2] < 0).astype(jnp.int32))
    # octant-major, then ORIGIN morton: for bounce rays off a compact
    # surface, origin locality dominates frustum tightness — the old
    # 2-bit gnomonic sub-cells ABOVE the morton bits scattered nearby
    # origins into different tiles (r5 sort probe, bunny diffuse: mean
    # cull survivors 606 -> 378 segs/tile, exact trace 2.56 -> 3.99
    # MRays/s after the demotion; finer direction keys were all worse)
    key = (octant << 27) | (morton >> 3)
    iota = jnp.arange(R, dtype=jnp.int32)
    _, order = lax.sort((key, iota), num_keys=1)
    # inverse permutation by scatter — a second full R-key sort measured
    # ~half the sort cost of the call
    inverse = jnp.zeros(R, jnp.int32).at[order].set(iota)
    return order, inverse


@partial(jax.jit, static_argnames=("max_leaves", "chunk", "use_pallas",
                                   "interpret", "pair_cap_factor"))
def intersect_packets_sorted(bvh8: BVH8, rays: Rays, scene_lo, scene_hi,
                             max_leaves: int = 128, chunk: int = 16,
                             use_pallas: bool = False,
                             interpret: bool = False,
                             pair_cap_factor: int = 32):
    """Packet tracing for INCOHERENT rays (diffuse bounces, random batches):
    sort rays into coherent tiles (direction octant + origin morton), trace
    with origin-AABB frustum culling, scatter hits back to input order.
    Returns (Hits in input order, per-ray overflow mask)."""
    R = rays.o.shape[0]
    order, inverse = sort_rays_coherent(rays.o, rays.d, scene_lo, scene_hi)
    rs = Rays(o=rays.o[order], d=rays.d[order], rd=rays.rd[order],
              mask=rays.mask[order])
    hits, overflow = intersect_packets(
        bvh8, rs, max_leaves=max_leaves, chunk=chunk, use_pallas=use_pallas,
        interpret=interpret, pair_cap_factor=pair_cap_factor)
    ov_ray = jnp.repeat(overflow, TILE)[inverse]
    return Hits(t=hits.t[inverse], u=hits.u[inverse], v=hits.v[inverse],
                prim=hits.prim[inverse], inst=hits.inst[inverse]), ov_ray
