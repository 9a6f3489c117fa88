"""Data-parallel binned-SAH builder — fully on-device, jittable.

The device-resident counterpart of BVH::Build (tiny_bvh.h:2261-2461),
re-architected for the TPU execution model (SURVEY.md §7 step 3): instead
of recursive subdivision with a task stack and thread forks
(tiny_bvh.h:2433-2440), EVERY level of the tree is built at once:

  per level:  segmented 3-axis×8-bin reduction over ALL fragments
              → vectorized SAH sweep over ALL open nodes
              → partition via per-fragment bin comparison
              → children allocated as one contiguous id range

TPU-specific choices (see benchmarks/op_cost_probe.py):
  * all segmented reductions are commutative scatters (segment_sum/min/max)
    — the only scatter flavor that parallelizes on TPU;
  * per-level node writes target CONTIGUOUS id ranges (BFS allocation), so
    they are dynamic_update_slice block writes, never point scatters;
  * static shapes throughout: fragment arrays stay (N,), the per-level slot
    domain is capped at N (a level can never hold more open nodes than
    fragments), node pool is padded to 4N+4.

Topology matches builders.binned (the host reference) up to tie-breaking;
degenerate nodes whose centroids all coincide become leaves (possibly
exceeding max_leaf — as in the reference, which also cannot split them).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from tinybvh_tpu.core.vecmath import BVH_FAR, C_INT, C_TRAV
from tinybvh_tpu.layouts.bvh2 import BVH2

BINS = 8
MAX_LEVELS = 64


def _ha(mn, mx):
    e = jnp.maximum(mx - mn, 0.0)
    return e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] + e[..., 2] * e[..., 0]


@partial(jax.jit, static_argnames=("max_leaf",))
def build_binned_device(tris, max_leaf: int = 4) -> BVH2:
    """Build a BVH2 over (N, 3, 3) triangles entirely on device."""
    tris = jnp.asarray(tris, jnp.float32)
    N = tris.shape[0]
    fmin = jnp.min(tris, axis=1)
    fmax = jnp.max(tris, axis=1)
    cent = (fmin + fmax) * 0.5
    M = 4 * N + 4

    node_min = jnp.full((M, 3), BVH_FAR, jnp.float32)
    node_max = jnp.full((M, 3), -BVH_FAR, jnp.float32)
    left_first = jnp.zeros(M, jnp.int32)
    count = jnp.zeros(M, jnp.int32)
    node_min = node_min.at[0].set(fmin.min(axis=0))
    node_max = node_max.at[0].set(fmax.max(axis=0))

    state = dict(
        node_min=node_min, node_max=node_max,
        left_first=left_first, count=count,
        frag_node=jnp.zeros(N, jnp.int32),
        frag_active=jnp.ones(N, bool),
        level_start=jnp.asarray(0, jnp.int32),
        level_end=jnp.asarray(2, jnp.int32),  # slot 1 reserved
        level=jnp.asarray(0, jnp.int32),
    )

    iota_n = jnp.arange(N, dtype=jnp.int32)

    def cond(s):
        return jnp.any(s["frag_active"]) & (s["level"] < MAX_LEVELS)

    def body(s):
        act = s["frag_active"]
        ls, le = s["level_start"], s["level_end"]
        slot = jnp.where(act, s["frag_node"] - ls, N - 1)  # dead → dummy

        # ---- per-slot centroid bounds ------------------------------------
        big = jnp.where(act[:, None], cent, BVH_FAR)
        small = jnp.where(act[:, None], cent, -BVH_FAR)
        cb_min = jax.ops.segment_min(big, slot, num_segments=N)
        cb_max = jax.ops.segment_max(small, slot, num_segments=N)
        seg_cnt = jax.ops.segment_sum(act.astype(jnp.int32), slot,
                                      num_segments=N)
        ext = cb_max - cb_min  # (N, 3) per-slot

        # ---- binning on all 3 axes ---------------------------------------
        scale = jnp.where(ext > 1e-20, BINS * 0.999999 / jnp.maximum(ext, 1e-20), 0.0)
        binid = jnp.clip(
            ((cent - cb_min[slot]) * scale[slot]).astype(jnp.int32),
            0, BINS - 1,
        )  # (N, 3)

        # flatten (frag, axis) → 3N items, key = slot·24 + axis·8 + bin
        ax3 = jnp.arange(3, dtype=jnp.int32)
        key = (slot[:, None] * (3 * BINS) + ax3[None, :] * BINS + binid)
        keyf = key.reshape(-1)  # (3N,)
        actf = jnp.repeat(act, 3)
        fmin3 = jnp.repeat(fmin, 3, axis=0)
        fmax3 = jnp.repeat(fmax, 3, axis=0)
        keyf = jnp.where(actf, keyf, N * 3 * BINS - 1)
        bin_cnt = jax.ops.segment_sum(
            actf.astype(jnp.int32), keyf, num_segments=N * 3 * BINS
        ).reshape(N, 3, BINS)
        bin_min = jax.ops.segment_min(
            jnp.where(actf[:, None], fmin3, BVH_FAR), keyf,
            num_segments=N * 3 * BINS,
        ).reshape(N, 3, BINS, 3)
        bin_max = jax.ops.segment_max(
            jnp.where(actf[:, None], fmax3, -BVH_FAR), keyf,
            num_segments=N * 3 * BINS,
        ).reshape(N, 3, BINS, 3)

        # ---- SAH sweep ---------------------------------------------------
        lmin = lax.cummin(bin_min, axis=2)
        lmax = lax.cummax(bin_max, axis=2)
        rmin = lax.cummin(bin_min, axis=2, reverse=True)
        rmax = lax.cummax(bin_max, axis=2, reverse=True)
        lcnt = jnp.cumsum(bin_cnt, axis=2)
        rcnt = jnp.cumsum(bin_cnt[:, :, ::-1], axis=2)[:, :, ::-1]
        a_l = _ha(lmin[:, :, :-1], lmax[:, :, :-1])
        a_r = _ha(rmin[:, :, 1:], rmax[:, :, 1:])
        n_l = lcnt[:, :, :-1]
        n_r = rcnt[:, :, 1:]
        cost = jnp.where((n_l == 0) | (n_r == 0), BVH_FAR,
                         a_l * n_l + a_r * n_r)
        flat = cost.reshape(N, -1)
        best = jnp.argmin(flat, axis=1).astype(jnp.int32)
        best_cost = jnp.min(flat, axis=1)
        b_axis = best // (BINS - 1)
        b_bin = best % (BINS - 1)

        # per-slot node areas (slot s ↔ node ls+s)
        nid = jnp.clip(ls + jnp.arange(N, dtype=jnp.int32), 0, M - 1)
        r_sav = 1.0 / jnp.maximum(_ha(s["node_min"][nid], s["node_max"][nid]),
                                  1e-30)
        split_cost = C_TRAV + C_INT * r_sav * best_cost
        no_split = C_INT * seg_cnt.astype(jnp.float32)
        open_slot = seg_cnt > 0
        sah_leaf = (seg_cnt <= 1) | (best_cost >= BVH_FAR) | (
            split_cost >= no_split
        )
        must_split = seg_cnt > max_leaf
        force_leaf = s["level"] >= MAX_LEVELS - 1
        do_split = open_slot & ~(
            (sah_leaf & ~must_split) | (seg_cnt <= 1)
        ) & (best_cost < BVH_FAR) & ~force_leaf
        make_leaf = open_slot & ~do_split

        # ---- allocate children (contiguous range at level_end) ----------
        split_rank = jnp.cumsum(do_split.astype(jnp.int32)) - do_split
        n_split = jnp.sum(do_split.astype(jnp.int32))
        lchild = le + 2 * split_rank  # per slot (valid where do_split)

        # ---- write current-level nodes (contiguous block at ls) ---------
        blk_lf = jnp.where(do_split, lchild, 0).astype(jnp.int32)
        blk_ct = jnp.where(make_leaf, seg_cnt, 0).astype(jnp.int32)
        left_first = lax.dynamic_update_slice(
            jnp.pad(s["left_first"], (0, N)), blk_lf, (ls,))[:M]
        count = lax.dynamic_update_slice(
            jnp.pad(s["count"], (0, N)), blk_ct, (ls,))[:M]

        # ---- write children (contiguous block at le) --------------------
        # dense child blocks ordered by split_rank: invert via scatter-max
        # of the slot id at position split_rank, then gather
        src = jnp.full(N, 0, jnp.int32).at[
            jnp.where(do_split, split_rank, N - 1)
        ].max(jnp.where(do_split, jnp.arange(N, dtype=jnp.int32), 0))
        take = lambda a: a[src]  # (N, …) dense by rank

        gl_min = lmin[jnp.arange(N), b_axis, b_bin]
        gl_max = lmax[jnp.arange(N), b_axis, b_bin]
        gr_min = rmin[jnp.arange(N), b_axis, b_bin + 1]
        gr_max = rmax[jnp.arange(N), b_axis, b_bin + 1]
        dense = jnp.stack([take(gl_min), take(gr_min)], axis=1).reshape(-1, 3)
        dense_mx = jnp.stack([take(gl_max), take(gr_max)], axis=1).reshape(-1, 3)
        rank2 = jnp.arange(2 * N, dtype=jnp.int32)
        live = rank2 < 2 * n_split
        node_min = lax.dynamic_update_slice(
            jnp.pad(s["node_min"], ((0, 2 * N), (0, 0))),
            jnp.where(live[:, None], dense,
                      lax.dynamic_slice(
                          jnp.pad(s["node_min"], ((0, 2 * N), (0, 0))),
                          (le, 0), (2 * N, 3))),
            (le, 0))[:M]
        node_max = lax.dynamic_update_slice(
            jnp.pad(s["node_max"], ((0, 2 * N), (0, 0))),
            jnp.where(live[:, None], dense_mx,
                      lax.dynamic_slice(
                          jnp.pad(s["node_max"], ((0, 2 * N), (0, 0))),
                          (le, 0), (2 * N, 3))),
            (le, 0))[:M]

        # ---- reassign fragments -----------------------------------------
        go_left = jnp.take_along_axis(
            binid, b_axis[slot][:, None], axis=1
        )[:, 0] <= b_bin[slot]
        frag_split = act & do_split[slot]
        new_node = jnp.where(go_left, lchild[slot], lchild[slot] + 1)
        frag_node = jnp.where(frag_split, new_node, s["frag_node"])
        frag_active = act & frag_split

        return dict(
            node_min=node_min, node_max=node_max,
            left_first=left_first, count=count,
            frag_node=frag_node, frag_active=frag_active,
            level_start=le, level_end=le + 2 * n_split,
            level=s["level"] + 1,
        )

    s = lax.while_loop(cond, body, state)

    # ---- finalize: group fragments by leaf, set leaf offsets -------------
    order = jnp.argsort(s["frag_node"], stable=True).astype(jnp.int32)
    sorted_node = s["frag_node"][order]
    pos = jnp.arange(N, dtype=jnp.int32)
    # leaf offsets via scatter-min of sorted positions (leaves pre-set to N
    # so the min is the first fragment's slot)
    lf0 = jnp.where(s["count"] > 0, N, s["left_first"])
    left_first = lf0.at[sorted_node].min(pos)

    return BVH2(
        node_min=s["node_min"],
        node_max=s["node_max"],
        left_first=left_first,
        count=s["count"],
        prim_idx=order,
        n_nodes=s["level_end"],
    )
