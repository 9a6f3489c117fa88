"""Leaf-shape transforms on the canonical BVH2 — counterpart of
BVH_Verbose::CombineLeafs / BVH::SplitLeafs (tiny_bvh.h:3099-3139,
1988-2018), the preprocessing the reference runs before wide-layout
conversion (BVH8_CPU does CombineLeafs(4)+SplitLeafs(4), :5463-5465).

Host-side numpy transforms (the tree walk is serial-recursive; builds
already run host-side for the same reason — see native/builder.c:1-20).
Because the builders partition prim_idx in place, every subtree's
primitives occupy one contiguous prim_idx range, so collapsing a subtree
into a leaf is just (min leaf start, total count)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.layouts.bvh2 import BVH2


def _host(bvh: BVH2):
    return (np.asarray(bvh.node_min), np.asarray(bvh.node_max),
            np.asarray(bvh.left_first), np.asarray(bvh.count),
            int(np.asarray(bvh.n_nodes)))


def _rebuild(mn, mx, lf, ct, keep_order, prim_idx, capacity):
    """Re-emit kept nodes in pre-order into the paired-children layout."""
    out_mn = np.full((capacity, 3), BVH_FAR, np.float32)
    out_mx = np.full((capacity, 3), -BVH_FAR, np.float32)
    out_lf = np.zeros(capacity, np.int32)
    out_ct = np.zeros(capacity, np.int32)
    nxt = [2]
    remap = {}

    def emit(old, new):
        remap[old] = new
        out_mn[new] = mn[old]
        out_mx[new] = mx[old]
        out_ct[new] = ct[old]
        if ct[old] > 0:
            out_lf[new] = lf[old]
            return
        l = nxt[0]
        nxt[0] += 2
        out_lf[new] = l
        emit(lf[old], l)
        emit(lf[old] + 1, l + 1)

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, capacity + 100))
    try:
        emit(0, 0)
    finally:
        sys.setrecursionlimit(old_limit)
    return BVH2(
        node_min=jnp.asarray(out_mn), node_max=jnp.asarray(out_mx),
        left_first=jnp.asarray(out_lf), count=jnp.asarray(out_ct),
        prim_idx=jnp.asarray(prim_idx),
        n_nodes=jnp.asarray(nxt[0], jnp.int32),
    )


def combine_leafs(bvh: BVH2, max_prims: int = 4) -> BVH2:
    """Collapse maximal subtrees with <= max_prims primitives into single
    leaves (≙ BVH_Verbose::CombineLeafs, tiny_bvh.h:3099-3139). Child AABBs
    and the prim permutation are unchanged; only topology shrinks."""
    mn, mx, lf, ct, n = _host(bvh)
    cap = lf.shape[0]

    # bottom-up subtree prim totals + range starts (children before
    # parents is NOT guaranteed after optimization, so iterate post-order)
    total = np.where(ct > 0, ct, -1).astype(np.int64)
    start = np.where(ct > 0, lf, np.iinfo(np.int32).max).astype(np.int64)
    stack = [(0, False)]
    while stack:
        node, ready = stack.pop()
        if ct[node] > 0:
            continue
        l = lf[node]
        if not ready:
            stack.append((node, True))
            stack.append((l, False))
            stack.append((l + 1, False))
        else:
            total[node] = total[l] + total[l + 1]
            start[node] = min(start[l], start[l + 1])

    # top-down: first node on each root path with total <= max_prims
    # becomes a leaf
    ct2 = ct.copy()
    lf2 = lf.copy()
    stack = [0]
    while stack:
        node = stack.pop()
        if ct2[node] > 0:
            continue
        if total[node] <= max_prims:
            ct2[node] = total[node]
            lf2[node] = start[node]
            continue
        stack.extend((lf2[node], lf2[node] + 1))

    return _rebuild(mn, mx, lf2, ct2, None, np.asarray(bvh.prim_idx), cap)


def split_leafs(bvh: BVH2, max_prims: int = 4) -> BVH2:
    """Split leaves larger than max_prims into balanced subtrees of
    adjacent prim ranges (≙ BVH::SplitLeafs, tiny_bvh.h:1988-2018). The
    split is by range midpoint — child AABBs are recomputed from the
    original node box (kept conservative: both halves inherit the parent
    box, exactly like the reference, which doesn't rescan either)."""
    mn, mx, lf, ct, n = _host(bvh)
    cap = lf.shape[0]
    mn2, mx2 = list(mn), list(mx)
    lf2, ct2 = list(lf), list(ct)

    stack = [i for i in range(cap)
             if i != 1 and i < max(n, 2) and ct[i] > max_prims]
    # only reachable nodes: walk from root
    reach = set()
    walk = [0]
    while walk:
        i = walk.pop()
        reach.add(i)
        if ct[i] == 0:
            walk.extend((lf[i], lf[i] + 1))
    stack = [i for i in stack if i in reach]

    while stack:
        node = stack.pop()
        if ct2[node] <= max_prims:
            continue
        half = int(ct2[node]) // 2
        l = len(lf2)
        for child_start, child_cnt in (
            (lf2[node], half), (lf2[node] + half, ct2[node] - half)
        ):
            mn2.append(mn2[node])
            mx2.append(mx2[node])
            lf2.append(child_start)
            ct2.append(child_cnt)
        lf2[node] = l
        ct2[node] = 0
        if ct2[l] > max_prims:
            stack.append(l)
        if ct2[l + 1] > max_prims:
            stack.append(l + 1)

    mn2 = np.asarray(mn2, np.float32)
    mx2 = np.asarray(mx2, np.float32)
    lf2 = np.asarray(lf2, np.int32)
    ct2 = np.asarray(ct2, np.int32)
    return _rebuild(mn2, mx2, lf2, ct2, None, np.asarray(bvh.prim_idx),
                    lf2.shape[0] + 2)
