"""LBVH: Morton-code radix-tree builder — fully on-device, jittable.

The TPU-native *fast* builder. The reference's fast path is the AVX binned
builder (tiny_bvh.h:6400-6682) — a SIMD version of the same serial
recursion. On TPU the right fast build is a different algorithm entirely:
Karras-2012 parallel binary radix trees over sorted Morton codes, where
every internal node is derived independently with O(log n) bit arithmetic —
all N-wide vector ops, one sort, no recursion. Quality is below binned SAH
(use builders.binned for quality, this for dynamic geometry).

Produces the canonical BVH2 SoA layout:
  node 0 = root, node 1 reserved; internal node i (0-based in [0, N-2))
  maps to slot i+2's sibling pairing via explicit child indices.

Reference for behavior parity: BVH::Build topology invariants
(tiny_bvh.h:2261-2461) — AABB containment, prim permutation completeness.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tinybvh_tpu.core.vecmath import morton_encode_3d
from tinybvh_tpu.layouts.bvh2 import BVH2

@partial(jax.jit, static_argnames=())
def build_lbvh(tris) -> BVH2:
    """Build a BVH2 over (N, 3, 3) triangles; one leaf per primitive.

    Node-pool layout (capacity 2N + 2): slot 0 = root, slot 1 reserved;
    internal radix-tree node i's two children occupy the adjacent pair
    (2 + 2i, 3 + 2i), satisfying the canonical right = left + 1 convention.
    """
    tris = jnp.asarray(tris, jnp.float32)
    N = tris.shape[0]
    if N == 1:
        # degenerate: root is a single leaf
        mn = jnp.min(tris, axis=(0, 1))
        mx = jnp.max(tris, axis=(0, 1))
        cap = 4
        node_min = jnp.full((cap, 3), 1e30).at[0].set(mn)
        node_max = jnp.full((cap, 3), -1e30).at[0].set(mx)
        return BVH2(
            node_min=node_min, node_max=node_max,
            left_first=jnp.zeros(cap, jnp.int32),
            count=jnp.zeros(cap, jnp.int32).at[0].set(1),
            prim_idx=jnp.zeros(1, jnp.int32),
            n_nodes=jnp.asarray(2, jnp.int32),
        )

    fmin = jnp.min(tris, axis=1)
    fmax = jnp.max(tris, axis=1)
    cent = (fmin + fmax) * 0.5
    smin = jnp.min(cent, axis=0)
    smax = jnp.max(cent, axis=0)
    scale = 1023.0 / jnp.maximum(smax - smin, 1e-20)
    q = jnp.clip((cent - smin) * scale, 0, 1023).astype(jnp.uint32)
    codes = morton_encode_3d(q)

    # sort prims by code (stable → sorted position breaks ties)
    order = jnp.argsort(codes, stable=True)
    scode = codes[order]

    # common-prefix length between sorted keys i and j; equal codes fall
    # back to position bits (Karras §4: augmented key code⧺index), giving
    # an effective 64-bit key without needing uint64
    def delta(i, j):
        valid = (j >= 0) & (j < N)
        jj = jnp.clip(j, 0, N - 1)
        x = scode[i] ^ scode[jj]
        tie = x == 0
        y = (i.astype(jnp.uint32)) ^ (jj.astype(jnp.uint32))
        clz = jnp.where(
            tie,
            64 - _bit_length_u32(y),
            32 - _bit_length_u32(x),
        )
        return jnp.where(valid, clz, -1)

    idx = jnp.arange(N - 1)

    # Karras: determine direction and range for each internal node
    d = jnp.sign(delta(idx, idx + 1) - delta(idx, idx - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)
    delta_min = delta(idx, idx - d)

    # find range end via exponential search + binary search (vectorized)
    def find_lmax(_, lmax):
        probe = idx + lmax * d
        more = delta(idx, probe) > delta_min
        return jnp.where(more, lmax * 2, lmax)

    lmax = lax.fori_loop(0, 32, find_lmax, jnp.full(N - 1, 2))

    def bin_search_l(carry, _):
        l, t = carry
        t = t >> 1  # lmax is a power of two → exact halving
        probe = idx + (l + t) * d
        ok = (t > 0) & (delta(idx, probe) > delta_min)
        return (jnp.where(ok, l + t, l), t), None

    (l, _), _ = lax.scan(
        bin_search_l,
        (jnp.zeros(N - 1, jnp.int32), lmax.astype(jnp.int32)),
        None, length=34,
    )
    j = idx + l * d  # other end of range

    # find split position via binary search on delta(i, j) prefix
    delta_node = delta(idx, j)
    span = jnp.abs(j - idx)

    def bin_search_s(carry, _):
        s, t = carry
        t = (t + 1) >> 1  # ceil(t/2); sticks at 1, which is safe because
        # delta(i, i+k·d) is monotone in k — extra unit steps are no-ops
        probe = idx + (s + t) * d
        ok = (t > 0) & (s + t < span) & (delta(idx, probe) > delta_node)
        return (jnp.where(ok, s + t, s), t), None

    (s, _), _ = lax.scan(
        bin_search_s,
        (jnp.zeros(N - 1, jnp.int32), span.astype(jnp.int32)),
        None, length=34,
    )
    gamma = idx + s * d + jnp.minimum(d, 0)  # split index

    # children of internal node i: [min(i,j), gamma] and [gamma+1, max(i,j)]
    left_is_leaf = jnp.minimum(idx, j) == gamma
    right_is_leaf = jnp.maximum(idx, j) == gamma + 1

    # ---- internal-node AABBs: range min/max over sorted leaf boxes ------
    # Internal node i covers the CONTIGUOUS sorted-leaf range
    # [min(i,j), max(i,j)] (Karras §4), so its AABB is a range reduction —
    # computed scatter-free with a doubling (sparse-table) sweep: at level
    # k the running table T holds window-2^k mins; nodes whose range
    # length has floor(log2) == k read their two overlapping windows at
    # that level. O(N log N) gathers/selects, NO scatters (the round-2
    # implementation's 64 full-array scatter passes were ~344 ms on
    # device; TPU scatters serialize).
    sorted_fmin = fmin[order]
    sorted_fmax = fmax[order]
    rlo = jnp.minimum(idx, j)
    rhi = jnp.maximum(idx, j)
    rlen = rhi - rlo + 1                                  # >= 2
    klev = _bit_length_u32(rlen.astype(jnp.uint32)) - 1   # floor(log2)
    K = max(1, int(np.ceil(np.log2(max(N, 2)))) + 1)

    amin = jnp.zeros((N - 1, 3), jnp.float32)
    amax = jnp.zeros((N - 1, 3), jnp.float32)
    Tmin, Tmax = sorted_fmin, sorted_fmax
    ar = jnp.arange(N, dtype=jnp.int32)
    for k in range(K):
        take = (klev == k)[:, None]
        b_ix = rhi - (1 << k) + 1
        amin = jnp.where(
            take, jnp.minimum(Tmin[rlo], Tmin[b_ix]), amin)
        amax = jnp.where(
            take, jnp.maximum(Tmax[rlo], Tmax[b_ix]), amax)
        if (1 << (k + 1)) <= N:
            nxt = jnp.minimum(ar + (1 << k), N - 1)
            Tmin = jnp.minimum(Tmin, Tmin[nxt])
            Tmax = jnp.maximum(Tmax, Tmax[nxt])

    # ---- slot assembly: pure gathers ------------------------------------
    # BVH2 convention (right child = left child + 1): internal node i's
    # children occupy slots (2 + 2i, 3 + 2i); root (internal 0) at slot 0,
    # slot 1 reserved. Slot s >= 2 therefore holds the child of internal
    # node p = (s-2)>>1 on side (s-2)&1 — every slot's content is a GATHER
    # from its parent's split, no scatter needed.
    cap = 2 * N + 2
    sl = jnp.arange(cap, dtype=jnp.int32)
    p = jnp.clip((sl - 2) >> 1, 0, N - 2)
    side = (sl - 2) & 1
    child = gamma[p] + side                   # leaf position OR internal id
    is_leaf_child = jnp.where(side == 0, left_is_leaf[p], right_is_leaf[p])
    live = (sl >= 2) & (sl - 2 < 2 * (N - 1))

    cl = jnp.clip(child, 0, N - 1)
    ci = jnp.clip(child, 0, N - 2)
    node_min = jnp.where(
        (live & is_leaf_child)[:, None], sorted_fmin[cl],
        jnp.where(live[:, None], amin[ci], 1e30))
    node_max = jnp.where(
        (live & is_leaf_child)[:, None], sorted_fmax[cl],
        jnp.where(live[:, None], amax[ci], -1e30))
    left_first = jnp.where(live & is_leaf_child, cl,
                           jnp.where(live, 2 + 2 * ci, 0))
    count = jnp.where(live & is_leaf_child, 1, 0).astype(jnp.int32)

    # root = internal node 0
    node_min = node_min.at[0].set(amin[0])
    node_max = node_max.at[0].set(amax[0])
    left_first = left_first.at[0].set(2)
    count = count.at[0].set(0)

    return BVH2(
        node_min=node_min,
        node_max=node_max,
        left_first=left_first,
        count=count,
        prim_idx=order.astype(jnp.int32),
        n_nodes=jnp.asarray(2 * N, jnp.int32),
    )


def _bit_length_u32(x):
    """Per-element bit length of uint32 values (0 → 0)."""
    n = jnp.zeros(x.shape, jnp.int32)
    v = x
    for shift in (16, 8, 4, 2, 1):
        big = v >= (jnp.uint32(1) << shift)
        n = n + jnp.where(big, shift, 0)
        v = jnp.where(big, v >> jnp.uint32(shift), v)
    return n + jnp.where(x > 0, 1, 0).astype(jnp.int32)
