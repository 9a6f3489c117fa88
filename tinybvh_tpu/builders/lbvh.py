"""LBVH: Morton-code radix-tree builder — fully on-device, jittable.

The TPU-native *fast* builder. The reference's fast path is the AVX binned
builder (tiny_bvh.h:6400-6682) — a SIMD version of the same serial
recursion. On TPU the right fast build is a different algorithm entirely:
a parallel binary radix tree over sorted Morton codes. Quality is below
binned SAH (use builders.binned for quality, this for dynamic geometry).

TREE EMISSION — Cartesian-tree / ANSV formulation (r4). The Karras-2012
per-node binary searches are redundant on TPU: each of the ~100 search
iterations issues a data-dependent (N,) gather, and XLA TPU gathers cost
~2 ms per chained step at 262k elements — the searches alone were 422 ms
of a 623 ms build (benchmarks/lbvh_probe.py). Instead observe that the
radix tree IS the Cartesian tree (min at root) of the ADJACENT-pair
prefix deltas D[0..N-2], which are one shifted vector op. Every node's
leaf range and parent then follow from its two nearest-smaller-value
(ANSV) bounds, and because augmented deltas take only 65 distinct values
(prefix length 0..64), ANSV is computed with 65-CHANNEL cumulative
scans — zero gathers, zero search loops:

  a[i] = nearest j < i with D[j] <= D[i]   (channel cummax, exclusive)
  b[i] = nearest j > i with D[j] <  D[i]   (reverse channel cummin)
  range  = leaves [a+1, b]   (sentinels -1 / N-1)
  parent = deeper of splits a, b (larger D; tie -> b), side from which
  children = parent-pointer inversion — two scatters; child slots then
  read the inverted table as a CONTIGUOUS slice (no gather at all)

Produces the canonical BVH2 SoA layout:
  node 0 = root, node 1 reserved; internal radix node i's two children
  occupy the adjacent pair (2 + 2i, 3 + 2i).

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

# augmented prefix-delta values: 0..31 (code prefix) and 33..64 (equal
# codes, index prefix) -> 65 scan channels
_N_CHAN = 65


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

    # ---- adjacent augmented deltas (one shifted vector op) --------------
    # D[i] = common-prefix length of sorted keys i, i+1; equal codes fall
    # back to position bits (Karras §4 augmented key code⧺index), giving
    # unique-enough keys without uint64. Values in [0, 64].
    idx = jnp.arange(N - 1, dtype=jnp.int32)
    x = scode[:-1] ^ scode[1:]
    tie = x == 0
    y = idx.astype(jnp.uint32) ^ (idx + 1).astype(jnp.uint32)
    D = jnp.where(tie, 64 - _bit_length_u32(y), 32 - _bit_length_u32(x))

    # ---- ANSV via 65-channel scans (no gathers) --------------------------
    # channel layout (C, N-1): lanes along splits
    chan = jnp.arange(_N_CHAN, dtype=jnp.int32)[:, None]          # (C, 1)
    onehot = D[None, :] == chan                                   # (C, N-1)
    # a[i] = max{ j < i : D[j] <= D[i] } : exclusive running last-position
    pos = jnp.where(onehot, idx[None, :], -1)
    lastpos = lax.cummax(pos, axis=1)
    lastpos_excl = jnp.concatenate(
        [jnp.full((_N_CHAN, 1), -1, lastpos.dtype), lastpos[:, :-1]], axis=1)
    a = jnp.max(jnp.where(chan <= D[None, :], lastpos_excl, -1), axis=0)
    # b[i] = min{ j > i : D[j] < D[i] } : exclusive reverse next-position
    BIG = jnp.int32(2**30)
    posr = jnp.where(onehot, idx[None, :], BIG)
    nextpos = lax.cummin(posr[:, ::-1], axis=1)[:, ::-1]
    nextpos_excl = jnp.concatenate(
        [nextpos[:, 1:], jnp.full((_N_CHAN, 1), BIG, nextpos.dtype)], axis=1)
    b_raw = jnp.min(jnp.where(chan < D[None, :], nextpos_excl, BIG), axis=0)
    no_b = b_raw >= BIG
    b = jnp.where(no_b, N - 1, b_raw)  # leaf-inclusive right bound

    # ---- parent pointers (2 gathers) + inversion (2 scatters) -----------
    Dpad = jnp.concatenate([D, jnp.full((1,), -1, D.dtype)])  # D[-1] sentinel
    Da = jnp.where(a >= 0, Dpad[jnp.maximum(a, 0)], -1)
    Db = jnp.where(no_b, -1, Dpad[jnp.minimum(b, N - 2)])
    # deeper bounding split = parent; tie -> b (the right split is the
    # descendant of the left one under the leftmost-min-root convention)
    par_is_b = Db >= Da
    parent_i = jnp.where(par_is_b, b, a)                     # (N-1,)
    side_i = jnp.where(par_is_b, 0, 1)                       # b -> left child
    is_root = (a < 0) & no_b
    root = jnp.argmin(jnp.where(is_root, 0, 1))              # leftmost min

    # leaves: leaf k is bounded by splits k-1 and k; deeper one adopts it
    lk = jnp.arange(N, dtype=jnp.int32)
    Dl = jnp.where(lk > 0, Dpad[jnp.maximum(lk - 1, 0)], -1)
    Dr = jnp.where(lk < N - 1, Dpad[jnp.minimum(lk, N - 2)], -1)
    par_is_r = Dr >= Dl
    parent_k = jnp.where(par_is_r, lk, lk - 1)
    side_k = jnp.where(par_is_r, 0, 1)

    # invert: inv[p, s] = child of internal p on side s; leaves hold their
    # sorted position, internals N + id (both scatters hit disjoint slots)
    inv = jnp.full((N - 1) * 2, -1, jnp.int32)
    flat_i = parent_i * 2 + side_i
    inv = inv.at[jnp.where(is_root, 2 * (N - 1) - 1, flat_i)].max(
        jnp.where(is_root, -1, N + idx))
    inv = inv.at[parent_k * 2 + side_k].max(lk)

    # ---- internal-node AABBs: range min/max over sorted leaf boxes ------
    # doubling (sparse-table) sweep. r4: the per-LEVEL range lookups were
    # the whole build's bottleneck (72 data-dependent gathers = 172 ms of
    # a 199 ms build at 262k; XLA TPU gathers cost ~2.4 ms each chained).
    # Build ALL K window tables first — pure contiguous slice shifts —
    # then stack them and answer every node's two range lookups with ONE
    # gather per bound (4 total): idx = klev*N + position.
    sorted_fmin = fmin[order]
    sorted_fmax = fmax[order]
    rlo = a + 1
    rhi = b
    rlen = rhi - rlo + 1                                  # >= 2
    klev = _bit_length_u32(rlen.astype(jnp.uint32)) - 1   # floor(log2)
    K = max(1, int(np.ceil(np.log2(max(N, 2)))) + 1)

    # separate 3-wide min/max tables: a fused (K*N, 6) variant measured
    # SLOWER (50 vs 36 ms at 262k) — XLA's gather lowering prefers the
    # narrower rows here
    Tmin, Tmax = sorted_fmin, sorted_fmax
    mins, maxs = [Tmin], [Tmax]
    for k in range(K - 1):
        if (1 << (k + 1)) <= N:
            sh = 1 << k
            tail_mn = jnp.broadcast_to(Tmin[-1:], (sh, 3))
            tail_mx = jnp.broadcast_to(Tmax[-1:], (sh, 3))
            Tmin = jnp.minimum(Tmin,
                               jnp.concatenate([Tmin[sh:], tail_mn]))
            Tmax = jnp.maximum(Tmax,
                               jnp.concatenate([Tmax[sh:], tail_mx]))
        mins.append(Tmin)
        maxs.append(Tmax)
    TM = jnp.stack(mins).reshape(K * N, 3)                # (K*N, 3)
    TX = jnp.stack(maxs).reshape(K * N, 3)
    base = klev * N
    b_ix = rhi - jnp.left_shift(1, klev) + 1
    amin = jnp.minimum(TM[base + rlo], TM[base + b_ix])   # (N-1, 3)
    amax = jnp.maximum(TX[base + rlo], TX[base + b_ix])

    # ---- slot assembly ---------------------------------------------------
    # slot s >= 2 holds the child of internal p = (s-2)>>1 on side
    # (s-2)&1 — which is exactly inv[s-2]: a CONTIGUOUS slice, no gather.
    cap = 2 * N + 2
    c = jnp.concatenate([jnp.zeros(2, jnp.int32), inv,
                         jnp.zeros(cap - 2 * N, jnp.int32)])
    live = (jnp.arange(cap) >= 2) & (jnp.arange(cap) < 2 * N) & (c >= 0)
    is_leaf_child = live & (c < N)
    # one combined gather over [leaf boxes | internal boxes] per bound
    tab_min = jnp.concatenate([sorted_fmin, amin], axis=0)   # (2N-1, 3)
    tab_max = jnp.concatenate([sorted_fmax, amax], axis=0)
    ci = jnp.clip(c, 0, 2 * N - 2)
    node_min = jnp.where(live[:, None], tab_min[ci], 1e30)
    node_max = jnp.where(live[:, None], tab_max[ci], -1e30)
    left_first = jnp.where(is_leaf_child, c,
                           jnp.where(live, 2 + 2 * jnp.maximum(c - N, 0), 0))
    count = jnp.where(is_leaf_child, 1, 0).astype(jnp.int32)

    # root = leftmost bound-free split
    node_min = node_min.at[0].set(amin[root])
    node_max = node_max.at[0].set(amax[root])
    left_first = left_first.at[0].set(2 + 2 * root.astype(jnp.int32))
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
