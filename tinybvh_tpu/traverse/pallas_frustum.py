"""Pallas TPU kernel: per-tile frustum BFS (packet phase 1).

The XLA frontier formulation of phase 1 costs ~45 ops × tree-depth levels;
on this environment every XLA op pays a ~0.3 ms dispatch floor, so the
whole collection runs at ~125 ms regardless of data size. This kernel
replaces it with ONE op: grid = (T,) tiles, each instance walks the BVH8
with a register stack, testing 8 children per node against the tile's 4
frustum planes ((1, 8)-shaped VPU ops), appending leaf rows to a register
list via one-hot selects.

The node tables live in VMEM (full-array blocks — ~3 MB for bunny-class
scenes); per-node access is a scalar-indexed dynamic slice, which Mosaic
supports (unlike per-lane gathers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinybvh_tpu.layouts.mbvh import EMPTY_SLOT

STACK = 64


def _excl_prefix8(x, iota8):
    """Exclusive prefix sum over 8 lanes (Mosaic has no cumsum):
    Hillis-Steele with pltpu.roll + wraparound masking."""
    p = x
    for sh in (1, 2, 4):
        p = p + jnp.where(iota8 >= sh, pltpu.roll(p, sh, axis=1), 0)
    return p - x


def _kernel(planes_ref, ndoto_ref, bounds_ref, child_ref,
            leaves_ref, count_ref, *, max_leaves):
    K = max_leaves
    # tile constants (scalars)
    n = [[planes_ref[0, p, k] for k in range(3)] for p in range(4)]
    dd = [ndoto_ref[0, 0, p] for p in range(4)]

    iota_s = lax.broadcasted_iota(jnp.int32, (1, STACK), 1)
    iota_k = lax.broadcasted_iota(jnp.int32, (1, K), 1)

    def body(state):
        sp, cnt, ovf, stack, lst = state
        # pop
        sp = sp - 1
        node = jnp.sum(jnp.where(iota_s == sp, stack, 0))
        b = bounds_ref[node]                 # (6, 8)
        kids = child_ref[pl.ds(node, 1), :]  # (1, 8)
        lo = b[0:3]                 # (3, 8)
        hi = b[3:6]
        outside = jnp.zeros((1, 8), jnp.bool_)
        for p in range(4):
            dist = jnp.full((1, 8), -dd[p], jnp.float32)
            for k in range(3):
                corner = jnp.where(n[p][k] > 0, hi[k:k+1], lo[k:k+1])
                dist = dist + n[p][k] * corner
            outside = outside | (dist < 0)
        valid = ~outside & (kids != EMPTY_SLOT)
        leafc = (valid & (kids < 0)).astype(jnp.int32)   # (1, 8)
        nodec = (valid & (kids >= 0)).astype(jnp.int32)

        # vectorized one-hot scatter: lane k lands at base + exclusive rank
        # (8, STACK)/(8, K) compare-select tiles instead of unrolled scalar
        # extraction (vector→sreg moves dominate otherwise)
        iota8 = lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        lrank = _excl_prefix8(leafc, iota8)              # (1, 8)
        nrank = _excl_prefix8(nodec, iota8)
        ltgt = (cnt + lrank)[0][:, None]                 # (8, 1)
        ntgt = (sp + nrank)[0][:, None]
        lrow = (-kids - 1)[0][:, None]                   # (8, 1)
        krow = kids[0][:, None]
        lmask = (iota_k == ltgt) & (leafc[0][:, None] > 0)   # (8, K)
        nmask = (iota_s == ntgt) & (nodec[0][:, None] > 0)   # (8, STACK)
        lst = jnp.where(
            jnp.any(lmask, axis=0, keepdims=True),
            jnp.sum(jnp.where(lmask, lrow, 0), axis=0, keepdims=True), lst)
        stack = jnp.where(
            jnp.any(nmask, axis=0, keepdims=True),
            jnp.sum(jnp.where(nmask, krow, 0), axis=0, keepdims=True), stack)
        cnt = cnt + jnp.sum(leafc)
        sp = sp + jnp.sum(nodec)
        ovf = ovf | (sp >= STACK) | (cnt > K)
        sp = jnp.minimum(sp, STACK - 1)
        return sp, cnt, ovf, stack, lst

    def cond(state):
        return state[0] > 0

    init = (
        jnp.int32(1),                       # sp (root pushed)
        jnp.int32(0),                       # leaf count
        jnp.int32(0) > jnp.int32(1),        # overflow (scalar bool)
        jnp.zeros((1, STACK), jnp.int32),   # stack (root = node 0 at slot 0)
        jnp.full((1, K), 2**31 - 1, jnp.int32),
    )
    sp, cnt, ovf, stack, lst = lax.while_loop(cond, body, init)
    leaves_ref[0, 0, :] = lst[0, :]
    count_ref[0, 0, 0] = jnp.where(ovf | (cnt > K), -1, cnt)


@partial(jax.jit, static_argnames=("max_leaves", "interpret"))
def collect_tile_leaves_pallas(bounds3, child8, planes, ndoto,
                               max_leaves: int = 256,
                               interpret: bool = False):
    """bounds3: (M, 6, 8) f32; child8: (M, 8) i32 (EMPTY_SLOT padded);
    planes: (T, 4, 3); ndoto: (T, 1, 4) = plane·origin per tile.
    Returns (leaves (T, K) i32 [I32MAX padded], counts (T,) i32; -1 marks
    stack/list overflow for that tile)."""
    T = planes.shape[0]
    K = max_leaves
    leaves, counts = pl.pallas_call(
        partial(_kernel, max_leaves=K),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 4, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bounds3 full
            pl.BlockSpec(memory_space=pltpu.VMEM),   # child8 full
        ],
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, K), jnp.int32),
            jax.ShapeDtypeStruct((T, 1, 1), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(planes, ndoto, bounds3, child8)
    return leaves.reshape(T, K), counts.reshape(T)
