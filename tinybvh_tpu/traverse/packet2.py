"""Packet traversal v2: two wide Pallas kernels (cull → sorted early-exit MT).

Round-1 measurements showed the XLA frontier BFS of packet phase 1 pays a
~0.3 ms per-op dispatch floor x 45 ops x tree depth (~75 ms on bunny) and a
serial per-tile Pallas walk is no better (one (1,8) VPU op per node). This
module replaces the whole packet pipeline with dense, wide kernels:

  K1 `_cull_kernel`  — dense (tile x leaf) frustum cull. Culling against a
      tile's 4 corner planes is hierarchical-free: a leaf AABB intersects
      the frustum iff its own slab test passes (ancestor boxes contain it),
      so instead of walking the tree we test EVERY leaf AABB against 8
      tiles' planes per grid step as (8,3)@(3,128) MXU contractions, and
      compact the survivors' (distance | leaf) keys into per-tile lists with
      a 7-pass butterfly (deficit) compaction — no scatters, no atomics.
      Counterpart of the packet frustum cull in Intersect256Rays
      (tiny_bvh.h:3545-3560); the dense reformulation is the TPU design.

  K2 `_mt_kernel` — per-tile Moller-Trumbore over the distance-SORTED leaf
      list with tile-wide early exit: stop as soon as the next block's
      conservative entry distance exceeds every ray's current best t
      (max over the 256 lanes) — the lockstep analog of the reference's
      ordered packet descent + interval pruning (tiny_bvh.h:3600-3696).
      The MT test itself is restructured as ONE (128,12)@(12,256) matmul
      per quantity via scalar triple products (Cramer's rule):

        with per-ray features f = [d, o x d, o, 1] and per-tri rows
          G_det = [n, 0, 0, 0]            n  = e1 x e2
          G_u   = [-(v0 x e2), -e2, 0, 0]
          G_v   = [ (v0 x e1),  e1, 0, 0]
          G_t   = [0, 0, -n, n.v0]
        det = G_det.f,  u = (G_u.f)/det,  v = (G_v.f)/det,  t = (G_t.f)/det

      which puts the 40-flop MT inner loop on the MXU. Geometry is centered
      on the scene midpoint before building G to keep the o x d / n.o terms
      well-conditioned in f32.

Overflowed tiles (leaf list capacity K exceeded) are reported and can be
retraced exactly by the wavefront engine in the same call.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from flax import struct

from tinybvh_tpu.core.rays import Hits, Rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.layouts.mbvh import BVH8
from tinybvh_tpu.traverse.packet import TILE, _tile_planes

_I32MAX = 2**31 - 1  # plain int: jnp scalars become captured consts in Pallas
_LEAF_BITS = 18          # segment id in the low bits of a cull key
_LEAF_MASK = (1 << _LEAF_BITS) - 1
TB = 8                   # tiles per K1 grid step
LANES = 128              # segments per K1 lane block
TRI_BLK = 128            # triangles per K2 matmul block (= 8 segments)
# SEGMENT granularity: one cull key covers SPAN consecutive leaves
# (their union AABB). Consecutive leaves are BFS-emission-ordered
# siblings, so union boxes stay tight; measured on the bunny camera
# setup, span=4 cuts surviving keys/tile 38->23 and — the real wins —
# shrinks the cull's entity count, block count and butterfly-compaction
# width 4x, and replaces 32 per-leaf DMAs per MT super-block with 8
# segment DMAs (the r3 ablation probe's seg variants run at bigdma
# speed). The extra MT matmul rows cost ~1 us per super-block — far
# below the scalar work saved. span=8 was MEASURED WORSE (r4 split
# probe, bench config): survivors only drop 17 -> 13.8 (not 2x) while
# every surviving block walks 2x the rows, so MT went 8.8 -> 10.8 ms
# and cull 3.9 -> 4.5 ms. The DMA-issue chain is better attacked by
# the pre-decoded offsets (below) at span=4 granularity.
SPAN = 4                 # leaves per cull segment
SEG_ROWS = 4 * SPAN      # gtab rows (tris) per segment
_KPB = TRI_BLK // SEG_ROWS   # keys (segments) per MT super-block
# span_mult coarsening cap: incoherent phases cull at span_mult x SPAN
# leaves per key (consecutive fine segments are CONTIGUOUS gtab rows, so
# one DMA covers the whole coarse segment — span_mult x fewer descriptor
# issues, and the issue loop dominates the fused kernel on survivor-heavy
# tiles: r5 split probe measured ~110 ns/descriptor = 109 of 116 ms of
# the exact diffuse trace). gtab_pad carries 2*M_MAX*rps trailing zero
# rows so the last coarse segment's overhang and the dead-key sentinel
# block stay in-bounds for any span_mult <= M_MAX.
M_MAX = 8


@struct.dataclass
class PacketAux:
    """Per-BVH8 precomputed tables for the packet2 pipeline.

    Cull entities are SEGMENTS of SPAN consecutive leaves (leaf_lo/hi
    hold segment union boxes); the fused MT kernel DMAs whole segments
    ((SEG_ROWS, 128) G-row blocks)."""

    leaf_lo: jnp.ndarray   # (3, Spad) f32 segment AABB lows  (+FAR padding)
    leaf_hi: jnp.ndarray   # (3, Spad) f32 segment AABB highs (-FAR padding)
    blk_lo: jnp.ndarray    # (3, NBpad) f32 union boxes of 128-seg blocks
    blk_hi: jnp.ndarray    # (3, NBpad) f32
    gtab_pad: jnp.ndarray  # (4*ceil(L/SPAN)*SPAN + SEG_ROWS, 128) f32:
    #                        per-tri [G_det|G_u|G_v|G_t] 48-lane rows, lane-
    #                        padded to 128 so the fused kernel can DMA whole
    #                        (SEG_ROWS, 128) segment blocks (Mosaic HBM
    #                        slices must be 128-lane aligned); leaf rows are
    #                        zero-padded to a SPAN multiple + one all-zero
    #                        sentinel segment for dead keys. The gathered-
    #                        layout path reads its G rows from [:4L, :48]
    #                        (there is no separate (L, 4, 48) copy: it cost
    #                        an extra ~0.5 GB host assembly + upload per
    #                        Mtri — r4).
    center: jnp.ndarray    # (3,) f32 scene center subtracted from the rows
    # opacity micromaps ride along in gtab_pad lanes 48:48+ceil(S*S/16)
    # (16 bits per f32 word — exact under int<->float conversion), so the
    # fused MT kernel's alpha test costs no extra DMA. omap keeps the raw
    # (L, 4, S, S) table for the wavefront retrace path.
    omap: jnp.ndarray | None = None
    omap_s: int = struct.field(pytree_node=False, default=0)
    # leaf-row count L (static: gtab_pad's row count bakes in padding)
    n_leaf_rows: int = struct.field(pytree_node=False, default=0)
    # triangles per gtab row. pack=2 stores tri pairs per 128-lane row
    # ([A feats 0:48 | B feats 48:96 | pidA 96 | pidB 97 | omap words A
    # then B from 98]): half the DMA descriptors/bytes AND half the MT
    # super-blocks per segment — the fused kernel is fixed-cost-bound
    # per super-block (r4 split probe), so fewer blocks is the lever.
    # Requires omap_s <= 15 (2 tris' bit words + 2 pid lanes must fit
    # the 32 padding lanes); build_packet_aux falls back to pack=1.
    pack: int = struct.field(pytree_node=False, default=1)

    @property
    def rows_per_seg(self):
        """gtab rows per cull segment (SEG_ROWS tris / pack)."""
        return SEG_ROWS // self.pack

    @property
    def n_leaves(self):
        return self.n_leaf_rows

    @property
    def n_segs(self):
        """Real (non-padding) cull segments."""
        return -(-self.n_leaf_rows // SPAN)

    @property
    def n_blocks(self):
        return self.leaf_lo.shape[1] // LANES


@partial(jax.jit, static_argnames=("pack",))
def build_packet_aux(bvh8: BVH8, omap=None, pack: int = 2) -> PacketAux:
    """Leaf AABBs + centered triple-product rows (one-time per BVH).

    omap: optional (L, 4, S, S) bool opacity micromaps (ops.omap.leaf_align)
    — baked into the fused kernel's G-row padding lanes.
    pack: tris per gtab row (see PacketAux.pack); falls back to 1 when
    the omap bit words don't fit the packed padding lanes (S > 15)."""
    if pack == 2 and omap is not None and omap.shape[-1] > 15:
        pack = 1
    lt = bvh8.leaf_tris                      # (L, 4, 3, 3)
    valid = (bvh8.leaf_prim >= 0)[..., None, None]  # (L, 4, 1, 1)
    big = jnp.where(valid, lt, BVH_FAR)
    small = jnp.where(valid, lt, -BVH_FAR)
    lo = big.min(axis=(1, 2))                # (L, 3)
    hi = small.max(axis=(1, 2))
    center = (lo.min(axis=0) + hi.max(axis=0)) * 0.5

    L = lt.shape[0]
    lpad = -(-L // (LANES * SPAN)) * (LANES * SPAN)
    pad = lpad - L
    lo_lp = jnp.concatenate([lo, jnp.full((pad, 3), BVH_FAR)], axis=0)
    hi_lp = jnp.concatenate([hi, jnp.full((pad, 3), -BVH_FAR)], axis=0)
    # segment union boxes: the cull entity (padding leaves are +/-FAR
    # inverted boxes, so they vanish in the min/max)
    lo_p = lo_lp.reshape(-1, SPAN, 3).min(axis=1)       # (Spad, 3)
    hi_p = hi_lp.reshape(-1, SPAN, 3).max(axis=1)

    v0 = lt[:, :, 0] - center                # centered
    e1 = lt[:, :, 1] - lt[:, :, 0]
    e2 = lt[:, :, 2] - lt[:, :, 0]
    n = jnp.cross(e1, e2)
    k = jnp.sum(n * v0, axis=-1, keepdims=True)   # (L, 4, 1)
    z3 = jnp.zeros_like(v0)
    z1 = jnp.zeros_like(k)
    z2 = jnp.zeros(v0.shape[:-1] + (2,), jnp.float32)
    g_det = jnp.concatenate([n, z3, z3, z1, z2], axis=-1)          # (L,4,12)
    g_u = jnp.concatenate([-jnp.cross(v0, e2), -e2, z3, z1, z2], axis=-1)
    g_v = jnp.concatenate([jnp.cross(v0, e1), e1, z3, z1, z2], axis=-1)
    g_t = jnp.concatenate([z3, z3, -n, k, z2], axis=-1)
    # zero the rows of padding triangles so they can never report a hit
    tri_ok = (bvh8.leaf_prim >= 0)[..., None]
    gtab = jnp.where(tri_ok, jnp.concatenate(
        [g_det, g_u, g_v, g_t], axis=-1), 0.0)                      # (L,4,48)

    # coarse level: union AABB per 128-segment block (the two-level cull's
    # upper tier; blocks are BFS-emission-ordered, so unions stay tight)
    nb = lpad // (LANES * SPAN)
    blo = lo_p.reshape(nb, LANES, 3).min(axis=1)
    bhi = hi_p.reshape(nb, LANES, 3).max(axis=1)
    nbpad = -(-nb // LANES) * LANES
    blo = jnp.concatenate(
        [blo, jnp.full((nbpad - nb, 3), BVH_FAR)], axis=0)
    bhi = jnp.concatenate(
        [bhi, jnp.full((nbpad - nb, 3), -BVH_FAR)], axis=0)
    if omap is None:
        ow = jnp.zeros((4 * L, 0), jnp.float32)
        S = 0
    else:
        S = omap.shape[-1]
        nw = (S * S + 15) // 16
        bits = omap.reshape(4 * L, S * S).astype(jnp.int32)
        pad_b = nw * 16 - S * S
        bits = jnp.concatenate(
            [bits, jnp.zeros((4 * L, pad_b), jnp.int32)], axis=1)
        w = jnp.sum(bits.reshape(4 * L, nw, 16)
                    << jnp.arange(16, dtype=jnp.int32), axis=2)
        ow = w.astype(jnp.float32)                       # exact (< 2^16)
    # per-tri global prim id (bit-cast i32) rides in the lane after the
    # omap words: the fused kernel one-hot-selects the winner's id so the
    # wrapper never does a (R,)-element XLA gather over leaf_prim
    pid = lax.bitcast_convert_type(
        bvh8.leaf_prim.reshape(4 * L, 1).astype(jnp.int32), jnp.float32)
    if pack == 2:
        # tri-PAIR rows: [A feats 0:48 | B feats 48:96 | pidA | pidB |
        # omap words A(nw) then B(nw)] — adjacent tris pair up via plain
        # reshapes (row 2i -> lanes 0:48, row 2i+1 -> lanes 48:96)
        gtab_pad = jnp.concatenate(
            [gtab.reshape(2 * L, 96), pid.reshape(2 * L, 2),
             ow.reshape(2 * L, 2 * ow.shape[1]),
             jnp.zeros((2 * L, 30 - 2 * ow.shape[1]), jnp.float32)],
            axis=1)
    else:
        gtab_pad = jnp.concatenate(
            [gtab.reshape(-1, 48), ow, pid,
             jnp.zeros((4 * L, 127 - 48 - ow.shape[1]), jnp.float32)],
            axis=1)
    # zero rows for the last segment's padding leaves + one all-zero
    # sentinel SEGMENT at the end: dead cull keys DMA it unconditionally
    # (det = 0 -> never hits), which keeps the fused kernel's DMA loops
    # branch-free (scalar-loop cost dominates the MT kernel; see
    # _mt_fused_tile)
    lseg = -(-L // SPAN) * SPAN
    tail = (4 * (lseg - L)) // pack + 2 * M_MAX * (SEG_ROWS // pack)
    gtab_pad = jnp.concatenate(
        [gtab_pad, jnp.zeros((tail, gtab_pad.shape[1]), jnp.float32)],
        axis=0)
    return PacketAux(leaf_lo=lo_p.T, leaf_hi=hi_p.T,
                     blk_lo=blo.T, blk_hi=bhi.T,
                     gtab_pad=gtab_pad, center=center,
                     omap=omap, omap_s=S, n_leaf_rows=L, pack=pack)


def build_packet_aux_host(bvh8_host: dict, omap=None,
                          pack: int = 2) -> PacketAux:
    """Numpy twin of build_packet_aux for the all-host build path.

    Through the tunnel backend every eager device op and every jitted
    function pays a per-shape REMOTE compile (measured: the jitted aux
    build alone cost 37 s on bunny, 85 s on grid4), while H2D uploads
    run at hundreds of MB/s. Computing the tables in numpy and uploading
    the results once makes aux construction ~free.

    bvh8_host: dict from collapse_bvh2(..., as_host=True).
    omap: optional (L, 4, S, S) bool numpy opacity micromaps.
    pack: tris per gtab row (see PacketAux.pack)."""
    import numpy as np

    if pack == 2 and omap is not None and np.asarray(omap).shape[-1] > 15:
        pack = 1

    lt = np.asarray(bvh8_host["leaf_tris"], np.float32)   # (L, 4, 3, 3)
    lp = np.asarray(bvh8_host["leaf_prim"])
    valid = (lp >= 0)[..., None, None]
    big = np.where(valid, lt, BVH_FAR)
    small = np.where(valid, lt, -BVH_FAR)
    lo = big.min(axis=(1, 2))
    hi = small.max(axis=(1, 2))
    center = ((lo.min(axis=0) + hi.max(axis=0)) * 0.5).astype(np.float32)

    L = lt.shape[0]
    lpad = -(-L // (LANES * SPAN)) * (LANES * SPAN)
    pad = lpad - L
    lo_lp = np.concatenate(
        [lo, np.full((pad, 3), BVH_FAR, np.float32)], axis=0)
    hi_lp = np.concatenate(
        [hi, np.full((pad, 3), -BVH_FAR, np.float32)], axis=0)
    lo_p = lo_lp.reshape(-1, SPAN, 3).min(axis=1)       # (Spad, 3)
    hi_p = hi_lp.reshape(-1, SPAN, 3).max(axis=1)

    v0 = lt[:, :, 0] - center
    e1 = lt[:, :, 1] - lt[:, :, 0]
    e2 = lt[:, :, 2] - lt[:, :, 0]
    n = np.cross(e1, e2)
    k = np.sum(n * v0, axis=-1, keepdims=True)
    tri_ok = (lp >= 0).reshape(4 * L, 1)

    # assemble straight into the padded (rows, 128) table: the earlier
    # chain of (4L, 48/128) concatenates materialized ~1.2 GB three times
    # over on Mtri-scale scenes (measured 72 s of the grid16 aux build)
    lseg = -(-L // SPAN) * SPAN
    rows = (4 * lseg) // pack + 2 * M_MAX * (SEG_ROWS // pack)
    gtab_pad = np.zeros((rows, 128), np.float32)

    def put(col, arr3):
        a = np.where(tri_ok, arr3.reshape(4 * L, 3), 0.0)
        if pack == 2:
            # tri-pair rows: even tri -> lanes [col, col+3), odd tri ->
            # the B half at lanes [48+col, 48+col+3)
            gtab_pad[:2 * L, col:col + 3] = a[0::2]
            gtab_pad[:2 * L, 48 + col:48 + col + 3] = a[1::2]
        else:
            gtab_pad[:4 * L, col:col + 3] = a

    put(0, n)                      # G_det = [n, 0...]
    put(12, -np.cross(v0, e2))     # G_u = [-(v0 x e2), -e2, 0...]
    put(15, -e2)
    put(24, np.cross(v0, e1))      # G_v = [(v0 x e1), e1, 0...]
    put(27, e1)
    put(42, -n)                    # G_t = [0,0,0 0,0,0 -n, n.v0, 0, 0]
    kk = np.where(tri_ok, k.reshape(4 * L, 1), 0.0)
    if pack == 2:
        gtab_pad[:2 * L, 45:46] = kk[0::2]
        gtab_pad[:2 * L, 93:94] = kk[1::2]
    else:
        gtab_pad[:4 * L, 45:46] = kk

    nb = lpad // (LANES * SPAN)
    blo = lo_p.reshape(nb, LANES, 3).min(axis=1)
    bhi = hi_p.reshape(nb, LANES, 3).max(axis=1)
    nbpad = -(-nb // LANES) * LANES
    blo = np.concatenate(
        [blo, np.full((nbpad - nb, 3), BVH_FAR, np.float32)], axis=0)
    bhi = np.concatenate(
        [bhi, np.full((nbpad - nb, 3), -BVH_FAR, np.float32)], axis=0)
    if omap is None:
        S = 0
        nw = 0
        omap_dev = None
    else:
        omap = np.asarray(omap)
        S = omap.shape[-1]
        nw = (S * S + 15) // 16
        bits = omap.reshape(4 * L, S * S).astype(np.int32)
        pad_b = nw * 16 - S * S
        bits = np.concatenate(
            [bits, np.zeros((4 * L, pad_b), np.int32)], axis=1)
        w = np.sum(bits.reshape(4 * L, nw, 16)
                   << np.arange(16, dtype=np.int32), axis=2)
        wf = w.astype(np.float32)
        if pack == 2:
            gtab_pad[:2 * L, 98:98 + nw] = wf[0::2]
            gtab_pad[:2 * L, 98 + nw:98 + 2 * nw] = wf[1::2]
        else:
            gtab_pad[:4 * L, 48:48 + nw] = wf
        omap_dev = jnp.asarray(omap)
    pidf = lp.reshape(4 * L, 1).astype(np.int32).view(np.float32)
    if pack == 2:
        gtab_pad[:2 * L, 96:97] = pidf[0::2]
        gtab_pad[:2 * L, 97:98] = pidf[1::2]
    else:
        gtab_pad[:4 * L, 48 + nw:49 + nw] = pidf
    return PacketAux(leaf_lo=jnp.asarray(lo_p.T.copy()),
                     leaf_hi=jnp.asarray(hi_p.T.copy()),
                     blk_lo=jnp.asarray(blo.T.copy()),
                     blk_hi=jnp.asarray(bhi.T.copy()),
                     gtab_pad=jnp.asarray(gtab_pad),
                     center=jnp.asarray(center),
                     omap=omap_dev, omap_s=S, n_leaf_rows=L, pack=pack)


# --------------------------------------------------------------------------
# K1: dense frustum cull + butterfly compaction
# --------------------------------------------------------------------------

def _compact_left(vals, lanes2, bound=None):
    """Butterfly (deficit) compaction of a (1, 2*LANES) lane vector: all
    non-I32MAX entries move to the leftmost lanes (order scrambled is fine
    — the caller sorts). LSB-first passes over monotone deficits; validated
    exhaustively against numpy in tests.

    bound: optional dynamic scalar upper bound on the index of any live
    lane (live lanes all sit in [0, bound)). Ranks of live lanes only need
    prefix contributions from within [0, bound) and their deficits are
    < bound, so rank passes with sh >= 2*bound and move passes with
    b >= bound are exact no-ops — skippable at runtime via lax.cond.
    MEASURED SLOWER on the production cull (bunny 5.2 -> 6.9 ms: the
    per-pass scf.if outweighs the skipped rolls), so no caller passes it;
    kept for narrower-scratch use cases."""
    n = vals.shape[1]
    m = vals != _I32MAX
    mi = m.astype(jnp.int32)
    r = mi
    sh = 1
    while sh < n:
        def rank_pass(rr, sh=sh):
            return rr + jnp.where(lanes2 >= sh, pltpu.roll(rr, sh, axis=1),
                                  0)
        if bound is None:
            r = rank_pass(r)
        else:
            r = lax.cond(sh < 2 * bound, rank_pass, lambda rr: rr, r)
        sh *= 2
    r = r - mi                           # exclusive rank
    deficit = jnp.where(m, lanes2 - r, 0)
    b = 1
    while b < n:
        def move_pass(state, b=b):
            vv, dd = state
            ak = pltpu.roll(vv, n - b, axis=1)
            ad = pltpu.roll(dd, n - b, axis=1)
            take = (lanes2 < n - b) & ((ad & b) != 0) & (ak != _I32MAX)
            return (jnp.where(take, ak, vv), jnp.where(take, ad - b, dd))
        if bound is None:
            vals, deficit = move_pass((vals, deficit))
        else:
            vals, deficit = lax.cond(b < bound, move_pass,
                                     lambda st: st, (vals, deficit))
        b *= 2
    return vals


# Tile-descriptor lane layout: ALL per-tile cull scalars ride in ONE
# lane-aligned (T, 128) f32 row. The earlier 5-8 separate tiny inputs
# ((TB,4,3) planes, (TB,3) boxes, ...) have unaligned trailing dims, and
# their per-grid-step padded fetches dominated both cull kernels
# (measured: K1a alone 4.9 ms on bunny — ~25 us/step of pure overhead).
_D_POSN = 0      # 12 lanes: max(plane,0), [p*3+k]
_D_NEGN = 12     # 12 lanes: min(plane,0)
_D_THR = 24      # 4 lanes: plane thresholds
_D_OLO = 28      # 3 lanes: tile origin-box lo
_D_OHI = 31      # 3 lanes: tile origin-box hi
_D_TCAP = 34     # 1 lane: reach cap (world distance)
_D_LANES = 35


def _frustum_pass(desc, lo, hi):
    """(TB, 128) in-frustum mask of 128 AABBs vs TB tiles' planes.

    desc: (TB, 128) tile-descriptor VALUE (register-sliced — one aligned
    load replaces many tiny unaligned ref fetches). Broadcast VPU
    arithmetic, not (8,3)@(3,128) dots: tiny matmuls are MXU-latency-
    bound and serialize; (8,1)x(1,128) broadcasts pipeline freely."""
    outside = jnp.zeros((TB, LANES), jnp.bool_)
    for p in range(4):
        dist = -desc[:, _D_THR + p:_D_THR + p + 1]       # (TB, 1)
        for k in range(3):
            q = p * 3 + k
            dist = (dist
                    + desc[:, _D_POSN + q:_D_POSN + q + 1] * hi[k:k + 1, :]
                    + desc[:, _D_NEGN + q:_D_NEGN + q + 1] * lo[k:k + 1, :])
        outside = outside | (dist < 0.0)
    return jnp.logical_not(outside)


def _cull_blocks_kernel(desc_ref, blo_ref, bhi_ref,
                        mask_ref, *, n_blocks):
    """K1a: coarse tier — which 128-leaf blocks' union boxes intersect ANY
    of the group's TB tile frusta. Pure vector math, no branches.

    NOT on the production path: cull_tiles runs this tier as fused XLA
    (the Pallas version was grid-step-overhead-bound at ~20 us/step —
    4 ms on bunny for ~20 us of math). Kept for the probe harnesses
    (benchmarks/packet2_probe.py, cull_stage_probe.py) that measure the
    two implementations against each other."""
    nbl = blo_ref.shape[1] // LANES
    lanes = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    desc = desc_ref[:, :]

    # fori_loop, NOT an unrolled python loop: Mosaic stack-allocates the
    # live temporaries of every unrolled iteration at once, and a 1M-tri
    # scene (nbl=37) blew the 16 MB scoped-vmem limit at compile time
    def body(j, _):
        off = pl.multiple_of(j * LANES, LANES)
        lo = blo_ref[:, pl.ds(off, LANES)]
        hi = bhi_ref[:, pl.ds(off, LANES)]
        ok = _frustum_pass(desc, lo, hi)
        ok = ok & ((j * LANES + lanes) < n_blocks)
        mask_ref[0, 0, pl.ds(off, LANES)] = jnp.any(
            ok, axis=0, keepdims=True).astype(jnp.int32)[0]
        return 0

    lax.fori_loop(0, nbl, body, 0)


CULL_CHUNK = 32   # K1b worklist blocks compacted per chunk (scratch size)


def _cull_kernel(nblk_ref, wl_ref, desc_ref, llo_ref, lhi_ref, keys_ref,
                 cnt_ref, tmp_ref, *, n_leaves, k_cap, max_blocks,
                 leaf_bits=_LEAF_BITS, chunk_blocks=CULL_CHUNK):
    """K1b: fine tier — walk this group's surviving-block worklist (SMEM,
    cheap scalar reads), frustum-test the 128 leaves of each block, and
    write each block's per-tile survivor keys to a SLOT-ALIGNED scratch
    column, merging survivors into a per-tile key accumulator one CHUNK
    of worklist blocks at a time.

    CHUNKED compaction (r4): the scratch holds only chunk_blocks slots
    (not max_blocks), and each chunk's slot-aligned keys are butterfly-
    compacted together with the running accumulator (a carried
    (TB, ACCp) value), then truncated back to ACCp. This makes the
    worklist depth max_blocks a pure SMEM-list bound: VMEM scratch and
    butterfly register pressure are FIXED (the old single full-width
    compaction needed ~5 live (TB, max_blocks*128) i32 temporaries —
    20 MB at max_blocks=1024, over the 16 MB VMEM ceiling), and the
    compaction cost now scales with the group's LIVE block count rather
    than the static max_blocks. Deep worklists for wide frusta
    (from-light shadow bundles, grid16-scale scenes with >256 blocks)
    become affordable, which is what lets every bench phase trace exact.

    Earlier designs, both measured worse: per-(tile, block) 256-lane
    butterflies under lax.cond (43 ms on bunny — 16k tiny compactions),
    and one full-width (TB, max_blocks*128) compaction (VMEM ceiling at
    depth >256 and cost independent of live count)."""
    lanes = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    nblk = jnp.minimum(nblk_ref[0, 0, 0], max_blocks)
    desc = desc_ref[:, :]

    chunk = min(chunk_blocks, max_blocks)
    W = chunk * LANES
    # accumulator width: key budget rounded up to a lane multiple
    accp = max(-(-k_cap // LANES) * LANES, LANES)
    # static fast path: one chunk covers the worklist AND is wide enough
    # to slice the accumulator from — no merge, old single-pass behavior
    single = max_blocks <= chunk and W >= accp
    mw = W if single else accp + W
    lanes_m = lax.broadcasted_iota(jnp.int32, (TB, mw), 1)
    nchunks = (nblk + chunk - 1) // chunk

    def chunk_body(c, carry):
        acc, total = carry
        tmp_ref[:, :] = jnp.full((TB, W), _I32MAX, jnp.int32)
        base = c * chunk

        def wl_body(j, _):
            blk = wl_ref[0, 0, base + j]
            off_s = pl.multiple_of(j * LANES, LANES)
            off_l = pl.multiple_of(blk * LANES, LANES)
            lo = llo_ref[:, pl.ds(off_l, LANES)]      # (3, 128)
            hi = lhi_ref[:, pl.ds(off_l, LANES)]
            passed = _frustum_pass(desc, lo, hi)
            passed = passed & ((blk * LANES + lanes) < n_leaves)

            # conservative origin-box -> leaf-box distance (lower bound
            # on any tile ray's t to reach the leaf, for unit directions)
            g2 = jnp.zeros((TB, LANES), jnp.float32)
            for k in range(3):
                gk = jnp.maximum(
                    desc[:, _D_OLO + k:_D_OLO + k + 1] - hi[k:k + 1, :],
                    lo[k:k + 1, :] - desc[:, _D_OHI + k:_D_OHI + k + 1])
                gk = jnp.maximum(gk, 0.0)
                g2 = g2 + gk * gk
            lb = jnp.sqrt(g2)
            # reach cap: a leaf farther than every ray's world-distance
            # bound (root-box exit x |d|, or the occlusion cutoff) can
            # never be hit — drop it here so it neither costs MT work nor
            # counts toward the overflow budget (from-light shadow frusta
            # sweep far past the receivers without this)
            passed = passed & (lb < desc[:, _D_TCAP:_D_TCAP + 1])
            lbb = lax.bitcast_convert_type(lb, jnp.int32)
            # truncating MORE mantissa bits for bigger scenes keeps the
            # decoded lb a LOWER bound (floats round toward zero), so
            # gates and near-to-far ordering stay conservative
            key_all = ((lbb >> leaf_bits) << leaf_bits) | (
                blk * LANES + lanes)
            tmp_ref[:, pl.ds(off_s, LANES)] = jnp.where(
                passed, key_all, _I32MAX)
            return 0

        jmax = jnp.minimum(nblk - base, chunk)
        lax.fori_loop(0, jmax, wl_body, 0)

        chunkv = tmp_ref[:, :]
        cnt_c = jnp.sum((chunkv != _I32MAX).astype(jnp.int32), axis=1,
                        keepdims=True)
        if single:
            # one chunk covers the whole worklist: compact it directly
            comp = _compact_left(chunkv, lanes_m)
            comp = jnp.where(lanes_m < cnt_c, comp, _I32MAX)
            return comp[:, :accp], cnt_c
        # acc holds min(total, accp) live keys; merge, compact, mask the
        # duplicate tail the butterfly moves leave behind, re-truncate
        stored = jnp.minimum(total, accp)
        merged = jnp.concatenate([acc, chunkv], axis=1)
        comp = _compact_left(merged, lanes_m)
        comp = jnp.where(lanes_m < stored + cnt_c, comp, _I32MAX)
        return comp[:, :accp], total + cnt_c

    acc0 = jnp.full((TB, accp), _I32MAX, jnp.int32)
    tot0 = jnp.zeros((TB, 1), jnp.int32)
    acc, counts = lax.fori_loop(0, nchunks, chunk_body, (acc0, tot0))
    keys_ref[:, :] = acc[:, :k_cap]
    cnt_ref[:, :] = counts


@partial(jax.jit, static_argnames=("k_cap", "interpret", "max_blocks",
                                   "leaf_bits", "chunk_blocks", "span_mult"))
def cull_tiles(aux: PacketAux, posn, negn, thresh, olo, ohi, tcap=None,
               k_cap: int = 256, interpret: bool = False,
               max_blocks: int = 128, leaf_bits: int = _LEAF_BITS,
               chunk_blocks: int = CULL_CHUNK, span_mult: int = 1):
    """Two-level dense frustum cull: per tile the (lb|segment) keys of
    every SPAN-leaf segment whose union AABB intersects the tile frustum
    (unordered, live keys compacted to the front, I32MAX padded) +
    survivor counts.

    Tier 1 (K1a) tests 128-leaf block union boxes per tile GROUP and is
    pure vector math; a tiny XLA pass compacts the surviving block ids
    into per-group worklists; tier 2 (K1b) only touches listed blocks.
    Groups whose worklist overflows max_blocks report count = k_cap+1 on
    all their tiles (callers retrace them).

    posn/negn: (T, 4, 3) relu/negative parts of inward plane normals;
    thresh: (T, 4) min over the tile's origin box of n.o; olo/ohi: (T, 3)
    origin box. Returns (keys (T, >=k_cap) i32, counts (T,) i32).

    span_mult: cull-granularity coarsening — each key covers span_mult
    consecutive SPAN-leaf segments (their union AABB, derived from the
    fine tables by reshape-min/max; consecutive segments are contiguous
    gtab rows, so the fused MT kernel DMAs a coarse segment with ONE
    descriptor). Survivor-heavy incoherent phases trade a few extra MT
    rows for span_mult x fewer DMA issues and a span_mult x narrower
    butterfly compaction."""
    assert 1 <= span_mult <= M_MAX and 128 % span_mult == 0
    T = posn.shape[0]
    GPB = 8        # worklist groups per K1b grid step (overhead amortizer)
    if tcap is None:
        tcap = jnp.full((T,), BVH_FAR, jnp.float32)
    if T % (TB * GPB):
        # pad with always-culling tiles (zero planes, positive threshold)
        pad = TB * GPB - T % (TB * GPB)
        posn = jnp.concatenate([posn, jnp.zeros((pad, 4, 3))], axis=0)
        negn = jnp.concatenate([negn, jnp.zeros((pad, 4, 3))], axis=0)
        thresh = jnp.concatenate([thresh, jnp.ones((pad, 4))], axis=0)
        olo = jnp.concatenate([olo, jnp.zeros((pad, 3))], axis=0)
        ohi = jnp.concatenate([ohi, jnp.zeros((pad, 3))], axis=0)
        tcap = jnp.concatenate([tcap, jnp.zeros((pad,))], axis=0)
    tp = posn.shape[0]
    G = tp // TB
    if span_mult == 1:
        llo, lhi = aux.leaf_lo, aux.leaf_hi
        blo_t, bhi_t = aux.blk_lo, aux.blk_hi
        n_segs = aux.n_segs
        nb = aux.n_blocks
    else:
        # coarse tables: union boxes of span_mult consecutive fine
        # segments (fine Spad is a multiple of 128, so it divides)
        m = span_mult
        Sf = aux.leaf_lo.shape[1]
        llo = aux.leaf_lo.reshape(3, Sf // m, m).min(axis=2)
        lhi = aux.leaf_hi.reshape(3, Sf // m, m).max(axis=2)
        n_segs = -(-aux.n_segs // m)
        smp = -(-llo.shape[1] // LANES) * LANES
        if smp != llo.shape[1]:
            padw = smp - llo.shape[1]
            llo = jnp.concatenate(
                [llo, jnp.full((3, padw), BVH_FAR)], axis=1)
            lhi = jnp.concatenate(
                [lhi, jnp.full((3, padw), -BVH_FAR)], axis=1)
        # coarse block tier: unions per 128 coarse segments (padding
        # segments carry inverted boxes, so they vanish in the min/max)
        nbm = smp // LANES
        blo_t = llo.reshape(3, nbm, LANES).min(axis=2)
        bhi_t = lhi.reshape(3, nbm, LANES).max(axis=2)
        nbp = -(-nbm // LANES) * LANES
        blo_t = jnp.concatenate(
            [blo_t, jnp.full((3, nbp - nbm), BVH_FAR)], axis=1)
        bhi_t = jnp.concatenate(
            [bhi_t, jnp.full((3, nbp - nbm), -BVH_FAR)], axis=1)
        nb = -(-n_segs // LANES)
    lpad = llo.shape[1]
    nbpad = blo_t.shape[1]

    # ONE lane-aligned (T, 128) descriptor row per tile (see _D_* layout):
    # separate tiny unaligned inputs cost ~25 us of padded fetches per
    # grid step and dominated both kernels
    desc = jnp.concatenate([
        posn.reshape(tp, 12), negn.reshape(tp, 12), thresh,
        olo, ohi, tcap.reshape(tp, 1),
        jnp.zeros((tp, 128 - _D_LANES), jnp.float32)], axis=1)

    # --- K1a: coarse block mask per group — plain XLA --------------------
    # A Pallas version of this dense (tile x block) test was grid-step-
    # overhead-bound (~20 us/step x G steps = 4 ms on bunny for ~20 us of
    # vector math); as one fused XLA elementwise+reduce it is essentially
    # free. Explicit broadcasts, not einsum: a K=3 matmul would route to
    # the MXU at 2% depth utilization.
    dist = -thresh[:, :, None]                            # (tp, 4, 1)
    for k in range(3):
        dist = (dist
                + posn[:, :, k, None] * bhi_t[None, k, :]
                + negn[:, :, k, None] * blo_t[None, k, :])
    inb = jnp.arange(nbpad, dtype=jnp.int32) < nb
    blkmask = (jnp.logical_not(jnp.any(dist < 0.0, axis=1))
               & inb).reshape(G, TB, nbpad).any(axis=1).astype(jnp.int32)

    # --- worklist compaction (XLA): surviving block ids per group --------
    m = blkmask > 0
    rank = jnp.cumsum(m, axis=1) - m
    gidx = jnp.arange(G, dtype=jnp.int32)[:, None]
    tgt = gidx * max_blocks + jnp.minimum(rank, max_blocks - 1)
    blk_ids = jnp.broadcast_to(jnp.arange(nbpad, dtype=jnp.int32), m.shape)
    wl = jnp.full((G * max_blocks,), -1, jnp.int32).at[
        jnp.where(m, tgt, G * max_blocks - 1)
    ].max(jnp.where(m, blk_ids, -1)).reshape(G, 1, max_blocks)
    n_blk_g = (rank[:, -1] + m[:, -1]).astype(jnp.int32)
    wl_overflow = n_blk_g > max_blocks

    # --- K1b: fine leaf cull over the worklists --------------------------
    nblk_in = jnp.minimum(n_blk_g, max_blocks).astype(jnp.int32).reshape(
        G, 1, 1)
    keys, cnt = pl.pallas_call(
        partial(_cull_kernel, n_leaves=n_segs, k_cap=k_cap,
                max_blocks=max_blocks, leaf_bits=leaf_bits,
                chunk_blocks=chunk_blocks),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            # (G, 1, max_blocks): trailing block dims must equal the array's
            # (Mosaic tiling check applies to SMEM blocks as well)
            pl.BlockSpec((1, 1, max_blocks), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, lpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, lpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((tp, k_cap), jnp.int32),
            jax.ShapeDtypeStruct((tp, 1), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec((TB, k_cap), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # VMEM, not SMEM: the counts come from one vector reduce
            # (Mosaic can only store scalars to SMEM)
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((TB, min(chunk_blocks, max_blocks) * LANES),
                       jnp.int32)],
        interpret=interpret,
    )(nblk_in, wl, desc, llo, lhi)
    counts = cnt.reshape(tp)
    counts = jnp.where(jnp.repeat(wl_overflow, TB), k_cap + 1, counts)
    return keys[:T], counts[:T]


# --------------------------------------------------------------------------
# K2: sorted early-exit triple-product MT
# --------------------------------------------------------------------------

def _mt_kernel(o_ref, d_ref, geom_ref, lbg_ref, tmax_ref, t_ref, i_ref, *,
               prec=lax.Precision.HIGHEST):
    k4 = geom_ref.shape[1]
    nb = k4 // TRI_BLK

    d3 = d_ref[0]                                     # (3, 256)
    o3 = o_ref[0]
    ox, oy, oz = o3[0:1], o3[1:2], o3[2:3]
    dx, dy, dz = d3[0:1], d3[1:2], d3[2:3]
    cx = oy * dz - oz * dy
    cy = oz * dx - ox * dz
    cz = ox * dy - oy * dx
    ones = jnp.ones((1, TILE), jnp.float32)
    zeros = jnp.zeros((2, TILE), jnp.float32)
    f = jnp.concatenate([d3, cx, cy, cz, o3, ones, zeros], axis=0)  # (12,256)

    tmax = tmax_ref[0, 0, 0]

    def cond(state):
        blk, best_t, best_i = state
        t_far = jnp.max(best_t)
        gate = lbg_ref[0, 0, jnp.minimum(blk, nb - 1)]
        return (blk < nb) & (gate <= t_far)

    def body(state):
        blk, best_t, best_i = state
        g = geom_ref[0, pl.ds(blk * TRI_BLK, TRI_BLK), :]   # (128, 48)
        # Precision >= HIGH: the TPU MXU computes f32 matmuls via bf16
        # passes by default — enough error to flip u/v/det signs on
        # edge-adjacent rays (measured: false hits on bunny silhouettes)
        det = jnp.dot(g[:, 0:12], f, preferred_element_type=jnp.float32,
                      precision=prec)
        up = jnp.dot(g[:, 12:24], f, preferred_element_type=jnp.float32,
                     precision=prec)
        vp = jnp.dot(g[:, 24:36], f, preferred_element_type=jnp.float32,
                     precision=prec)
        tp = jnp.dot(g[:, 36:48], f, preferred_element_type=jnp.float32,
                     precision=prec)
        s = jnp.where(det >= 0, 1.0, -1.0)
        ad = det * s
        us = up * s
        vs = vp * s
        ts = tp * s
        hit = (us >= 0) & (vs >= 0) & (us + vs <= ad) & (ts > 0) & (ad > 0)
        tt = jnp.where(hit, ts / jnp.where(ad > 0, ad, 1.0), BVH_FAR)
        m = jnp.min(tt, axis=0).reshape(1, TILE)
        am = jnp.argmin(tt, axis=0).astype(jnp.int32).reshape(1, TILE)
        better = m < best_t
        best_t = jnp.where(better, m, best_t)
        best_i = jnp.where(better, blk * TRI_BLK + am, best_i)
        return blk + 1, best_t, best_i

    init = (jnp.int32(0),
            jnp.zeros((1, TILE), jnp.float32) + tmax,
            jnp.zeros((1, TILE), jnp.int32))
    _, best_t, best_i = lax.while_loop(cond, body, init)
    t_ref[0, 0, :] = best_t[0]
    i_ref[0, 0, :] = best_i[0]


@partial(jax.jit, static_argnames=("interpret",))
def mt_resolve(o_t, d_t, geom, lbg, tmax, interpret: bool = False):
    """o_t/d_t: (T, 3, 256) centered origins + directions; geom:
    (T, K4, 48) G rows in near-to-far order (zero rows never hit); lbg:
    (T, 1, NB) per-128-tri-block entry-distance gates (in ray-t units);
    tmax: (T, 1, 1) initial per-tile t bound. -> (t (T,256), idx (T,256))."""
    T, k4 = geom.shape[:2]
    nblk = k4 // TRI_BLK
    t_out, i_out = pl.pallas_call(
        _mt_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 3, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k4, 48), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nblk), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, TILE), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, TILE), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(o_t, d_t, geom, lbg, tmax)
    return t_out.reshape(T, TILE), i_out.reshape(T, TILE)


# --------------------------------------------------------------------------
# K2f: fused gather + MT (manual HBM->VMEM leaf DMAs)
# --------------------------------------------------------------------------

def _mt_fused_kernel(offs_ref, cnt_ref, lbg_ref, tmax_ref, f_ref, t0_ref,
                     gtab_ref, t_ref, i_ref, u_ref, v_ref, p_ref, buf_ref,
                     sem_ref, *, k_cap, omap_s=0,
                     prec=lax.Precision.HIGHEST,
                     any_hit=False, tri_blk=TRI_BLK, pack=1, rps=None):
    """Fused gather+MT: per tile, walk the compacted cull list (SMEM),
    DMA each live segment's (SEG_ROWS, 128) G-row block straight from HBM
    into a double-buffered VMEM super-block, and run the triple-product
    MT matmuls on it — no XLA gather materializing a (T, K*4, 48) tensor
    (measured 36 ms on bunny: 48-float rows waste 15/16 of each (8, 128)
    gather granule). Early exit: the NEXT super-block is only DMA'd if its
    distance gate passes the tile's current t_far, so the issued/drained
    DMA sets always match.

    TILE BATCHING: each grid step owns TBM tiles walked by an outer
    fori_loop — the kernel is grid-step-overhead bound (r3 probe: 5.9 us
    per 1-tile step against ~0.2 us of matmul flops), so amortizing the
    fixed step cost over TBM tiles is the single biggest lever on the
    packet hot path.

    offs_ref (TBM,1,k_cap) i32 SMEM: PRE-DECODED gtab row offsets
    (segment*SEG_ROWS, clamped; dead keys point at the all-zero sentinel
    segment) — decoding keys in-kernel cost a load+and+min+mul scalar
    chain per DMA issue, and the issue loop is the kernel's dominant
    term (r4 split probe), so the wrapper now decodes all keys in one
    vector op. cnt_ref (TBM,1,1) SMEM; lbg_ref (TBM,1,nb) f32 SMEM
    per-super-block gates; tmax_ref (TBM,1,1) f32 SMEM; f_ref
    (TBM,12,256) VMEM precomputed per-ray feature rows [d, o x d, o, 1,
    0, 0] (built by fused XLA in the wrapper: in-kernel cross products +
    concat were ~1 us/tile of Mosaic relayouts); t0_ref (TBM,1,256) VMEM
    per-ray INITIAL t bounds — min(t_max, scene-box exit t): a miss ray
    otherwise pins the tile's t_far at BVH_FAR forever and disables the
    gate early-exit for every mixed hit/miss tile (bunny primary hit
    rate is 0.35 — most tiles swept their full cull list);
    gtab_ref (4L+pad, 128)
    f32 in HBM (ANY); buf_ref (2*tri_blk, 128) VMEM scratch; sem_ref (2,)
    DMA semaphores."""
    nb = lbg_ref.shape[2]
    tbm = offs_ref.shape[0]

    def tile_body(ti, _):
        _mt_fused_tile(ti, offs_ref, cnt_ref, lbg_ref, tmax_ref, f_ref,
                       t0_ref, gtab_ref, t_ref, i_ref, u_ref, v_ref, p_ref,
                       buf_ref, sem_ref, k_cap=k_cap, omap_s=omap_s,
                       prec=prec, any_hit=any_hit, nb=nb, tri_blk=tri_blk,
                       pack=pack, rps=rps)
        return 0

    lax.fori_loop(0, tbm, tile_body, 0)


def _mt_fused_tile(ti, offs_ref, cnt_ref, lbg_ref, tmax_ref, f_ref, t0_ref,
                   gtab_ref, t_ref, i_ref, u_ref, v_ref, p_ref, buf_ref,
                   sem_ref, *, k_cap, omap_s, prec, any_hit,
                   nb, tri_blk=TRI_BLK, pack=1, rps=None):
    if rps is None:
        rps = SEG_ROWS // pack       # gtab rows per (fine) segment
    kpb = tri_blk // rps             # keys (segments) per super-block
    count = jnp.minimum(cnt_ref[ti, 0, 0], k_cap)
    nsb = (count + kpb - 1) // kpb

    f = f_ref[pl.ds(ti, 1)][0]                        # (12, 256)

    tmax = tmax_ref[ti, 0, 0]
    rows = lax.broadcasted_iota(jnp.int32, (tri_blk, 1), 0)

    # BRANCH-FREE DMA loops: every slot of every walked super-block is
    # DMA'd unconditionally; dead keys (I32MAX inside an overflow group's
    # [0, count), or the padding tail of the last block) were pre-decoded
    # by the wrapper to the all-zero SENTINEL segment's row offset
    # (det = 0 -> never hits, and the `live` mask re-guards the tail
    # anyway). The previous per-slot live/dead branching tripled the
    # scalar-loop work that dominates this kernel (r3 probe: per-tile
    # cost ~5.8 us against ~0.2 us of matmul flops — batching tiles per
    # grid step changed nothing, so the cost is the per-tile scalar body
    # itself). Pre-decoded offsets are always in bounds, which keeps OOB
    # descriptors away from the DMA engine (an OOB descriptor kills the
    # TPU worker).

    def seg_dma(sb, i, slot):
        row = pl.multiple_of(offs_ref[ti, 0, sb * kpb + i], rps)
        return pltpu.make_async_copy(
            gtab_ref.at[pl.ds(row, rps), :],
            buf_ref.at[pl.ds(slot * tri_blk + i * rps, rps), :],
            sem_ref.at[slot],
        )

    def issue(sb, slot):
        for i in range(kpb):
            seg_dma(sb, i, slot).start()

    def drain(sb, slot):
        # ONE aggregate wait per super-block: all kpb copies of a slot
        # signal the SAME per-slot semaphore (DMA semaphores count bytes),
        # so a single descriptor covering the whole (tri_blk, 128) buffer
        # half waits for exactly the sum of the segment copies. The
        # previous per-leaf drain re-ran the full scalar address
        # computation (SMEM key load + decode) per leaf just to wait —
        # and the scalar loop, not the matmuls, dominates this kernel
        # (r3 ablation probe). Both descriptor halves point at buf_ref
        # (shape (2*tri_blk, 128)) — only the BYTE COUNT matters for a
        # wait, and a gtab_ref source would read out of bounds on scenes
        # with fewer than tri_blk gtab rows.
        off = pl.multiple_of(slot * tri_blk, tri_blk)
        pltpu.make_async_copy(
            buf_ref.at[pl.ds(0, tri_blk), :],
            buf_ref.at[pl.ds(off, tri_blk), :],
            sem_ref.at[slot],
        ).wait()

    @pl.when(nsb > 0)
    def _():
        issue(0, 0)

    def cond(state):
        return state[1]

    def body(state):
        sb, _, best_t, best_i = state[:4]
        slot = lax.rem(sb, 2)
        drain(sb, slot)
        # issue the next super-block BEFORE computing this one (overlap);
        # gate with the pre-compute t_far so issued == drained even when
        # this block's hits would have culled it (conservative)
        t_far = jnp.max(best_t)
        gate_n = lbg_ref[ti, 0, jnp.minimum(sb + 1, nb - 1)]
        # NaN-safe: a NaN gate (degenerate tile: non-finite ray data makes
        # maxd NaN) must PASS, not stop the walk — `gate <= t_far` is False
        # for NaN and silently truncated live tiles (missed shadow hits)
        nxt = (sb + 1 < nsb) & jnp.logical_not(gate_n > t_far)
        if any_hit:
            # occlusion query: a ray is done at ANY hit below tmax, so the
            # tile stops once every ray's best t dropped below the cutoff
            nxt = nxt & (t_far >= tmax)

        @pl.when(nxt)
        def _():
            issue(sb + 1, 1 - slot)

        off = pl.multiple_of(slot * tri_blk, tri_blk)
        g = buf_ref[pl.ds(off, tri_blk), :]               # (tri_blk, 128)
        live = (sb * tri_blk + rows) < count * rps

        def half(base, pcol, wcol):
            """MT for the tris at feature lanes [base, base+48) of every
            row: -> (tt, uu, vv, pidf) (tri_blk, TILE), tt=BVH_FAR on
            miss. pcol = bit-cast prim-id lane, wcol = first omap word
            lane (layout depends on pack — see PacketAux.gtab_pad)."""
            if prec == "vpu":
                # depth-12 "matmuls" as 48 broadcast FMAs on the VPU: the
                # MXU runs K=12 dots at ~9% depth utilization and f32
                # needs 6 bf16 passes (HIGHEST) for exactness — the VPU
                # does the same work in native f32 with no precision hack
                det = jnp.zeros((tri_blk, TILE), jnp.float32)
                up = jnp.zeros((tri_blk, TILE), jnp.float32)
                vp = jnp.zeros((tri_blk, TILE), jnp.float32)
                tp = jnp.zeros((tri_blk, TILE), jnp.float32)
                for kk in range(12):
                    fk = f[kk:kk + 1, :]                      # (1, 256)
                    det = det + g[:, base + kk:base + kk + 1] * fk
                    up = up + g[:, base + 12 + kk:base + 13 + kk] * fk
                    vp = vp + g[:, base + 24 + kk:base + 25 + kk] * fk
                    tp = tp + g[:, base + 36 + kk:base + 37 + kk] * fk
            else:
                # see _mt_kernel: >= HIGH precision or the MXU's bf16
                # passes manufacture hits on edge-adjacent rays
                det = jnp.dot(g[:, base:base + 12], f,
                              preferred_element_type=jnp.float32,
                              precision=prec)
                up = jnp.dot(g[:, base + 12:base + 24], f,
                             preferred_element_type=jnp.float32,
                             precision=prec)
                vp = jnp.dot(g[:, base + 24:base + 36], f,
                             preferred_element_type=jnp.float32,
                             precision=prec)
                tp = jnp.dot(g[:, base + 36:base + 48], f,
                             preferred_element_type=jnp.float32,
                             precision=prec)
            s = jnp.where(det >= 0, 1.0, -1.0)
            ad = det * s
            us = up * s
            vs = vp * s
            ts = tp * s
            hit = ((us >= 0) & (vs >= 0) & (us + vs <= ad) & (ts > 0)
                   & (ad > 0))
            inv_ad = 1.0 / jnp.where(ad > 0, ad, 1.0)
            if omap_s:
                # opacity-micromap alpha test (≙ tiny_bvh.h:8514-8522):
                # the S*S bit grid rides in padding lanes of the same G
                # rows, 16 bits per f32 word (exact under float->int
                # conversion)
                S = omap_s
                iu = jnp.clip((us * inv_ad * S).astype(jnp.int32), 0, S - 1)
                iv = jnp.clip((vs * inv_ad * S).astype(jnp.int32), 0, S - 1)
                b = iu * S + iv                          # (tri_blk, 256)
                nw = (S * S + 15) // 16
                word = jnp.zeros_like(b)
                for w in range(nw):
                    gw = g[:, wcol + w:wcol + w + 1].astype(jnp.int32)
                    word = jnp.where((b >> 4) == w, gw, word)
                hit = hit & (((word >> (b & 15)) & 1) > 0)
            tt = jnp.where(hit & live, ts * inv_ad, BVH_FAR)
            pidf = g[:, pcol:pcol + 1]                    # (tri_blk, 1)
            return tt, us * inv_ad, vs * inv_ad, pidf

        nw0 = (omap_s * omap_s + 15) // 16 if omap_s else 0
        if pack == 2:
            ttA, uA, vA, pfA = half(0, 96, 98)
            ttB, uB, vB, pfB = half(48, 97, 98 + nw0)
            isB = ttB < ttA
            tt = jnp.where(isB, ttB, ttA)
            uu = jnp.where(isB, uB, uA)
            vv = jnp.where(isB, vB, vA)
            gp = jnp.where(
                isB, lax.bitcast_convert_type(pfB, jnp.int32),
                lax.bitcast_convert_type(pfA, jnp.int32))
        else:
            tt, uu, vv, pf = half(0, 48 + nw0, 48)
            gp = lax.bitcast_convert_type(pf, jnp.int32)
        m = jnp.min(tt, axis=0).reshape(1, TILE)
        am = jnp.argmin(tt, axis=0).astype(jnp.int32).reshape(1, TILE)
        # barycentrics of the argmin row via one-hot select — recovering
        # u/v here kills the XLA post-pass that re-intersected winners
        # (per-ray gathers of 3x(4L,3) tables + a second MT)
        oh = (rows == am)                                  # (tri_blk, 256)
        u_blk = jnp.sum(jnp.where(oh, uu, 0.0), axis=0, keepdims=True)
        v_blk = jnp.sum(jnp.where(oh, vv, 0.0), axis=0, keepdims=True)
        # winner's global prim id from the G-row payload lane (same
        # one-hot trick as u/v): the wrapper needs no leaf_prim gather
        p_blk = jnp.sum(jnp.where(oh, gp, 0), axis=0, keepdims=True)
        better = m < best_t
        best_t = jnp.where(better, m, best_t)
        best_i = jnp.where(better, sb * tri_blk + am, best_i)
        best_u = jnp.where(better, u_blk, state[4])
        best_v = jnp.where(better, v_blk, state[5])
        best_p = jnp.where(better, p_blk, state[6])
        return sb + 1, nxt, best_t, best_i, best_u, best_v, best_p

    # per-ray initial bound min(t_max, scene exit): misses settle at their
    # exit t (prim stays -1), so t_far reflects real geometry and the gate
    # early-exit fires even for tiles with sky rays
    init = (jnp.int32(0), nsb > 0,
            t0_ref[pl.ds(ti, 1)][0],
            jnp.zeros((1, TILE), jnp.int32),
            jnp.zeros((1, TILE), jnp.float32),
            jnp.zeros((1, TILE), jnp.float32),
            jnp.full((1, TILE), -1, jnp.int32))
    (_, _, best_t, best_i, best_u, best_v,
     best_p) = lax.while_loop(cond, body, init)
    t_ref[pl.ds(ti, 1), 0, :] = best_t
    i_ref[pl.ds(ti, 1), 0, :] = best_i
    u_ref[pl.ds(ti, 1), 0, :] = best_u
    v_ref[pl.ds(ti, 1), 0, :] = best_v
    p_ref[pl.ds(ti, 1), 0, :] = best_p


@partial(jax.jit, static_argnames=("k_cap", "interpret", "omap_s",
                                   "mt_precision", "any_hit",
                                   "tiles_per_step", "tri_blk", "pack",
                                   "rps"))
def mt_resolve_fused(offs, counts, lbg, tmax, o_t, d_t, gtab_flat,
                     k_cap: int, interpret: bool = False, omap_s: int = 0,
                     mt_precision: str = "highest", any_hit: bool = False,
                     tiles_per_step: int = 8,
                     tri_blk: int = TRI_BLK, t0=None, pack: int = 1,
                     rps: int | None = None):
    """offs (T, k_cap) i32 PRE-DECODED gtab row offsets (segment *
    rows_per_seg, clamped in bounds; dead keys -> the sentinel segment's
    offset); counts (T,) i32; lbg (T, 1, nb)
    f32 super-block gates (zeros when unsorted); tmax (T, 1) f32; o_t/d_t
    (T, 3, 256) centered origins/dirs; gtab_flat (rows, 128) f32 with
    pack tris per row (PacketAux.gtab_pad — pass pack=aux.pack);
    t0 optional (T, 256) f32 per-ray INITIAL t bounds (defaults to the
    broadcast tile tmax) — pass min(t_max, scene-box exit t) so miss rays
    don't pin the gate early-exit's t_far at BVH_FAR (misses then settle
    at their exit t with prim = -1; callers must treat prim < 0 as the
    miss signal, not t >= BVH_FAR).
    -> (t (T, 256), idx (T, 256), u (T, 256), v (T, 256), prim (T, 256))
    with idx = super_block*tri_blk + row into the walked triangle rows
    (segment-granularity: key ki covers rows [ki*SEG_ROWS, (ki+1)*SEG_ROWS));
    u/v are the winner's
    barycentrics; prim the winner's global prim id (-1 = miss).

    tiles_per_step: tiles walked per grid step (fixed grid-step cost is
    the kernel's dominant term — see _mt_fused_kernel).

    rps: gtab rows DMA'd per key (default SEG_ROWS // pack; span-coarsened
    callers pass span_mult x that — see cull_tiles span_mult)."""
    T = offs.shape[0]
    nb = lbg.shape[2]
    if rps is None:
        rps = SEG_ROWS // pack
    # padding tiles carry count = 0, so their offsets are never DMA'd;
    # 0 is trivially rps-aligned (the in-kernel pl.multiple_of claim)
    sentinel = 0
    if t0 is None:
        t0 = jnp.broadcast_to(tmax.reshape(T, 1), (T, TILE))
    tbm = max(1, min(tiles_per_step, T))
    if T % tbm:
        padt = tbm - T % tbm
        offs = jnp.concatenate(
            [offs, jnp.full((padt, k_cap), sentinel, offs.dtype)], axis=0)
        counts = jnp.concatenate(
            [counts, jnp.zeros((padt,), counts.dtype)], axis=0)
        lbg = jnp.concatenate(
            [lbg, jnp.full((padt, 1, nb), jnp.inf, lbg.dtype)], axis=0)
        tmax = jnp.concatenate(
            [tmax, jnp.zeros((padt, 1), tmax.dtype)], axis=0)
        o_t = jnp.concatenate(
            [o_t, jnp.zeros((padt, 3, TILE), o_t.dtype)], axis=0)
        d_t = jnp.concatenate(
            [d_t, jnp.zeros((padt, 3, TILE), d_t.dtype)], axis=0)
        t0 = jnp.concatenate(
            [t0, jnp.zeros((padt, TILE), t0.dtype)], axis=0)
    tp = offs.shape[0]
    # per-ray feature rows f = [d, o x d, o, 1, 0, 0] built here as fused
    # XLA: building them in-kernel cost ~1 us/tile of Mosaic relayouts
    ff = jnp.concatenate([
        d_t, jnp.cross(o_t, d_t, axis=1), o_t,
        jnp.ones((tp, 1, TILE), jnp.float32),
        jnp.zeros((tp, 2, TILE), jnp.float32)], axis=1)   # (tp, 12, 256)
    # Mosaic lowers only DEFAULT and HIGHEST dot precisions; "vpu"
    # bypasses the MXU entirely (exact f32 broadcast FMAs)
    prec = lax.Precision.HIGHEST if mt_precision == "highest" else "vpu"
    t_out, i_out, u_out, v_out, p_out = pl.pallas_call(
        partial(_mt_fused_kernel, k_cap=k_cap, omap_s=omap_s, prec=prec,
                any_hit=any_hit, tri_blk=tri_blk, pack=pack, rps=rps),
        grid=(tp // tbm,),
        in_specs=[
            pl.BlockSpec((tbm, 1, k_cap), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tbm, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tbm, 1, nb), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tbm, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tbm, 12, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tbm, 1, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((tp, 1, TILE), jnp.float32),
            jax.ShapeDtypeStruct((tp, 1, TILE), jnp.int32),
            jax.ShapeDtypeStruct((tp, 1, TILE), jnp.float32),
            jax.ShapeDtypeStruct((tp, 1, TILE), jnp.float32),
            jax.ShapeDtypeStruct((tp, 1, TILE), jnp.int32),
        ),
        out_specs=tuple(
            pl.BlockSpec((tbm, 1, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(5)),
        scratch_shapes=[
            pltpu.VMEM((2 * tri_blk, 128), jnp.float32),
            # one byte-counting semaphore per buffer slot (all kpb =
            # tri_blk/SEG_ROWS segment copies of a slot signal it; drain
            # waits once for the sum)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(offs.reshape(tp, 1, k_cap), counts.reshape(tp, 1, 1), lbg,
      tmax.reshape(tp, 1, 1), ff, t0.reshape(tp, 1, TILE), gtab_flat)
    return (t_out.reshape(tp, TILE)[:T], i_out.reshape(tp, TILE)[:T],
            u_out.reshape(tp, TILE)[:T], v_out.reshape(tp, TILE)[:T],
            p_out.reshape(tp, TILE)[:T])


# --------------------------------------------------------------------------
# full pipeline
# --------------------------------------------------------------------------

def _tile_frusta(aux: PacketAux, rays: Rays, t_max):
    """Per-tile frustum descriptors for the cull (shared by the trace
    pipeline and the budget-sizing probes).

    t_max: scalar or (R,) per-ray bound — per-ray bounds are what the
    escalated-retrace pass uses to zero out non-overflowed tiles (their
    reach cap collapses, so their cull lists come back empty and the MT
    stage skips them — a dead tile costs only the fixed grid-step time).

    Returns (posn, negn, thresh, olo, ohi, tcap, dlen, tmax_rt, t0) —
    t0 (T, TILE) is the per-ray initial MT bound min(t_max, scene-box
    exit t) with a small conservative margin (see mt_resolve_fused)."""
    R = rays.o.shape[0]
    T = R // TILE
    o = rays.o.reshape(T, TILE, 3)
    d = rays.d.reshape(T, TILE, 3)
    olo = o.min(axis=1)
    ohi = o.max(axis=1)

    planes = _tile_planes(o[:, 0], d)          # (T, 4, 3)
    posn = jnp.maximum(planes, 0.0)
    negn = jnp.minimum(planes, 0.0)
    # explicit multiply-sum, not einsum: dot_general's TPU f32 default is
    # bf16 multiplies — at large scene scale the rounded plane threshold
    # can wrongly cull boundary-grazing segments
    thresh = ((posn * olo[:, None, :]).sum(-1)
              + (negn * ohi[:, None, :]).sum(-1))

    # per-tile reach cap for the cull: a leaf whose origin-box gap exceeds
    # every ray's own travel bound can never be hit. The bound is
    # min(t_max, root-box exit t) in d units x |d| = world distance; for
    # occlusion segments (t_max = cutoff, unnormalized d) this caps the
    # frustum at the receiver, for primaries at the scene-box exit.
    dlen = jnp.linalg.norm(d, axis=-1)                    # (T, 256)
    tmax_rt = jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), (R,)).reshape(T, TILE)
    root_lo = aux.blk_lo.min(axis=1)                      # (3,)
    root_hi = aux.blk_hi.max(axis=1)
    rdr = rays.rd.reshape(T, TILE, 3)
    tfar_ax = jnp.maximum((root_lo - o) * rdr, (root_hi - o) * rdr)
    tfar_ax = jnp.where(jnp.isnan(tfar_ax), BVH_FAR, tfar_ax)
    t_exit = jnp.maximum(jnp.min(tfar_ax, axis=-1), 0.0)  # (T, 256)
    reach = jnp.minimum(tmax_rt, t_exit) * dlen
    tcap = jnp.max(reach, axis=1)                         # (T,)
    tcap = jnp.where(jnp.isfinite(tcap), tcap * 1.001 + 1e-4, BVH_FAR)
    # per-ray initial MT bound: a hit can't lie beyond the ray's own
    # scene-box exit, so misses settle at the exit t instead of pinning
    # t_far at BVH_FAR (the margin keeps boundary-grazing hits strictly
    # below the init)
    t0 = jnp.minimum(tmax_rt, t_exit * 1.0005 + 1e-4)
    return posn, negn, thresh, olo, ohi, tcap, dlen, tmax_rt, t0


def _decode_keys(keys, leaf_bits=_LEAF_BITS):
    lb = lax.bitcast_convert_type((keys >> leaf_bits) << leaf_bits,
                                  jnp.float32)
    return lb, keys & ((1 << leaf_bits) - 1)


@partial(jax.jit, static_argnames=("max_leaves", "interpret", "retrace",
                                   "wf_cap_factor", "sort", "fused",
                                   "mt_precision", "max_blocks", "any_hit",
                                   "tri_blk", "return_counts", "retrace_ml",
                                   "retrace_blocks", "tiles_per_step",
                                   "span_mult"))
def intersect_packets2(bvh8: BVH8, aux: PacketAux, rays: Rays,
                       max_leaves: int = 256, t_max=BVH_FAR,
                       interpret: bool = False, retrace=True,
                       wf_cap_factor: int = 8, sort: bool = False,
                       fused: bool = True, mt_precision: str = "highest",
                       max_blocks: int = 128, any_hit: bool = False,
                       tri_blk: int = 256, return_counts: bool = False,
                       retrace_ml: int = 0, retrace_blocks: int = 0,
                       tiles_per_step: int = 8, span_mult: int = 1):
    """Packet trace v2. Rays must be (T*256,) grouped into tiles sharing an
    origin box (camera 16x16 scan tiles, or sort_rays_coherent output).
    Returns (Hits, per-tile overflow mask).

    t_max: scalar or (R,) per-ray bound.

    retrace: overflow-handling mode for tiles whose cull survivors
    exceeded the max_leaves budget (their fast-path hits silently drop
    geometry — ≙ the exactness the reference asserts via
    ValidateTraceResult, tiny_bvh_speedtest.cpp:338-381):
      * True / "wavefront" — re-trace overflowed tiles with the
        wavefront engine inside this call (exact, but its per-level cost
        scales with the static cap_factor*R frontier);
      * "packet" — ESCALATED second packet pass at retrace_ml keys
        (default 4*max_leaves) / retrace_blocks worklist depth: non-
        overflowed tiles get t_max = 0 so their reach cap collapses and
        they cull to nothing — a dead tile costs only fixed grid-step
        time, so the escalation costs ~the overflowed tiles' true work.
        Residual overflow (beyond retrace_ml) is reported in the mask;
      * False — fast path only, mask flags the approximate tiles.
    Either retrace mode is skipped entirely via lax.cond when nothing
    overflowed — the common case pays nothing.

    return_counts=True appends the raw per-tile cull survivor counts
    (segments; k_cap+1 flags a block-worklist overflow) to the return —
    the budget-sizing probes read the distribution off this.

    span_mult: cull/DMA granularity — each cull key covers span_mult
    consecutive SPAN-leaf segments, DMA'd with ONE descriptor (the fused
    kernel's issue loop dominates on survivor-heavy tiles). max_leaves
    stays in LEAVES; it must divide SPAN*span_mult. Fused path only."""
    K = max_leaves
    assert fused or span_mult == 1
    assert K % (SPAN * span_mult) == 0 and K >= SPAN * span_mult
    Kk = K // (SPAN * span_mult)   # cull-key (segment) budget
    # MT super-block size: kpb segment keys = kpb*rps gtab rows per
    # matmul block. 256-tri blocks halve the per-iteration fixed cost
    # (drain/issue/gates/epilogue) relative to 128; tiny budgets shrink
    # the block so at least one full super-block exists.
    rps = (SEG_ROWS // aux.pack) * span_mult   # gtab rows per segment
    kpb = max(1, tri_blk // rps)
    while Kk % kpb:
        kpb //= 2
    if not fused:
        # the gathered-layout kernel (mt_resolve) has a fixed TRI_BLK
        # block: its gate vector must be one entry per 128-tri group
        kpb = min(kpb, _KPB)
    tb_eff = kpb * rps
    R = rays.o.shape[0]
    T = R // TILE
    o = rays.o.reshape(T, TILE, 3)
    d = rays.d.reshape(T, TILE, 3)
    (posn, negn, thresh, olo, ohi, tcap, dlen,
     tmax_rt, t0_rt) = _tile_frusta(aux, rays, t_max)

    # segment ids must fit the key low bits: scenes beyond 2^18 segment
    # rows (>4M tris) trade distance-ordering granularity for id range
    leaf_bits = max(_LEAF_BITS,
                    (aux.leaf_lo.shape[1] // span_mult - 1).bit_length())
    keys, counts = cull_tiles(aux, posn, negn, thresh, olo, ohi, tcap,
                              k_cap=Kk, interpret=interpret,
                              max_blocks=max_blocks, leaf_bits=leaf_bits,
                              span_mult=span_mult)
    overflow = counts > Kk

    keys_s = keys[:, :Kk]
    nbk = Kk // kpb
    if sort:
        # near-to-far ordering of every key enables mid-list early exit in
        # K2; the XLA sort costs ~27 ms on 1600x256 keys, so it only pays
        # off for scenes with very long per-tile lists
        keys_s = lax.sort(keys_s, dimension=1)
    elif fused:
        # BLOCK-gate ordering: sort only the Kk/kpb super-blocks of each
        # tile by their min entry distance (a tiny (T, nb) argsort + one
        # block gather — no full key sort). Near-to-far block order makes
        # the kernel's gate early-exit CORRECT mid-list: once the next
        # gate exceeds every ray's best t, all later blocks do too.
        lb0, _ = _decode_keys(keys_s, leaf_bits)
        lb_live = jnp.where(keys_s != _I32MAX, lb0, BVH_FAR)
        lbmin = lb_live.reshape(T, nbk, kpb).min(axis=2)     # (T, nb)
        order = jnp.argsort(lbmin, axis=1)
        keys_s = jnp.take_along_axis(
            keys_s.reshape(T, nbk, kpb), order[..., None], axis=1
        ).reshape(T, Kk)
    lb, segs = _decode_keys(keys_s, leaf_bits)
    live = keys_s != _I32MAX
    lrow = jnp.where(live, segs, 0)

    if not fused:
        # per-triangle row gather straight into kernel layout ((T, K4, 48),
        # no post-gather reshape across the 128-lane padding); dead entries
        # point at an all-zero row (det = 0 -> never hits). gtab_pad's
        # trailing rows (pad leaves + sentinel segment) are already zero,
        # so whole dead segments gather harmlessly; the G rows are its
        # first 48 lanes (no separate (L, 4, 48) copy exists — r4).
        # pack=2 stores tri pairs per 128-lane row; the first 96 lanes
        # reshape straight back to per-tri 48-lane rows in tri order
        gflat = (aux.gtab_pad[:, :96].reshape(-1, 48) if aux.pack == 2
                 else aux.gtab_pad[:, :48])
        zrow = jnp.int32(4 * aux.n_leaf_rows)
        lanes_s = jnp.arange(SEG_ROWS, dtype=jnp.int32)
        tri_idx = jnp.where(
            live[:, :, None],
            jnp.minimum(lrow[:, :, None] * SEG_ROWS + lanes_s, zrow),
            zrow).reshape(T, Kk * SEG_ROWS)
        geom = gflat[tri_idx]                            # (T, K4, 48)

    # block gates in ray-t units: entry distance / max |d| over the tile.
    # Dead blocks gate at +inf so they never pass (t_far itself can reach
    # BVH_FAR when a tile has miss rays)
    maxd = jnp.maximum(dlen.max(axis=1), 1e-20)          # (T,)
    blk_live = live.reshape(T, nbk, kpb).any(axis=2)
    if sort:
        gate = jnp.where(live, lb, BVH_FAR)[:, ::kpb] / maxd[:, None]
    elif fused:
        gate = (jnp.where(live, lb, BVH_FAR)
                .reshape(T, nbk, kpb).min(axis=2) / maxd[:, None])
    else:
        gate = jnp.zeros((T, nbk), jnp.float32)
    # non-finite gates (tiles carrying non-finite rays, e.g. shadow
    # segments spawned from missed primaries) degrade to 0 = always pass
    gate = jnp.where(jnp.isfinite(gate), gate, 0.0)
    lbg = jnp.where(blk_live, gate, jnp.inf).reshape(T, 1, nbk)

    o_c = jnp.transpose(o - aux.center, (0, 2, 1))       # (T, 3, 256)
    d_t = jnp.transpose(d, (0, 2, 1))
    # the kernel's per-tile initial t bound is the tile max: per-ray
    # bounds (escalated retrace) are enforced by the per-ray comparison
    # against tmax_r below
    tmax = tmax_rt.max(axis=1).reshape(T, 1, 1)
    tmax_r = tmax_rt.reshape(R)
    if fused:
        # block reorder scatters live keys out of prefix order: count must
        # cover every live block (dead keys inside are guarded in-kernel);
        # the inf-gated dead tail is skipped by the gate early-exit
        n_live_blk = jnp.sum(blk_live, axis=1)
        cnt_k = jnp.where(jnp.minimum(counts, Kk) > 0, n_live_blk * kpb, 0)
        # pre-decode every key to its clamped gtab row offset (dead keys
        # -> the all-zero sentinel segment): the kernel's DMA-issue loop
        # is its dominant term (r4 split probe), so the per-issue scalar
        # chain shrinks to one SMEM load + descriptor start. The sentinel
        # is the first aligned slot past the real segments — its rows sit
        # in gtab_pad's 2*M_MAX*rps zero tail for any span_mult <= M_MAX
        # (so are the last real segment's overhang rows).
        sent_seg = -(-aux.n_segs // span_mult)
        offs = jnp.where(live, jnp.minimum(lrow, sent_seg),
                         sent_seg).astype(jnp.int32) * rps
        # any-hit keeps the scalar cutoff init: its early stop compares
        # t_far against the cutoff, and an exit-capped init below the
        # cutoff could end the walk before any geometry is tested
        best_t, _, ku, kv, kp = mt_resolve_fused(
            offs, cnt_k, lbg, tmax.reshape(T, 1),
            o_c, d_t, aux.gtab_pad, k_cap=Kk,
            interpret=interpret, omap_s=aux.omap_s,
            mt_precision=mt_precision, any_hit=any_hit,
            tri_blk=tb_eff,
            tiles_per_step=tiles_per_step,
            t0=None if any_hit else t0_rt, pack=aux.pack, rps=rps)
        # prim/u/v all recovered in-kernel: no (R,)-element XLA gathers
        # (each cost milliseconds: random row gathers waste 15/16 of
        # every (8, 128) granule). Misses settle at their exit-t init
        # with prim = -1, so prim — not t — is the miss signal here.
        okf = ((kp >= 0)
               & (best_t < tmax_r.reshape(T, TILE))).reshape(-1)
        hits = Hits(
            t=jnp.where(okf, best_t.reshape(-1), BVH_FAR),
            u=jnp.where(okf, ku.reshape(-1), 0.0),
            v=jnp.where(okf, kv.reshape(-1), 0.0),
            prim=jnp.where(okf, kp.reshape(-1), -1),
            inst=jnp.full(R, -1, jnp.int32),
        )
    else:
        best_t, best_i = mt_resolve(o_c, d_t, geom, lbg, tmax,
                                    interpret=interpret)

        # tri index in the sorted list -> (segment, leaf-in-segment, lane)
        pos = best_i // SEG_ROWS
        within = best_i % SEG_ROWS
        lane = within & 3
        trow = jnp.arange(T, dtype=jnp.int32)[:, None]
        seg = lrow.reshape(-1)[trow * Kk + pos]
        row = jnp.minimum(seg * SPAN + (within >> 2),
                          bvh8.leaf_prim.shape[0] - 1)
        best_pk = row * 4 + lane
        best_t = jnp.where(best_t < tmax_r.reshape(T, TILE), best_t,
                           BVH_FAR)
        hits, _ = _finish(bvh8, rays, best_t, best_pk, overflow, R, T)

    if retrace == "packet":
        ov_ray = jnp.repeat(overflow, TILE)
        ml2 = retrace_ml or 4 * max_leaves
        mb2 = retrace_blocks or max_blocks

        def do_retrace(_):
            h2, ov2 = intersect_packets2(
                bvh8, aux, rays, max_leaves=ml2,
                t_max=jnp.where(ov_ray, tmax_r, 0.0),
                interpret=interpret, retrace=False, sort=sort, fused=fused,
                mt_precision=mt_precision, max_blocks=mb2, any_hit=any_hit,
                tri_blk=tri_blk, span_mult=span_mult)
            return h2.t, h2.u, h2.v, h2.prim, ov2

        def skip(_):
            return (hits.t, hits.u, hits.v, hits.prim,
                    jnp.zeros((T,), bool))

        wt, wu, wv, wp, ov2 = lax.cond(
            jnp.any(overflow), do_retrace, skip, 0)
        hits = Hits(
            t=jnp.where(ov_ray, wt, hits.t),
            u=jnp.where(ov_ray, wu, hits.u),
            v=jnp.where(ov_ray, wv, hits.v),
            prim=jnp.where(ov_ray, wp, hits.prim),
            inst=hits.inst,
        )
        # only tiles whose ESCALATED budget also overflowed stay flagged
        overflow = overflow & ov2
    elif retrace:
        from tinybvh_tpu.traverse.wavefront import intersect_wavefront

        ov_ray = jnp.repeat(overflow, TILE)

        # REAL runtime branch: the wavefront's per-level ops scale with
        # its static cap_factor*R frontier (~4.6 s/call on 409k rays at
        # cap 8), so running it unconditionally would dwarf the packet
        # kernels. lax.cond skips it entirely when no tile overflowed —
        # the common case pays nothing.
        def do_retrace(_):
            wf_tmax = jnp.where(ov_ray, tmax_r, 0.0)
            wf_hits, wf_ovf = intersect_wavefront(
                bvh8, rays, t_max=wf_tmax, cap_factor=wf_cap_factor,
                omap=aux.omap)
            return (wf_hits.t, wf_hits.u, wf_hits.v, wf_hits.prim, wf_ovf)

        def skip(_):
            return (hits.t, hits.u, hits.v, hits.prim,
                    jnp.zeros((), bool))

        wt, wu, wv, wp, wf_ovf = lax.cond(
            jnp.any(overflow), do_retrace, skip, 0)
        hits = Hits(
            t=jnp.where(ov_ray, wt, hits.t),
            u=jnp.where(ov_ray, wu, hits.u),
            v=jnp.where(ov_ray, wv, hits.v),
            prim=jnp.where(ov_ray, wp, hits.prim),
            inst=hits.inst,
        )
        # after an exact retrace, report only tiles that may STILL be
        # inexact: retraced tiles whose wavefront pass itself overflowed
        overflow = overflow & wf_ovf
    if return_counts:
        return hits, overflow, counts
    return hits, overflow


def _finish(bvh8, rays, best_t, best_pk, overflow, R, T, kuv=None):
    """Recover (prim, u, v) for the winning packed (leaf*4+lane).

    kuv: (u, v) (T, 256) barycentrics already recovered in-kernel (fused
    path) — skips the per-ray geometry gathers + re-intersection."""
    lp = bvh8.leaf_prim
    ok = best_t < BVH_FAR
    wl = jnp.where(ok, best_pk >> 2, 0)
    wk = jnp.where(ok, best_pk & 3, 0)
    prim = jnp.where(ok, lp[wl, wk], -1).reshape(-1)
    okf = ok.reshape(-1)
    if kuv is not None:
        uu = kuv[0].reshape(-1)
        vv = kuv[1].reshape(-1)
    else:
        from tinybvh_tpu.core.intersect import moller_trumbore, tri_edges

        v0t, e1t, e2t = tri_edges(bvh8.leaf_tris)
        _, _, uu, vv = moller_trumbore(
            rays.o, rays.d, v0t[wl.reshape(-1), wk.reshape(-1)],
            e1t[wl.reshape(-1), wk.reshape(-1)],
            e2t[wl.reshape(-1), wk.reshape(-1)],
            jnp.full(R, BVH_FAR),
        )
    hits = Hits(
        t=jnp.where(okf, best_t.reshape(-1), BVH_FAR),
        u=jnp.where(okf, uu, 0.0),
        v=jnp.where(okf, vv, 0.0),
        prim=prim,
        inst=jnp.full(R, -1, jnp.int32),
    )
    return hits, overflow


@partial(jax.jit, static_argnames=("max_leaves", "interpret", "retrace",
                                   "wf_cap_factor", "max_blocks",
                                   "retrace_ml", "retrace_blocks",
                                   "tri_blk", "span_mult"))
def is_occluded_packets2(bvh8: BVH8, aux: PacketAux, origin, points,
                         cutoff: float = 1.0 - 1e-3, max_leaves: int = 256,
                         interpret: bool = False, retrace=True,
                         wf_cap_factor: int = 8, max_blocks: int = 128,
                         retrace_ml: int = 0, retrace_blocks: int = 0,
                         tri_blk: int = 256, span_mult: int = 1):
    """Any-hit occlusion for segments origin->points sharing ONE origin,
    points in tile order (e.g. shadow rays traced FROM a point light).
    Directions stay unnormalized so t is the segment fraction; the t_max
    cutoff doubles as the early-exit bound (every tile starts with
    t_far = cutoff, so K2 stops at the first blocks that occlude).
    ~ IsOccluded (tiny_bvh.h:3382-3453). Returns ((R,) occluded, (T,)
    overflow); retrace modes as in intersect_packets2 (True/"wavefront"
    = any-hit wavefront, "packet" = escalated-budget second pass)."""
    points = jnp.asarray(points, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)
    d = points - origin[None, :]
    o = jnp.broadcast_to(origin, d.shape)
    from tinybvh_tpu.core.rays import make_rays

    rays = make_rays(o, d)
    hits, overflow = intersect_packets2(
        bvh8, aux, rays, max_leaves=max_leaves, t_max=cutoff,
        interpret=interpret,
        retrace="packet" if retrace == "packet" else False,
        max_blocks=max_blocks, any_hit=True, retrace_ml=retrace_ml,
        retrace_blocks=retrace_blocks, tri_blk=tri_blk,
        span_mult=span_mult)
    occ = (hits.prim >= 0) & (hits.t < cutoff)
    if retrace and retrace != "packet":
        from tinybvh_tpu.traverse.wavefront import intersect_wavefront

        ov_ray = jnp.repeat(overflow, TILE)

        def do_retrace(_):
            wf_tmax = jnp.where(ov_ray, jnp.float32(cutoff), 0.0)
            _, wf_occ, wf_ovf = intersect_wavefront(
                bvh8, rays, t_max=wf_tmax, cap_factor=wf_cap_factor,
                any_hit=True, omap=aux.omap)
            return wf_occ, wf_ovf

        def skip(_):
            return occ, jnp.zeros((), bool)

        wf_occ, wf_ovf = lax.cond(jnp.any(overflow), do_retrace, skip, 0)
        occ = jnp.where(ov_ray, wf_occ, occ)
        overflow = overflow & wf_ovf
    return occ, overflow


@partial(jax.jit, static_argnames=("max_leaves", "interpret", "retrace",
                                   "wf_cap_factor", "max_blocks",
                                   "retrace_ml", "retrace_blocks",
                                   "tri_blk", "span_mult"))
def is_occluded_packets2_sorted(bvh8: BVH8, aux: PacketAux, origin, points,
                                cutoff: float = 1.0 - 1e-3,
                                max_leaves: int = 256,
                                interpret: bool = False, retrace=True,
                                wf_cap_factor: int = 8,
                                max_blocks: int = 128,
                                retrace_ml: int = 0,
                                retrace_blocks: int = 0,
                                tri_blk: int = 256, span_mult: int = 1):
    """is_occluded_packets2 with DIRECTION-sorted bundles: shadow targets
    regrouped by quantized-direction morton order before tiling.

    Pixel-order tiles put silhouette/depth-discontinuity pixels — whose
    hit points scatter across the scene — into the same bundle, giving a
    few pathologically wide frusta (bunny bench: 4 tiles sweep >4096
    leaves while the p90 tile sweeps 57 segments). For a SHARED origin,
    direction order is exactly frustum tightness: points along the same
    light direction form a narrow cone no matter how far apart they sit,
    so sorted bundles bound the worst tile near the average one. Returns
    ((R,) occluded in input order, (R,) residual-overflow mask)."""
    points = jnp.asarray(points, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)
    d = points - origin[None, :]
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-20)
    from tinybvh_tpu.traverse.packet import _spread10

    q = jnp.clip(((dn + 1.0) * 0.5 * 1024.0).astype(jnp.int32), 0, 1023)
    key = (_spread10(q[:, 0]) | (_spread10(q[:, 1]) << 1)
           | (_spread10(q[:, 2]) << 2))
    order = jnp.argsort(key)
    # scatter, not a second argsort: halves the per-call sort cost
    inverse = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    occ, overflow = is_occluded_packets2(
        bvh8, aux, origin, points[order], cutoff=cutoff,
        max_leaves=max_leaves, interpret=interpret, retrace=retrace,
        wf_cap_factor=wf_cap_factor, max_blocks=max_blocks,
        retrace_ml=retrace_ml, retrace_blocks=retrace_blocks,
        tri_blk=tri_blk, span_mult=span_mult)
    return occ[inverse], jnp.repeat(overflow, TILE)[inverse]


@partial(jax.jit, static_argnames=("max_leaves", "interpret", "retrace",
                                   "wf_cap_factor", "any_hit", "t_max_static",
                                   "max_blocks", "retrace_ml",
                                   "retrace_blocks", "tri_blk", "span_mult"))
def intersect_packets2_sorted(bvh8: BVH8, aux: PacketAux, rays: Rays,
                              scene_lo, scene_hi, max_leaves: int = 256,
                              interpret: bool = False, retrace=True,
                              wf_cap_factor: int = 8, any_hit: bool = False,
                              t_max_static: float = BVH_FAR,
                              max_blocks: int = 128, retrace_ml: int = 0,
                              retrace_blocks: int = 0, tri_blk: int = 256,
                              span_mult: int = 1):
    """Packet trace v2 for INCOHERENT rays: coherence-sort into tiles
    (direction cell + origin morton), trace, scatter back to input order.
    Returns (Hits in input order, per-ray fallback mask).

    max_blocks: cull worklist depth — incoherent tiles sweep wider frusta
    than camera tiles, so callers tracing bounce rays should pass the
    same deepened worklist they use for shadow bundles (the bench's
    diffuse phase overflowed 43% of its rays at the 128 default)."""
    from tinybvh_tpu.traverse.packet import sort_rays_coherent

    R = rays.o.shape[0]
    scene_lo = jnp.asarray(scene_lo, jnp.float32)
    scene_hi = jnp.asarray(scene_hi, jnp.float32)
    order, inverse = sort_rays_coherent(rays.o, rays.d, scene_lo, scene_hi)
    rs = Rays(o=rays.o[order], d=rays.d[order], rd=rays.rd[order],
              mask=rays.mask[order])
    hits, overflow = intersect_packets2(
        bvh8, aux, rs, max_leaves=max_leaves, interpret=interpret,
        retrace=retrace, wf_cap_factor=wf_cap_factor, any_hit=any_hit,
        t_max=t_max_static, max_blocks=max_blocks, retrace_ml=retrace_ml,
        retrace_blocks=retrace_blocks, tri_blk=tri_blk,
        span_mult=span_mult)
    ov_ray = jnp.repeat(overflow, TILE)[inverse]
    return Hits(t=hits.t[inverse], u=hits.u[inverse], v=hits.v[inverse],
                prim=hits.prim[inverse], inst=hits.inst[inverse]), ov_ray
