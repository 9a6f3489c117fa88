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
_LEAF_BITS = 18          # leaf id in the low bits of a cull key (<= 262k rows)
_LEAF_MASK = (1 << _LEAF_BITS) - 1
TB = 8                   # tiles per K1 grid step
LANES = 128              # leaves per K1 lane block
TRI_BLK = 128            # triangles per K2 matmul block (= 32 leaves)


@struct.dataclass
class PacketAux:
    """Per-BVH8 precomputed tables for the packet2 pipeline."""

    leaf_lo: jnp.ndarray   # (3, Lpad) f32 leaf AABB lows  (+FAR padding)
    leaf_hi: jnp.ndarray   # (3, Lpad) f32 leaf AABB highs (-FAR padding)
    gtab: jnp.ndarray      # (L, 4, 48) f32 per-tri [G_det|G_u|G_v|G_t] rows
    center: jnp.ndarray    # (3,) f32 scene center subtracted from gtab

    @property
    def n_leaves(self):
        return self.gtab.shape[0]


@jax.jit
def build_packet_aux(bvh8: BVH8) -> PacketAux:
    """Leaf AABBs + centered triple-product rows (one-time per BVH)."""
    lt = bvh8.leaf_tris                      # (L, 4, 3, 3)
    valid = (bvh8.leaf_prim >= 0)[..., None, None]  # (L, 4, 1, 1)
    big = jnp.where(valid, lt, BVH_FAR)
    small = jnp.where(valid, lt, -BVH_FAR)
    lo = big.min(axis=(1, 2))                # (L, 3)
    hi = small.max(axis=(1, 2))
    center = (lo.min(axis=0) + hi.max(axis=0)) * 0.5

    L = lt.shape[0]
    lpad = -(-L // LANES) * LANES
    pad = lpad - L
    lo_p = jnp.concatenate([lo, jnp.full((pad, 3), BVH_FAR)], axis=0)
    hi_p = jnp.concatenate([hi, jnp.full((pad, 3), -BVH_FAR)], axis=0)

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
    return PacketAux(leaf_lo=lo_p.T, leaf_hi=hi_p.T, gtab=gtab,
                     center=center)


# --------------------------------------------------------------------------
# K1: dense frustum cull + butterfly compaction
# --------------------------------------------------------------------------

def _cull_kernel(posn_ref, negn_ref, thr_ref, olo_ref, ohi_ref,
                 llo_ref, lhi_ref, keys_ref, cnt_ref, *, n_leaves, k_cap):
    nb = llo_ref.shape[1] // LANES
    lanes = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    keys_ref[:, :] = jnp.full(keys_ref.shape, _I32MAX, jnp.int32)

    def blk_body(blk, cursors):
        lo = llo_ref[:, pl.ds(blk * LANES, LANES)]      # (3, 128)
        hi = lhi_ref[:, pl.ds(blk * LANES, LANES)]
        outside = jnp.zeros((TB, LANES), jnp.bool_)
        for p in range(4):
            pn = posn_ref[:, p, :]                      # (TB, 3)
            nn = negn_ref[:, p, :]
            dist = (jnp.dot(pn, hi, preferred_element_type=jnp.float32)
                    + jnp.dot(nn, lo, preferred_element_type=jnp.float32))
            outside = outside | (dist < thr_ref[:, p:p + 1])
        lane_ok = (blk * LANES + lanes) < n_leaves      # (1, 128)
        passed = jnp.logical_not(outside) & lane_ok     # (TB, 128)

        def do_block(cursors):
            # conservative origin-box -> leaf-box distance (lower bound on
            # any tile ray's t to reach the leaf, for unit directions)
            g2 = jnp.zeros((TB, LANES), jnp.float32)
            for k in range(3):
                gk = jnp.maximum(olo_ref[:, k:k + 1] - hi[k:k + 1, :],
                                 lo[k:k + 1, :] - ohi_ref[:, k:k + 1])
                gk = jnp.maximum(gk, 0.0)
                g2 = g2 + gk * gk
            lb = jnp.sqrt(g2)
            lbb = lax.bitcast_convert_type(lb, jnp.int32)
            key_all = ((lbb >> _LEAF_BITS) << _LEAF_BITS) | (
                blk * LANES + lanes)
            key_all = jnp.where(passed, key_all, _I32MAX)

            new_cur = []
            for t in range(TB):
                m = passed[t:t + 1, :]
                cnt = jnp.sum(m.astype(jnp.int32))

                def tile_do(cur, m=m, t=t, key_t=key_all[t:t + 1, :]):
                    mi = m.astype(jnp.int32)
                    r = mi
                    for sh in (1, 2, 4, 8, 16, 32, 64):
                        r = r + jnp.where(lanes >= sh,
                                          pltpu.roll(r, sh, axis=1), 0)
                    r = r - mi                       # exclusive rank
                    deficit = jnp.where(m, lanes - r, 0)
                    kk = jnp.where(m, key_t, _I32MAX)
                    for b in (1, 2, 4, 8, 16, 32, 64):
                        ak = pltpu.roll(kk, LANES - b, axis=1)
                        ad = pltpu.roll(deficit, LANES - b, axis=1)
                        take = ((lanes < LANES - b) & ((ad & b) != 0)
                                & (ak != _I32MAX))
                        kk = jnp.where(take, ak, kk)
                        deficit = jnp.where(take, ad - b, deficit)
                    keys_ref[t, pl.ds(jnp.minimum(cur, k_cap), LANES)] = kk[0]
                    return cur + cnt

                cur = lax.cond(cnt > 0, tile_do, lambda c: c, cursors[t])
                new_cur.append(cur)
            return tuple(new_cur)

        total = jnp.sum(passed.astype(jnp.int32))
        return lax.cond(total > 0, do_block, lambda c: c, cursors)

    cursors = lax.fori_loop(0, nb, blk_body,
                            tuple(jnp.int32(0) for _ in range(TB)))
    for t in range(TB):
        cnt_ref[t, 0] = cursors[t]


@partial(jax.jit, static_argnames=("k_cap", "interpret"))
def cull_tiles(aux: PacketAux, posn, negn, thresh, olo, ohi,
               k_cap: int = 256, interpret: bool = False):
    """Dense frustum cull: per tile the (lb|leaf) keys of every leaf whose
    AABB intersects the tile frustum (unordered, I32MAX padded) + counts.

    posn/negn: (T, 4, 3) relu/negative parts of inward plane normals;
    thresh: (T, 4) min over the tile's origin box of n.o; olo/ohi: (T, 3)
    origin box. Returns (keys (T, k_cap+128) i32, counts (T,) i32)."""
    T = posn.shape[0]
    if T % TB:
        # pad with always-culling tiles (zero planes, positive threshold)
        pad = TB - T % TB
        posn = jnp.concatenate([posn, jnp.zeros((pad, 4, 3))], axis=0)
        negn = jnp.concatenate([negn, jnp.zeros((pad, 4, 3))], axis=0)
        thresh = jnp.concatenate([thresh, jnp.ones((pad, 4))], axis=0)
        olo = jnp.concatenate([olo, jnp.zeros((pad, 3))], axis=0)
        ohi = jnp.concatenate([ohi, jnp.zeros((pad, 3))], axis=0)
    tp = posn.shape[0]
    lpad = aux.leaf_lo.shape[1]
    grid = (tp // TB,)
    keys, cnt = pl.pallas_call(
        partial(_cull_kernel, n_leaves=aux.n_leaves, k_cap=k_cap),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, 4, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 4, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, lpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, lpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((tp, k_cap + LANES), jnp.int32),
            jax.ShapeDtypeStruct((tp, 1), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec((TB, k_cap + LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(posn, negn, thresh, olo, ohi, aux.leaf_lo, aux.leaf_hi)
    return keys[:T], cnt.reshape(tp)[:T]


# --------------------------------------------------------------------------
# K2: sorted early-exit triple-product MT
# --------------------------------------------------------------------------

def _mt_kernel(o_ref, d_ref, geom_ref, lbg_ref, tmax_ref, t_ref, i_ref):
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

    tmax = tmax_ref[0, 0]

    def cond(state):
        blk, best_t, best_i = state
        t_far = jnp.max(best_t)
        gate = lbg_ref[0, 0, jnp.minimum(blk, nb - 1)]
        return (blk < nb) & (gate <= t_far)

    def body(state):
        blk, best_t, best_i = state
        g = geom_ref[0, pl.ds(blk * TRI_BLK, TRI_BLK), :]   # (128, 48)
        det = jnp.dot(g[:, 0:12], f, preferred_element_type=jnp.float32)
        up = jnp.dot(g[:, 12:24], f, preferred_element_type=jnp.float32)
        vp = jnp.dot(g[:, 24:36], f, preferred_element_type=jnp.float32)
        tp = jnp.dot(g[:, 36:48], f, preferred_element_type=jnp.float32)
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
    tmax: (T, 1) initial per-tile t bound. -> (t (T,256), tri idx (T,256))."""
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
            pl.BlockSpec((1, 1), lambda i: (i, 0),
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
# full pipeline
# --------------------------------------------------------------------------

def _decode_keys(keys):
    lb = lax.bitcast_convert_type((keys >> _LEAF_BITS) << _LEAF_BITS,
                                  jnp.float32)
    return lb, keys & _LEAF_MASK


@partial(jax.jit, static_argnames=("max_leaves", "interpret", "retrace",
                                   "wf_cap_factor"))
def intersect_packets2(bvh8: BVH8, aux: PacketAux, rays: Rays,
                       max_leaves: int = 256, t_max=BVH_FAR,
                       interpret: bool = False, retrace: bool = True,
                       wf_cap_factor: int = 8):
    """Packet trace v2. Rays must be (T*256,) grouped into tiles sharing an
    origin box (camera 16x16 scan tiles, or sort_rays_coherent output).
    Returns (Hits, per-tile overflow mask). With retrace=True overflowed
    tiles are re-traced exactly by the wavefront engine inside this call
    (the returned hits are then exact everywhere; the mask only reports
    where the fallback ran)."""
    K = max_leaves
    assert K % 32 == 0
    R = rays.o.shape[0]
    T = R // TILE
    o = rays.o.reshape(T, TILE, 3)
    d = rays.d.reshape(T, TILE, 3)
    olo = o.min(axis=1)
    ohi = o.max(axis=1)

    planes = _tile_planes(o[:, 0], d)          # (T, 4, 3)
    posn = jnp.maximum(planes, 0.0)
    negn = jnp.minimum(planes, 0.0)
    thresh = (jnp.einsum("tpk,tk->tp", posn, olo)
              + jnp.einsum("tpk,tk->tp", negn, ohi))

    keys, counts = cull_tiles(aux, posn, negn, thresh, olo, ohi,
                              k_cap=K, interpret=interpret)
    overflow = counts > K

    keys_s = lax.sort(keys[:, :K], dimension=1)
    lb, leaves = _decode_keys(keys_s)
    live = keys_s != _I32MAX
    lrow = jnp.where(live, leaves, 0)

    geom = jnp.where(live[:, :, None, None],
                     aux.gtab[lrow], 0.0).reshape(T, K * 4, 48)

    # block gates in ray-t units: entry distance / max |d| over the tile
    dlen = jnp.linalg.norm(d, axis=-1)
    maxd = jnp.maximum(dlen.max(axis=1), 1e-20)          # (T,)
    lbg = jnp.where(live, lb, BVH_FAR)[:, ::32] / maxd[:, None]
    lbg = lbg.reshape(T, 1, K // 32)

    o_c = jnp.transpose(o - aux.center, (0, 2, 1))       # (T, 3, 256)
    d_t = jnp.transpose(d, (0, 2, 1))
    tmax = jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), (T,)).reshape(T, 1)
    best_t, best_i = mt_resolve(o_c, d_t, geom, lbg, tmax,
                                interpret=interpret)

    # tri index in the sorted list -> leaf row + lane
    pos = best_i >> 2
    lane = best_i & 3
    trow = jnp.arange(T, dtype=jnp.int32)[:, None]
    row = lrow.reshape(-1)[trow * K + pos]
    best_pk = row * 4 + lane
    tmax_r = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    best_t = jnp.where(best_t < tmax_r.reshape(T, TILE), best_t, BVH_FAR)
    hits, _ = _finish(bvh8, rays, best_t, best_pk, overflow, R, T)

    if retrace:
        from tinybvh_tpu.traverse.wavefront import intersect_wavefront

        ov_ray = jnp.repeat(overflow, TILE)
        wf_tmax = jnp.where(ov_ray, tmax_r, 0.0)
        wf_hits, wf_ovf = intersect_wavefront(
            bvh8, rays, t_max=wf_tmax, cap_factor=wf_cap_factor)
        hits = Hits(
            t=jnp.where(ov_ray, wf_hits.t, hits.t),
            u=jnp.where(ov_ray, wf_hits.u, hits.u),
            v=jnp.where(ov_ray, wf_hits.v, hits.v),
            prim=jnp.where(ov_ray, wf_hits.prim, hits.prim),
            inst=hits.inst,
        )
        # after an exact retrace, report only tiles that may STILL be
        # inexact: retraced tiles whose wavefront pass itself overflowed
        overflow = overflow & wf_ovf
    return hits, overflow


def _finish(bvh8, rays, best_t, best_pk, overflow, R, T):
    """Recover (prim, u, v) for the winning packed (leaf*4+lane)."""
    from tinybvh_tpu.core.intersect import moller_trumbore, tri_edges

    lt = bvh8.leaf_tris
    lp = bvh8.leaf_prim
    ok = best_t < BVH_FAR
    wl = jnp.where(ok, best_pk >> 2, 0)
    wk = jnp.where(ok, best_pk & 3, 0)
    prim = jnp.where(ok, lp[wl, wk], -1).reshape(-1)
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


@partial(jax.jit, static_argnames=("max_leaves", "interpret", "retrace",
                                   "wf_cap_factor"))
def is_occluded_packets2(bvh8: BVH8, aux: PacketAux, origin, points,
                         cutoff: float = 1.0 - 1e-3, max_leaves: int = 256,
                         interpret: bool = False, retrace: bool = True,
                         wf_cap_factor: int = 8):
    """Any-hit occlusion for segments origin->points sharing ONE origin,
    points in tile order (e.g. shadow rays traced FROM a point light).
    Directions stay unnormalized so t is the segment fraction; the t_max
    cutoff doubles as the early-exit bound (every tile starts with
    t_far = cutoff, so K2 stops at the first blocks that occlude).
    ~ IsOccluded (tiny_bvh.h:3382-3453). Returns ((R,) occluded, (T,)
    overflow); with retrace=True overflowed tiles are resolved by the
    any-hit wavefront in the same call."""
    points = jnp.asarray(points, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)
    d = points - origin[None, :]
    o = jnp.broadcast_to(origin, d.shape)
    from tinybvh_tpu.core.rays import make_rays

    rays = make_rays(o, d)
    hits, overflow = intersect_packets2(
        bvh8, aux, rays, max_leaves=max_leaves, t_max=cutoff,
        interpret=interpret, retrace=False)
    occ = (hits.prim >= 0) & (hits.t < cutoff)
    if retrace:
        from tinybvh_tpu.traverse.wavefront import intersect_wavefront

        ov_ray = jnp.repeat(overflow, TILE)
        wf_tmax = jnp.where(ov_ray, jnp.float32(cutoff), 0.0)
        _, wf_occ, wf_ovf = intersect_wavefront(
            bvh8, rays, t_max=wf_tmax, cap_factor=wf_cap_factor,
            any_hit=True)
        occ = jnp.where(ov_ray, wf_occ, occ)
        overflow = overflow & wf_ovf
    return occ, overflow


@partial(jax.jit, static_argnames=("max_leaves", "interpret", "retrace",
                                   "wf_cap_factor"))
def intersect_packets2_sorted(bvh8: BVH8, aux: PacketAux, rays: Rays,
                              scene_lo, scene_hi, max_leaves: int = 256,
                              interpret: bool = False, retrace: bool = True,
                              wf_cap_factor: int = 8):
    """Packet trace v2 for INCOHERENT rays: coherence-sort into tiles
    (direction cell + origin morton), trace, scatter back to input order.
    Returns (Hits in input order, per-ray fallback mask)."""
    from tinybvh_tpu.traverse.packet import sort_rays_coherent

    R = rays.o.shape[0]
    scene_lo = jnp.asarray(scene_lo, jnp.float32)
    scene_hi = jnp.asarray(scene_hi, jnp.float32)
    order, inverse = sort_rays_coherent(rays.o, rays.d, scene_lo, scene_hi)
    rs = Rays(o=rays.o[order], d=rays.d[order], rd=rays.rd[order],
              mask=rays.mask[order])
    hits, overflow = intersect_packets2(
        bvh8, aux, rs, max_leaves=max_leaves, interpret=interpret,
        retrace=retrace, wf_cap_factor=wf_cap_factor)
    ov_ray = jnp.repeat(overflow, TILE)[inverse]
    return Hits(t=hits.t[inverse], u=hits.u[inverse], v=hits.v[inverse],
                prim=hits.prim[inverse], inst=hits.inst[inverse]), ov_ray
