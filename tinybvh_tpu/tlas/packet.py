"""Packet2 engine under a TLAS: per-instance dense-cull passes.

The reference traces instanced scenes at full kernel speed by
dispatching each TLAS leaf's BLAS to that layout's fastest Intersect
(tiny_bvh.h:3341-3357; wavefront2.cl traces a CWBVH BLAS per instance).
The TPU counterpart cannot pointer-chase per ray, so this module runs
the flagship packet2 pipeline (dense Pallas cull + fused DMA/MT kernel)
ONCE PER INSTANCE over the whole tile batch:

  * the ray batch is transformed into the instance's BLAS frame
    (directions unnormalized so hit-t is identical in both frames,
    ≙ tiny_bvh.h:3329-3333);
  * the two-tier cull makes non-overlapping tiles cheap: tiles whose
    frusta miss the instance's geometry produce an empty block worklist
    in K1a and skip K1b/K2 work entirely — the per-instance cost scales
    with the tiles that actually touch the instance, which mirrors the
    reference's TLAS-level pruning;
  * hits fold across instances with a running minimum; instance
    visibility masks gate the fold (≙ tiny_bvh.h:3326);
  * tiles that overflow ANY instance's leaf budget are retraced exactly
    by the two-level wavefront inside the same call.

Instances sharing a BLAS share one PacketAux, so the number of distinct
kernel shapes (= remote compiles) is the number of distinct BLAS sizes,
not the number of instances.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from tinybvh_tpu.core.rays import Hits, Rays
from tinybvh_tpu.core.vecmath import BVH_FAR, mat4_inverse, safe_rcp
from tinybvh_tpu.layouts.mbvh import BVH8
from tinybvh_tpu.tlas.instance import TLAS8, build_tlas, \
    intersect_tlas_wavefront
from tinybvh_tpu.traverse.packet import TILE
from tinybvh_tpu.traverse.packet2 import PacketAux, build_packet_aux, \
    intersect_packets2


@struct.dataclass
class TLASPacket:
    """TLAS8 + per-BLAS packet tables. blas_of is static (the instance
    loop is unrolled at trace time), everything else is device data."""

    tlas: TLAS8
    blases: tuple          # tuple[BVH8] unique BLASes
    auxes: tuple           # tuple[PacketAux] aligned with blases
    inst_inv: jnp.ndarray  # (I, 4, 4) world→BLAS
    inst_mask: jnp.ndarray  # (I,) i32
    # BLAS-space triangle of each (instance, BLAS-local prim) hit:
    # prim_tris[prim_off[inst] + prim] — lets shaders recover geometry
    # without the wavefront's packed winner index
    prim_tris: jnp.ndarray  # (sum N_b, 3, 3) f32
    prim_off: jnp.ndarray   # (I,) i32
    blas_of: tuple = struct.field(pytree_node=False)  # per-instance blas id


def build_tlas_packet(blases, transforms, masks=None,
                      omaps=None, host8s=None) -> TLASPacket:
    """blases: list[BVH8]; transforms: (I, 4, 4) array (all instancing
    blases[0]) or list of (blas_id, mat4) pairs — same convention as
    tlas.instance.build_tlas.

    host8s: optional list of host-array dicts (collapse_bvh2 as_host,
    kept by api.BVH as _bvh8_host) aligned with blases. When given, the
    per-BLAS packet tables build in numpy (no per-shape remote compile)
    and the prim tables read host memory instead of paying a D2H
    readback of leaf_tris (minutes/MB through the tunnel backend)."""
    tlas = build_tlas(blases, transforms, masks=masks)
    if isinstance(transforms, (list, tuple)) and transforms and isinstance(
        transforms[0], tuple
    ):
        blas_of = tuple(int(b) for b, _ in transforms)
        mats = np.stack([np.asarray(m, np.float32) for _, m in transforms])
    else:
        mats = np.asarray(transforms, np.float32)
        blas_of = tuple(0 for _ in range(mats.shape[0]))
    if host8s is not None:
        from tinybvh_tpu.traverse.packet2 import build_packet_aux_host

        auxes = tuple(
            build_packet_aux_host(
                h, omap=None if omaps is None else np.asarray(omaps[i]))
            for i, h in enumerate(host8s))
    else:
        auxes = tuple(
            build_packet_aux(b, omap=None if omaps is None else omaps[i])
            for i, b in enumerate(blases))
    # prim -> BLAS-space triangle tables (scatter leaves back by prim id)
    tabs, blas_base = [], []
    base = 0
    for i, b in enumerate(blases):
        if host8s is not None:
            lp = host8s[i]["leaf_prim"].reshape(-1)
            lt = host8s[i]["leaf_tris"].reshape(-1, 3, 3)
        else:
            lp = np.asarray(b.leaf_prim).reshape(-1)
            lt = np.asarray(b.leaf_tris).reshape(-1, 3, 3)
        n = int(lp.max()) + 1 if lp.size else 0
        tab = np.zeros((n, 3, 3), np.float32)
        ok = lp >= 0
        tab[lp[ok]] = lt[ok]
        tabs.append(tab)
        blas_base.append(base)
        base += n
    prim_off = np.array([blas_base[b] for b in blas_of], np.int32)
    return TLASPacket(
        tlas=tlas,
        blases=tuple(blases),
        auxes=auxes,
        # host inverse (f64 for conditioning): the previous device
        # mat4_inverse + np.asarray paid an eager-op compile and a D2H
        inst_inv=jnp.asarray(
            np.linalg.inv(mats.astype(np.float64)).astype(np.float32)),
        inst_mask=tlas.inst_mask,
        prim_tris=jnp.asarray(np.concatenate(tabs, axis=0)),
        prim_off=jnp.asarray(prim_off),
        blas_of=blas_of,
    )


def _xform_batch(inv, o, d):
    o2 = o @ inv[:3, :3].T + inv[:3, 3]
    d2 = d @ inv[:3, :3].T
    return o2, d2


@partial(jax.jit, static_argnames=("max_leaves", "interpret", "retrace",
                                   "wf_cap_factor", "max_blocks", "any_hit"))
def intersect_tlas_packets2(tp: TLASPacket, rays: Rays, t_max=BVH_FAR,
                            max_leaves: int = 256, interpret: bool = False,
                            retrace: bool = True, wf_cap_factor: int = 6,
                            max_blocks: int = 128, any_hit: bool = False):
    """Closest-hit packet trace of an instanced scene. Rays must be in
    tile order (see traverse.packet2.intersect_packets2). Returns
    (Hits with .inst = instance id / .prim = BLAS-local prim id,
    (T,) overflow-tile mask). With retrace=True overflowed tiles are
    re-traced exactly by the two-level wavefront in the same call."""
    R = rays.o.shape[0]
    T = R // TILE
    I = len(tp.blas_of)

    t_best = jnp.full(R, BVH_FAR, jnp.float32)
    u = jnp.zeros(R, jnp.float32)
    v = jnp.zeros(R, jnp.float32)
    prim = jnp.full(R, -1, jnp.int32)
    inst = jnp.full(R, -1, jnp.int32)
    overflow = jnp.zeros(T, bool)

    for i in range(I):
        b = tp.blas_of[i]
        inv = tp.inst_inv[i]
        o2, d2 = _xform_batch(inv, rays.o, rays.d)
        rays2 = Rays(o=o2, d=d2, rd=safe_rcp(d2), mask=rays.mask)
        hits_i, ovf_i = intersect_packets2(
            tp.blases[b], tp.auxes[b], rays2, max_leaves=max_leaves,
            t_max=t_max, interpret=interpret, retrace=False,
            max_blocks=max_blocks, any_hit=any_hit)
        mask_ok = (tp.inst_mask[i] & rays.mask) != 0
        better = mask_ok & (hits_i.prim >= 0) & (hits_i.t < t_best)
        t_best = jnp.where(better, hits_i.t, t_best)
        u = jnp.where(better, hits_i.u, u)
        v = jnp.where(better, hits_i.v, v)
        prim = jnp.where(better, hits_i.prim, prim)
        inst = jnp.where(better, i, inst)
        # masked-off rays can't have produced a real overflow need, but a
        # tile is a mixed bag — keep the conservative OR
        overflow = overflow | ovf_i

    hits = Hits(t=t_best, u=u, v=v, prim=prim, inst=inst)

    if retrace:
        from jax import lax

        ov_ray = jnp.repeat(overflow, TILE)
        tmax_r = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

        def do_retrace(_):
            wf_tmax = jnp.where(ov_ray, tmax_r, 0.0)
            wf_hits, wf_ovf = intersect_tlas_wavefront(
                tp.tlas, rays, t_max=wf_tmax, cap_factor=wf_cap_factor)
            return (wf_hits.t, wf_hits.u, wf_hits.v, wf_hits.prim,
                    wf_hits.inst, wf_ovf)

        def skip(_):
            return (hits.t, hits.u, hits.v, hits.prim, hits.inst,
                    jnp.zeros((), bool))

        wt, wu, wv, wp, wi, wf_ovf = lax.cond(
            jnp.any(overflow), do_retrace, skip, 0)
        hits = Hits(
            t=jnp.where(ov_ray, wt, hits.t),
            u=jnp.where(ov_ray, wu, hits.u),
            v=jnp.where(ov_ray, wv, hits.v),
            prim=jnp.where(ov_ray, wp, hits.prim),
            inst=jnp.where(ov_ray, wi, hits.inst),
        )
        overflow = overflow & wf_ovf
    return hits, overflow


def scene_bounds(tp: TLASPacket):
    """World AABB of the instanced scene from the TLAS root row (child
    slots are +/-FAR padded when empty)."""
    b0 = tp.tlas.bounds[0].reshape(6, 8)
    lo = jnp.min(jnp.where(b0[:3] < BVH_FAR, b0[:3], BVH_FAR), axis=1)
    hi = jnp.max(jnp.where(b0[3:] > -BVH_FAR, b0[3:], -BVH_FAR), axis=1)
    return lo, hi


@partial(jax.jit, static_argnames=("max_leaves", "interpret", "retrace",
                                   "wf_cap_factor", "any_hit",
                                   "t_max_static"))
def intersect_tlas_packets2_sorted(tp: TLASPacket, rays: Rays,
                                   scene_lo, scene_hi,
                                   max_leaves: int = 256,
                                   interpret: bool = False,
                                   retrace: bool = True,
                                   wf_cap_factor: int = 6,
                                   any_hit: bool = False,
                                   t_max_static: float = BVH_FAR):
    """TLAS packet trace for INCOHERENT rays: coherence-sort into tiles,
    trace per instance, scatter back (the TLAS twin of
    traverse.packet2.intersect_packets2_sorted)."""
    from tinybvh_tpu.traverse.packet import sort_rays_coherent

    order, inverse = sort_rays_coherent(rays.o, rays.d,
                                        jnp.asarray(scene_lo, jnp.float32),
                                        jnp.asarray(scene_hi, jnp.float32))
    rs = Rays(o=rays.o[order], d=rays.d[order], rd=rays.rd[order],
              mask=rays.mask[order])
    hits, overflow = intersect_tlas_packets2(
        tp, rs, t_max=t_max_static, max_leaves=max_leaves,
        interpret=interpret, retrace=retrace, wf_cap_factor=wf_cap_factor,
        any_hit=any_hit)
    ov_ray = jnp.repeat(overflow, TILE)[inverse]
    return Hits(t=hits.t[inverse], u=hits.u[inverse], v=hits.v[inverse],
                prim=hits.prim[inverse], inst=hits.inst[inverse]), ov_ray


@partial(jax.jit, static_argnames=("max_leaves", "interpret", "retrace",
                                   "wf_cap_factor", "max_blocks"))
def is_occluded_tlas_packets2(tp: TLASPacket, origin, points,
                              cutoff: float = 1.0 - 1e-3,
                              max_leaves: int = 256,
                              interpret: bool = False, retrace: bool = True,
                              wf_cap_factor: int = 6,
                              max_blocks: int = 128):
    """Any-hit occlusion of segments origin->points (shared origin, tile
    order) against an instanced scene. Returns ((R,) occluded, (T,)
    overflow); overflowed tiles resolved by the any-hit wavefront."""
    from tinybvh_tpu.core.rays import make_rays

    points = jnp.asarray(points, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)
    d = points - origin[None, :]
    o = jnp.broadcast_to(origin, d.shape)
    rays = make_rays(o, d)
    hits, overflow = intersect_tlas_packets2(
        tp, rays, t_max=cutoff, max_leaves=max_leaves, interpret=interpret,
        retrace=False, max_blocks=max_blocks, any_hit=True)
    occ = (hits.prim >= 0) & (hits.t < cutoff)
    if retrace:
        from jax import lax

        R = d.shape[0]
        ov_ray = jnp.repeat(overflow, TILE)

        def do_retrace(_):
            wf_tmax = jnp.where(ov_ray, jnp.float32(cutoff), 0.0)
            _, wf_occ, wf_ovf = intersect_tlas_wavefront(
                tp.tlas, rays, t_max=wf_tmax, cap_factor=wf_cap_factor,
                any_hit=True)
            return wf_occ, wf_ovf

        def skip(_):
            return occ, jnp.zeros((), bool)

        wf_occ, wf_ovf = lax.cond(jnp.any(overflow), do_retrace, skip, 0)
        occ = jnp.where(ov_ray, wf_occ, occ)
        overflow = overflow & wf_ovf
    return occ, overflow
