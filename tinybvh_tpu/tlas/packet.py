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
from jax import lax
from flax import struct

from tinybvh_tpu.core.rays import Hits, Rays
from tinybvh_tpu.core.vecmath import BVH_FAR, mat3_apply, mat4_inverse, \
    safe_rcp
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
    # instance WORLD AABBs (≙ BLASInstance.Update, tiny_bvh.h:8386-8400):
    # the bucketed engine's TLAS-level cull tests tile frusta against these
    inst_wlo: jnp.ndarray   # (I, 3) f32
    inst_whi: jnp.ndarray   # (I, 3) f32
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
    tabs, blas_base, roots = [], [], []
    base = 0
    for i, b in enumerate(blases):
        if host8s is not None:
            lp = host8s[i]["leaf_prim"].reshape(-1)
            lt = host8s[i]["leaf_tris"].reshape(-1, 3, 3)
            roots.append(host8s[i]["bounds"][0].reshape(6, 8))
        else:
            lp = np.asarray(b.leaf_prim).reshape(-1)
            lt = np.asarray(b.leaf_tris).reshape(-1, 3, 3)
            roots.append(np.asarray(b.bounds[0]).reshape(6, 8))
        n = int(lp.max()) + 1 if lp.size else 0
        tab = np.zeros((n, 3, 3), np.float32)
        ok = lp >= 0
        tab[lp[ok]] = lt[ok]
        tabs.append(tab)
        blas_base.append(base)
        base += n
    prim_off = np.array([blas_base[b] for b in blas_of], np.int32)
    # instance world AABBs (center' ± |A|·extent over the BLAS root box)
    blas_lo = np.stack([roots[b][:3].min(1) for b in blas_of])
    blas_hi = np.stack([roots[b][3:].max(1) for b in blas_of])
    cc = (blas_lo + blas_hi) * 0.5
    ee = (blas_hi - blas_lo) * 0.5
    a3 = mats[:, :3, :3]
    c2 = np.einsum("ijk,ik->ij", a3, cc) + mats[:, :3, 3]
    e2 = np.einsum("ijk,ik->ij", np.abs(a3), ee)
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
        inst_wlo=jnp.asarray((c2 - e2).astype(np.float32)),
        inst_whi=jnp.asarray((c2 + e2).astype(np.float32)),
        blas_of=blas_of,
    )


def _xform_batch(inv, o, d):
    # mat3_apply, not @: TPU f32 matmul defaults to bf16 multiplies,
    # which displaces distant ray origins (see vecmath.mat3_apply)
    o2 = mat3_apply(inv[None, :3, :3], o) + inv[:3, 3]
    d2 = mat3_apply(inv[None, :3, :3], d)
    return o2, d2


@partial(jax.jit, static_argnames=("max_leaves", "interpret", "retrace",
                                   "wf_cap_factor", "max_blocks", "any_hit",
                                   "retrace_ml", "retrace_blocks"))
def intersect_tlas_packets2(tp: TLASPacket, rays: Rays, t_max=BVH_FAR,
                            max_leaves: int = 256, interpret: bool = False,
                            retrace=True, wf_cap_factor: int = 6,
                            max_blocks: int = 128, any_hit: bool = False,
                            retrace_ml: int = 0, retrace_blocks: int = 0):
    """Closest-hit packet trace of an instanced scene. Rays must be in
    tile order (see traverse.packet2.intersect_packets2). Returns
    (Hits with .inst = instance id / .prim = BLAS-local prim id,
    (T,) overflow-tile mask). retrace=True resolves overflowed tiles
    with the two-level wavefront in the same call; retrace="packet"
    escalates each per-instance pass's budget instead (see
    intersect_packets2)."""
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
            t_max=t_max, interpret=interpret,
            retrace="packet" if retrace == "packet" else False,
            max_blocks=max_blocks, any_hit=any_hit,
            retrace_ml=retrace_ml, retrace_blocks=retrace_blocks)
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

    if retrace and retrace != "packet":
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


@partial(jax.jit, static_argnames=("rounds", "max_leaves", "interpret",
                                   "retrace", "wf_cap_factor", "max_blocks",
                                   "any_hit", "retrace_ml", "retrace_blocks"))
def intersect_tlas_packets2_bucketed(tp: TLASPacket, rays: Rays,
                                     t_max=BVH_FAR, rounds: int = 8,
                                     max_leaves: int = 512,
                                     interpret: bool = False, retrace=True,
                                     wf_cap_factor: int = 6,
                                     max_blocks: int = 256,
                                     any_hit: bool = False,
                                     retrace_ml: int = 0,
                                     retrace_blocks: int = 0):
    """Instanced packet trace that SCALES with instance count (≙ the
    3,375-instance TLAS demo, tiny_bvh_gpu2.cpp:124-136): instead of one
    full packet pass per instance (intersect_tlas_packets2's unrolled
    loop — fine at 8, hopeless at 512+), build per-TILE instance
    worklists with a TLAS-level frustum-vs-instance-AABB cull, then run
    `rounds` packet passes where in round r every tile traces its r-th
    NEAREST candidate instance. Tiles with fewer candidates run dead in
    later rounds: their per-ray t bound is zeroed, so the cull collapses
    and a dead (tile, round) slot costs only fixed grid-step time. The
    per-round pass is one lax.scan body — compile time is independent of
    both instance count and rounds.

    Candidate ordering is near-to-far (origin-box → instance-box gap),
    and each round passes the running per-ray best t as its t_max, so
    closer instances shrink later rounds' cull reach (the two-level
    analog of the distance-keyed TLAS stack, tiny_bvh.h:3365-3377).

    Instances are grouped per unique BLAS (blas_of is static); each group
    runs its own scan over that BLAS's tables. Tiles whose candidate
    count exceeds `rounds` — or that overflow a round's leaf budget —
    are re-traced exactly by the two-level wavefront when retrace=True.
    Returns (Hits [.inst = instance id, .prim = BLAS-local prim],
    (T,) residual-overflow mask)."""
    from tinybvh_tpu.traverse.packet import _tile_planes

    R = rays.o.shape[0]
    T = R // TILE
    o = rays.o.reshape(T, TILE, 3)
    d = rays.d.reshape(T, TILE, 3)
    olo = o.min(axis=1)
    ohi = o.max(axis=1)
    planes = _tile_planes(o[:, 0], d)          # (T, 4, 3)
    posn = jnp.maximum(planes, 0.0)
    negn = jnp.minimum(planes, 0.0)
    thresh = ((posn * olo[:, None, :]).sum(-1)
              + (negn * ohi[:, None, :]).sum(-1))
    tmax_r = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

    t_best = jnp.minimum(jnp.full(R, BVH_FAR, jnp.float32), tmax_r)
    u = jnp.zeros(R, jnp.float32)
    v = jnp.zeros(R, jnp.float32)
    prim = jnp.full(R, -1, jnp.int32)
    inst = jnp.full(R, -1, jnp.int32)
    overflow = jnp.zeros(T, bool)   # leaf-budget overflow (per-round)
    cand_ovf = jnp.zeros(T, bool)   # candidate list exceeded `rounds`

    for b in sorted(set(tp.blas_of)):
        ids_np = np.array([i for i, bb in enumerate(tp.blas_of) if bb == b],
                          np.int32)
        ids = jnp.asarray(ids_np)
        wlo = tp.inst_wlo[ids]                 # (Ib, 3)
        whi = tp.inst_whi[ids]
        # frustum-vs-instance-box: same plane algebra as the leaf cull
        dist = -thresh[:, :, None]             # (T, 4, Ib)
        for k in range(3):
            dist = (dist + posn[:, :, k, None] * whi[None, None, :, k]
                    + negn[:, :, k, None] * wlo[None, None, :, k])
        hit_i = jnp.logical_not(jnp.any(dist < 0.0, axis=1))   # (T, Ib)
        # near-to-far candidate order by origin-box -> instance-box gap
        g2 = jnp.zeros_like(hit_i, jnp.float32)
        for k in range(3):
            gk = jnp.maximum(olo[:, None, k] - whi[None, :, k],
                             wlo[None, :, k] - ohi[:, None, k])
            g2 = g2 + jnp.maximum(gk, 0.0) ** 2
        key = jnp.where(hit_i, g2, jnp.inf)
        order = jnp.argsort(key, axis=1)[:, :rounds]            # (T, <=r)
        taken = jnp.take_along_axis(hit_i, order, axis=1)
        cand = jnp.where(taken, ids[order], -1)                 # (T, r')
        if cand.shape[1] < rounds:
            cand = jnp.concatenate(
                [cand, jnp.full((T, rounds - cand.shape[1]), -1,
                                jnp.int32)], axis=1)
        cand_ovf = cand_ovf | (jnp.sum(hit_i, axis=1) > rounds)

        blas = tp.blases[b]
        aux = tp.auxes[b]

        def body(carry, cand_r, blas=blas, aux=aux):
            t_best, u, v, prim, inst, ovf = carry
            safe = jnp.maximum(cand_r, 0)
            inv_r = tp.inst_inv[safe]                           # (T, 4, 4)
            dead = cand_r < 0
            # exact-f32 per-tile transform (mat3_apply broadcast over the
            # tile axis): einsum here cost 3.7% of inst512 oracle rays
            o2 = (mat3_apply(inv_r[:, None, :3, :3], o)
                  + inv_r[:, None, :3, 3]).reshape(R, 3)
            d2 = mat3_apply(inv_r[:, None, :3, :3], d).reshape(R, 3)
            rays_r = Rays(o=o2, d=d2, rd=safe_rcp(d2), mask=rays.mask)
            dead_r = jnp.repeat(dead, TILE)
            h_r, ovf_r = intersect_packets2(
                blas, aux, rays_r, max_leaves=max_leaves,
                t_max=jnp.where(dead_r, 0.0, t_best),
                interpret=interpret,
                retrace="packet" if retrace == "packet" else False,
                max_blocks=max_blocks, any_hit=any_hit,
                retrace_ml=retrace_ml, retrace_blocks=retrace_blocks)
            mask_ok = ((jnp.repeat(tp.inst_mask[safe], TILE) & rays.mask)
                       != 0) & ~dead_r
            better = mask_ok & (h_r.prim >= 0) & (h_r.t < t_best)
            t_best = jnp.where(better, h_r.t, t_best)
            u = jnp.where(better, h_r.u, u)
            v = jnp.where(better, h_r.v, v)
            prim = jnp.where(better, h_r.prim, prim)
            inst = jnp.where(better, jnp.repeat(cand_r, TILE), inst)
            ovf = ovf | (ovf_r & ~dead)
            return (t_best, u, v, prim, inst, ovf), None

        (t_best, u, v, prim, inst, overflow), _ = lax.scan(
            body, (t_best, u, v, prim, inst, overflow), cand.T)

    hits = Hits(t=jnp.where(prim >= 0, t_best, BVH_FAR), u=u, v=v,
                prim=prim, inst=inst)

    # in "packet" mode per-round budget overflow is escalated in-round;
    # whatever SURVIVES the escalation — plus candidate-count overflow
    # (> rounds) — still needs the two-level wavefront. In both modes it
    # fires only when tiles actually overflowed (lax.cond); callers that
    # size retrace_ml to the BLAS's full segment count make per-round
    # overflow impossible, leaving only the candidate path
    need_wf = overflow | cand_ovf
    if retrace:
        ov_ray = jnp.repeat(need_wf, TILE)

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
            jnp.any(need_wf), do_retrace, skip, 0)
        hits = Hits(
            t=jnp.where(ov_ray, wt, hits.t),
            u=jnp.where(ov_ray, wu, hits.u),
            v=jnp.where(ov_ray, wv, hits.v),
            prim=jnp.where(ov_ray, wp, hits.prim),
            inst=jnp.where(ov_ray, wi, hits.inst),
        )
        resolved = need_wf & ~wf_ovf
        overflow = (overflow | cand_ovf) & ~resolved
    else:
        overflow = overflow | cand_ovf
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
