"""Voxel BLAS instances in a TLAS (≙ the VoxelSet leaf dispatch inside
IntersectTLAS / IsOccludedTLAS, tiny_bvh.h:3357 and :3500).

The reference's TLAS leaves dispatch on ``blas->layout``; one of the
layouts is the VoxelSet grid, so a single traversal mixes BVH descent
with the 3DDDA walker. Folding a grid walker into the batched triangle
state machine would drag EVERY ray through both code paths on every
iteration, so the TPU design runs voxel instances as a POST-PASS:

  1. trace the triangle TLAS as usual (zero overhead when a scene has no
     voxel content);
  2. for each voxel instance, transform the whole ray batch into the
     instance frame — directions are NOT renormalized, so hit-t is
     identical in both spaces (same trick as tiny_bvh.h:3329-3333) — and
     run the dense 3-level DDA with the current best t as the cutoff;
  3. min-fold the results into the hit records.

Voxel hits are encoded in the shared Hits record:
  inst = n_triangle_instances + voxel_instance_index
  prim = packed voxel coordinate x*65536 + y*256 + z
  u    = hit-normal axis (0/1/2), v = its sign (±1) — the DDA exit axis,
         ≙ the reference's normal-from-step (tiny_bvh.h:3860-3869).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from tinybvh_tpu.core.rays import Hits, Rays, make_rays
from tinybvh_tpu.core.vecmath import BVH_FAR, mat4_inverse
from tinybvh_tpu.tlas.instance import (
    TLAS8, intersect_tlas_wavefront,
)

RAY_MASK_ALL = 0xFFFF


@struct.dataclass
class VoxelInstance:
    """One placed VoxelSet (≙ a BLASInstance whose blas is a VoxelSet)."""

    vox: dict                # frozen VoxelSet arrays (ops.voxel.freeze())
    inv: jnp.ndarray         # (4, 4) world→voxel-local transform
    mask: jnp.ndarray        # () int32 visibility mask


def voxel_instance(vox, transform=None, mask=RAY_MASK_ALL) -> VoxelInstance:
    """Place a frozen VoxelSet in the world with a 4x4 transform."""
    m = (np.eye(4, dtype=np.float32) if transform is None
         else np.asarray(transform, np.float32))
    inv = mat4_inverse(jnp.asarray(m[None]))[0]
    return VoxelInstance(
        vox=vox, inv=inv, mask=jnp.int32(mask),
    )


def _to_local(inv, o, d):
    """Transform batched rays into the instance frame (no renorm).
    mat3_apply, not @: TPU f32 matmul defaults to bf16 multiplies."""
    from tinybvh_tpu.core.vecmath import mat3_apply

    rot = inv[None, :3, :3]
    o2 = mat3_apply(rot, o) + inv[:3, 3]
    d2 = mat3_apply(rot, d)
    return o2, d2


def _fold_voxels(voxel_insts, rays, base, t, u, v, prim, inst):
    from tinybvh_tpu.ops.voxel import intersect_voxels

    for j, vi in enumerate(voxel_insts):
        o2, d2 = _to_local(vi.inv, rays.o, rays.d)
        tv, nv, cv = intersect_voxels(vi.vox, make_rays(o2, d2), t_max=t)
        visible = (rays.mask & vi.mask) != 0
        ok = (tv < t) & visible
        axis = jnp.argmax(jnp.abs(nv), axis=-1)
        sign = jnp.sum(nv, axis=-1)
        code = (cv[:, 0] * 65536 + cv[:, 1] * 256 + cv[:, 2]).astype(
            jnp.int32)
        t = jnp.where(ok, tv, t)
        u = jnp.where(ok, axis.astype(jnp.float32), u)
        v = jnp.where(ok, sign, v)
        prim = jnp.where(ok, code, prim)
        inst = jnp.where(ok, jnp.int32(base + j), inst)
    return t, u, v, prim, inst


def intersect_tlas_voxels(tlas: TLAS8, voxel_insts, rays: Rays,
                          t_max=BVH_FAR, cap_factor: int = 3):
    """Closest hit over triangle TLAS + voxel instances.

    Returns (Hits, overflow). ≙ IntersectTLAS's VoxelSet leaf case,
    tiny_bvh.h:3357.
    """
    hits, ovf = intersect_tlas_wavefront(
        tlas, rays, t_max, cap_factor=cap_factor)
    base = tlas.inst_inv.shape[0]
    t, u, v, prim, inst = _fold_voxels(
        voxel_insts, rays, base, hits.t, hits.u, hits.v, hits.prim,
        hits.inst)
    return Hits(t=t, u=u, v=v, prim=prim, inst=inst), ovf


def is_occluded_tlas_voxels(tlas: TLAS8, voxel_insts, rays: Rays, t_max,
                            cap_factor: int = 3):
    """Any-hit over triangle TLAS + voxel instances (≙ IsOccludedTLAS's
    VoxelSet case, tiny_bvh.h:3500). Returns (occluded, overflow)."""
    from tinybvh_tpu.ops.voxel import intersect_voxels

    _, occ, ovf = intersect_tlas_wavefront(
        tlas, rays, t_max, cap_factor=cap_factor, any_hit=True)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), occ.shape)
    for vi in voxel_insts:
        o2, d2 = _to_local(vi.inv, rays.o, rays.d)
        tv, _, _ = intersect_voxels(vi.vox, make_rays(o2, d2), t_max=tm)
        visible = (rays.mask & vi.mask) != 0
        occ = occ | ((tv < tm) & visible)
    return occ, ovf
