"""L1 geometric queries: slab tests, triangle intersection, brute force.

TPU-native counterparts of the reference's core queries:
  * AABB slab test        — tinybvh_intersect_aabb (tiny_bvh.h:711-723)
  * Möller–Trumbore       — MOLLER_TRUMBORE macro (tiny_bvh.h:1644-1656)
  * watertight (Woop)     — IntersectTriWatertight (tiny_bvh.h:8486-8507)
  * sphere–triangle       — used by BVH::IntersectSphere (tiny_bvh.h:3140)

All functions are batched over arbitrary leading axes and jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tinybvh_tpu.core.vecmath import BVH_FAR


def slab_test(o, rd, t_cur, bmin, bmax):
    """Ray-vs-AABB slab test. Returns entry distance, BVH_FAR on miss.

    o, rd: (..., 3); bmin, bmax: (..., 3); t_cur: (...,) current closest hit.
    Mirrors tinybvh_intersect_aabb (tiny_bvh.h:711-723): hit iff
    tmax >= tmin, tmin < t_cur, tmax >= 0.
    """
    t1 = (bmin - o) * rd
    t2 = (bmax - o) * rd
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= tmin) & (tmin < t_cur) & (tmax >= 0.0)
    return jnp.where(hit, tmin, BVH_FAR)


def moller_trumbore(o, d, v0, e1, e2, t_cur, backface_cull: bool = False):
    """Batched Möller–Trumbore ray/triangle test.

    o, d: (..., 3) ray; v0: (..., 3) triangle vertex 0; e1 = v1 - v0;
    e2 = v2 - v0; t_cur: (...,) current closest-hit distance.

    Returns (hit_mask, t, u, v). A hit requires 0 < t < t_cur and valid
    barycentrics, matching the reference macro (tiny_bvh.h:1644-1656).
    """
    h = jnp.cross(d, e2)
    det = jnp.einsum("...i,...i->...", e1, h)
    if backface_cull:
        valid_det = det > 1e-9
    else:
        valid_det = jnp.abs(det) > 1e-9
    inv_det = 1.0 / jnp.where(valid_det, det, 1.0)
    s = o - v0
    u = jnp.einsum("...i,...i->...", s, h) * inv_det
    q = jnp.cross(s, e1)
    v = jnp.einsum("...i,...i->...", d, q) * inv_det
    t = jnp.einsum("...i,...i->...", e2, q) * inv_det
    hit = (
        valid_det
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
        & (t < t_cur)
    )
    return hit, jnp.where(hit, t, BVH_FAR), u, v


def tri_edges(tri):
    """(..., 3, 3) triangles → (v0, e1, e2) each (..., 3)."""
    v0 = tri[..., 0, :]
    e1 = tri[..., 1, :] - v0
    e2 = tri[..., 2, :] - v0
    return v0, e1, e2


def tri_aabb(tri):
    """Per-triangle AABB; (..., 3, 3) → ((..., 3), (..., 3))."""
    return jnp.min(tri, axis=-2), jnp.max(tri, axis=-2)


def sphere_tri_overlap(center, r, v0, v1, v2):
    """Exact sphere-vs-triangle overlap (used for collision queries).

    center: (..., 3), r: (...,) or scalar; triangle verts (..., 3).
    Mirrors the closest-point-on-triangle logic in BVH::IntersectSphere
    (tiny_bvh.h:3153-3199).
    """
    ab = v1 - v0
    ac = v2 - v0
    ap = center - v0

    def dot(a, b):
        return jnp.einsum("...i,...i->...", a, b)

    d1 = dot(ab, ap)
    d2 = dot(ac, ap)
    bp = center - v1
    d3 = dot(ab, bp)
    d4 = dot(ac, bp)
    cp = center - v2
    d5 = dot(ab, cp)
    d6 = dot(ac, cp)

    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4
    denom = jnp.where(va + vb + vc == 0, 1.0, va + vb + vc)
    vv = vb / denom
    ww = vc / denom
    inner = v0 + vv[..., None] * ab + ww[..., None] * ac

    # Region tests (Ericson, Real-Time Collision Detection §5.1.5)
    p = inner
    p = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None],
                  v0 + (d1 / jnp.where(d1 - d3 == 0, 1.0, d1 - d3))[..., None] * ab, p)
    p = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None],
                  v0 + (d2 / jnp.where(d2 - d6 == 0, 1.0, d2 - d6))[..., None] * ac, p)
    w2 = (d4 - d3) / jnp.where((d4 - d3) + (d5 - d6) == 0, 1.0, (d4 - d3) + (d5 - d6))
    p = jnp.where(((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0))[..., None],
                  v1 + w2[..., None] * (v2 - v1), p)
    p = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], v0, p)
    p = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], v1, p)
    p = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], v2, p)

    dist2 = dot(center - p, center - p)
    return dist2 <= r * r


def brute_force_closest(rays, tris, t_max=BVH_FAR, chunk: int = 4096):
    """O(R·N) closest-hit ground truth, chunked over triangles.

    The golden reference for all traversal tests — the analogue of the
    reference validating every layout against the base BVH2 trace
    (tiny_bvh_speedtest.cpp:338-381), but stronger: validated against raw
    geometry.
    """
    from tinybvh_tpu.core.rays import no_hits

    o, d = rays.o, rays.d
    R = o.shape[0]
    N = tris.shape[0]
    pad = (-N) % chunk
    tris_p = jnp.pad(tris, ((0, pad), (0, 0), (0, 0)))
    # padded tris are degenerate (all zero) → det==0 → never hit
    n_chunks = tris_p.shape[0] // chunk
    tris_c = tris_p.reshape(n_chunks, chunk, 3, 3)

    init = no_hits((R,))
    init = init.replace(t=jnp.full((R,), t_max, jnp.float32))

    def body(hits, tri_chunk_and_base):
        tri_chunk, base = tri_chunk_and_base
        v0, e1, e2 = tri_edges(tri_chunk)  # (C, 3)
        hit, t, u, v = moller_trumbore(
            o[:, None, :], d[:, None, :], v0[None], e1[None], e2[None],
            hits.t[:, None],
        )  # (R, C)
        t = jnp.where(hit, t, BVH_FAR)
        best = jnp.argmin(t, axis=1)  # (R,)
        bt = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
        improved = bt < hits.t
        sel = lambda new, old: jnp.where(improved, new, old)
        bu = jnp.take_along_axis(u, best[:, None], axis=1)[:, 0]
        bv = jnp.take_along_axis(v, best[:, None], axis=1)[:, 0]
        new = hits.replace(
            t=sel(bt, hits.t),
            u=sel(bu, hits.u),
            v=sel(bv, hits.v),
            prim=sel(base + best.astype(jnp.int32), hits.prim),
        )
        return new, None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    hits, _ = lax.scan(body, init, (tris_c, bases))
    # restore BVH_FAR semantics for misses when t_max < BVH_FAR
    hits = hits.replace(t=jnp.where(hits.prim >= 0, hits.t, BVH_FAR))
    return hits


def brute_force_any(rays, tris, t_max, chunk: int = 4096):
    """O(R·N) any-hit ground truth: True where something lies in (0, t_max)."""
    o, d = rays.o, rays.d
    N = tris.shape[0]
    pad = (-N) % chunk
    tris_p = jnp.pad(tris, ((0, pad), (0, 0), (0, 0)))
    n_chunks = tris_p.shape[0] // chunk
    tris_c = tris_p.reshape(n_chunks, chunk, 3, 3)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (o.shape[0],))

    def body(occ, tri_chunk):
        v0, e1, e2 = tri_edges(tri_chunk)
        hit, _, _, _ = moller_trumbore(
            o[:, None, :], d[:, None, :], v0[None], e1[None], e2[None],
            t_max[:, None],
        )
        return occ | jnp.any(hit, axis=1), None

    occ, _ = lax.scan(body, jnp.zeros(o.shape[0], bool), tris_c)
    return occ
