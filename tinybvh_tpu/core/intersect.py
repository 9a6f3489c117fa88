"""L1 geometric queries: slab tests, triangle intersection, brute force.

TPU-native counterparts of the reference's core queries:
  * AABB slab test        — tinybvh_intersect_aabb (tiny_bvh.h:711-723)
  * Möller–Trumbore       — MOLLER_TRUMBORE macro (tiny_bvh.h:1644-1656)
  * watertight (Woop)     — the WATERTIGHT_TRITEST path of
                            BVHBase::IntersectTri (tiny_bvh.h:8486-8507)
  * Baldwin–Weber         — PrecomputeTriangle + transformed-coordinate
                            test (tiny_bvh.h:8577-8604)
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
    # explicit multiply-sum dots: jnp.einsum lowers to dot_general, whose
    # TPU f32 default is bf16 multiplies — ~0.4% t error on TPU oracles
    h = jnp.cross(d, e2)
    det = (e1 * h).sum(-1)
    if backface_cull:
        valid_det = det > 1e-9
    else:
        valid_det = jnp.abs(det) > 1e-9
    inv_det = 1.0 / jnp.where(valid_det, det, 1.0)
    s = o - v0
    u = (s * h).sum(-1) * inv_det
    q = jnp.cross(s, e1)
    v = (d * q).sum(-1) * inv_det
    t = (e2 * q).sum(-1) * inv_det
    hit = (
        valid_det
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
        & (t < t_cur)
    )
    return hit, jnp.where(hit, t, BVH_FAR), u, v


def moller_trumbore_watertight(o, d, rd, v0, v1, v2, t_cur):
    """Batched watertight ray/triangle test (Woop, Benthin & Wald 2013) —
    ≙ the WATERTIGHT_TRITEST path of BVHBase::IntersectTri
    (tiny_bvh.h:8486-8507). Rays crossing an edge or vertex shared by
    adjacent triangles are guaranteed to hit at least one of them (the
    edge-function signs are computed in a shear-transformed frame, so
    shared edges evaluate identically for both triangles).

    o, d, rd: (..., 3) ray origin / direction / reciprocal direction;
    v0, v1, v2: (..., 3) triangle vertices; t_cur: (...,).
    Returns (hit, t, u, v).
    """
    kz = jnp.argmax(jnp.abs(d), axis=-1)
    kx0 = (kz + 1) % 3
    ky0 = (kz + 2) % 3

    def comp(vec, k):
        return jnp.take_along_axis(vec, k[..., None], axis=-1)[..., 0]

    neg = comp(d, kz) < 0.0
    kx = jnp.where(neg, ky0, kx0)
    ky = jnp.where(neg, kx0, ky0)
    Sz = comp(rd, kz)
    Sx = comp(d, kx) * Sz
    Sy = comp(d, ky) * Sz
    # reference naming: C = v0 - O, A = v1 - O, B = v2 - O.
    # The watertight guarantee needs (a) IDENTICAL input points to yield
    # bit-identical shear coordinates — so all three points go through ONE
    # stacked op (elementwise uniformity inside a single HLO op; three
    # structurally-separate subtractions may be FMA-contracted
    # differently) — and (b) the shared-edge functions of adjacent
    # triangles to be EXACT negations: round(a*b) - round(c*d) vs
    # round(c*d) - round(a*b). The optimization barrier pins each product
    # to one rounding (XLA's fma(a, b, -round(c*d)) contraction would
    # break the antisymmetry and let edge rays slip between triangles).
    P = jnp.stack([v0 - o, v1 - o, v2 - o], axis=-2)     # (..., 3pt, 3xyz)
    k1 = jnp.broadcast_to(kz[..., None, None], P.shape[:-1] + (1,))
    Pz = jnp.take_along_axis(P, k1, axis=-1)[..., 0]     # (..., 3pt)
    kx1 = jnp.broadcast_to(kx[..., None, None], P.shape[:-1] + (1,))
    ky1 = jnp.broadcast_to(ky[..., None, None], P.shape[:-1] + (1,))
    Px = (jnp.take_along_axis(P, kx1, axis=-1)[..., 0]
          - Sx[..., None] * Pz)                          # (..., 3pt)
    Py = (jnp.take_along_axis(P, ky1, axis=-1)[..., 0]
          - Sy[..., None] * Pz)
    Cx, Ax, Bx = Px[..., 0], Px[..., 1], Px[..., 2]
    Cy, Ay, By = Py[..., 0], Py[..., 1], Py[..., 2]
    pUa, pUb, pVa, pVb, pWa, pWb = lax.optimization_barrier(
        (Cx * By, Cy * Bx, Ax * Cy, Ay * Cx, Bx * Ay, By * Ax))
    U = pUa - pUb
    V = pVa - pVb
    W = pWa - pWb
    # XLA freely FMA-contracts per ELEMENT (fusion scalarization), so two
    # triangles sharing an edge can see edge functions that are not exact
    # negations, and a degenerate triangle's functions need not be exact
    # zeros — pure-IEEE sign reasoning (the paper's, and the reference's
    # scalar build) does not survive the compiler. Robust variant: an
    # edge value within contraction-noise of zero (few ulps of its
    # products) counts as ON the edge — both neighbors hit, watertight by
    # over-coverage — and det must clear the summed noise floor, which
    # rejects degenerate (zero/point/collinear) triangles whose functions
    # are pure noise.
    _EPS = 4.0 * 2.0 ** -24
    tU = _EPS * (jnp.abs(pUa) + jnp.abs(pUb))
    tV = _EPS * (jnp.abs(pVa) + jnp.abs(pVb))
    tW = _EPS * (jnp.abs(pWa) + jnp.abs(pWb))
    same_sign = (((U >= -tU) & (V >= -tV) & (W >= -tW))
                 | ((U <= tU) & (V <= tV) & (W <= tW)))
    det = U + V + W
    det_ok = jnp.abs(det) > tU + tV + tW
    inv_det = 1.0 / jnp.where(det != 0.0, det, 1.0)
    T = (U * Sz * Pz[..., 1] + V * Sz * Pz[..., 2]
         + W * Sz * Pz[..., 0])
    t = T * inv_det
    u = U * inv_det
    v = V * inv_det
    hit = same_sign & det_ok & (t >= 0.0) & (t < t_cur)
    return hit, jnp.where(hit, t, BVH_FAR), u, v


def precompute_baldwin_weber(tris):
    """(N, 3, 3) triangles → (N, 12) Baldwin–Weber transform rows
    (≙ BVHBase::PrecomputeTriangle, tiny_bvh.h:8577-8604): a world→
    barycentric affine map stored per triangle, branchlessly merging the
    reference's three dominant-normal-axis layouts."""
    tris = jnp.asarray(tris, jnp.float32)
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    n = jnp.cross(e1, e2)
    nd = (v0 * n).sum(-1)
    dom = jnp.argmax(jnp.abs(n), axis=-1)               # dominant axis

    def rows_for(ax):
        """T rows when |n[ax]| dominates; ax static 0/1/2."""
        a1 = (ax + 1) % 3
        a2 = (ax + 2) % 3
        x1 = v1[:, a1] * v0[:, a2] - v1[:, a2] * v0[:, a1]
        x2 = v2[:, a1] * v0[:, a2] - v2[:, a2] * v0[:, a1]
        rn = 1.0 / jnp.where(n[:, ax] != 0, n[:, ax], 1.0)
        T = jnp.zeros((tris.shape[0], 12), jnp.float32)
        T = T.at[:, ax].set(0.0).at[:, a1].set(e2[:, a2] * rn)
        T = T.at[:, a2].set(-e2[:, a1] * rn).at[:, 3].set(x2 * rn)
        T = T.at[:, 4 + ax].set(0.0).at[:, 4 + a1].set(-e1[:, a2] * rn)
        T = T.at[:, 4 + a2].set(e1[:, a1] * rn).at[:, 7].set(-x1 * rn)
        T = T.at[:, 8 + ax].set(1.0).at[:, 8 + a1].set(n[:, a1] * rn)
        T = T.at[:, 8 + a2].set(n[:, a2] * rn).at[:, 11].set(-nd * rn)
        return T

    T0, T1, T2 = rows_for(0), rows_for(1), rows_for(2)
    T = jnp.where((dom == 0)[:, None], T0,
                  jnp.where((dom == 1)[:, None], T1, T2))
    return jnp.where((jnp.abs(n) > 0).any(-1)[:, None], T, 0.0)


def intersect_baldwin_weber(o, d, T, t_cur):
    """Batched Baldwin–Weber ray/triangle test over precomputed (..., 12)
    transform rows (the format the reference feeds CWBVH compressed
    triangles, tiny_bvh.h:6004-6009). Returns (hit, t, u, v)."""
    tr = T[..., 8:11]
    num = (tr * o).sum(-1) + T[..., 11]
    den = (tr * d).sum(-1)
    ok = jnp.abs(den) > 1e-20
    t = -num / jnp.where(ok, den, 1.0)
    p = o + t[..., None] * d
    u = (T[..., 0:3] * p).sum(-1) + T[..., 3]
    v = (T[..., 4:7] * p).sum(-1) + T[..., 7]
    hit = (ok & (t > 0.0) & (t < t_cur)
           & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0))
    return hit, jnp.where(hit, t, BVH_FAR), u, v


TRI_TESTS = ("mt", "watertight", "baldwin")


def leaf_intersect(tri_test, o, d, rd, v0, v1, v2, t_cur, bw_rows=None):
    """Dispatch the engines' leaf triangle test on Config.tri_test — the
    runtime analogue of the reference's WATERTIGHT_TRITEST compile switch
    (flag tiny_bvh.h:131, consumed at tiny_bvh.h:8486-8507).

    All args batched. v0/v1/v2 must be the RAW shared vertices — the
    watertight guarantee relies on adjacent triangles seeing bit-identical
    edge endpoints, so reconstructing v1 = v0 + e1 in f32 would leak edge
    rays. bw_rows: (..., 12) precomputed Baldwin–Weber rows (required iff
    tri_test == "baldwin"; precompute once per trace with
    precompute_baldwin_weber). Returns (hit, t, u, v)."""
    if tri_test == "mt":
        return moller_trumbore(o, d, v0, v1 - v0, v2 - v0, t_cur)
    if tri_test == "watertight":
        return moller_trumbore_watertight(o, d, rd, v0, v1, v2, t_cur)
    if tri_test == "baldwin":
        assert bw_rows is not None, "baldwin needs precomputed rows"
        return intersect_baldwin_weber(o, d, bw_rows, t_cur)
    raise ValueError(
        f"tri_test must be one of {TRI_TESTS}, got {tri_test!r}")


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
        return (a * b).sum(-1)

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
