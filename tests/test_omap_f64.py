"""Opacity micromap and double-precision tests."""

import numpy as np
import jax.numpy as jnp

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.io.loaders import random_tris
from tinybvh_tpu.layouts.mbvh import collapse_bvh2
from tinybvh_tpu.ops.f64 import BVHDouble
from tinybvh_tpu.ops.omap import bake_omap, leaf_align
from tinybvh_tpu.traverse.wide import intersect_bvh8


def test_omap_half_transparent_triangle():
    # one big triangle; bake transparency for u > 0.5
    tris = np.array([[[0, 0, 0], [4, 0, 0], [0, 4, 0]]], np.float32)
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    om = bake_omap(1, lambda p, u, v: u < 0.5, S=16)
    om_leaf = leaf_align(om, bvh8)
    # two rays: one at u≈0.2 (opaque), one at u≈0.8 (transparent)
    rays = make_rays(
        [[0.8, 0.4, -1.0], [3.2, 0.4, -1.0]],
        [[0, 0, 1.0], [0, 0, 1.0]],
    )
    h_plain = intersect_bvh8(bvh8, rays)
    assert (np.asarray(h_plain.prim) >= 0).all()  # both hit without omap
    h = intersect_bvh8(bvh8, rays, omap=om_leaf)
    assert int(h.prim[0]) == 0           # opaque side still hits
    assert int(h.prim[1]) == -1          # transparent side passes through


def test_omap_reveals_triangle_behind():
    # transparent front tri, opaque back tri on the same ray
    tris = np.array(
        [[[0, 0, 0], [4, 0, 0], [0, 4, 0]],
         [[0, 0, 2], [4, 0, 2], [0, 4, 2]]], np.float32)
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    om = bake_omap(2, lambda p, u, v: p == 1, S=8)  # tri 0 fully transparent
    om_leaf = leaf_align(om, bvh8)
    rays = make_rays([[0.5, 0.5, -1.0]], [[0, 0, 1.0]])
    h = intersect_bvh8(bvh8, rays, omap=om_leaf)
    assert int(h.prim[0]) == 1
    np.testing.assert_allclose(float(h.t[0]), 3.0, rtol=1e-5)


def test_double_precision_matches_and_exceeds_f32(rng):
    tris64 = random_tris(300, seed=21).astype(np.float64)
    # huge offset that destroys f32 precision
    offset = 1e9
    tris64_far = tris64 + offset
    b = BVHDouble(tris64_far)
    o = np.array([[offset + 5.0, offset + 5.0, offset - 50.0]])
    d = np.array([[0.0, 0.0, 1.0]])
    res = b.intersect(o, d)
    # brute force in f64
    v0 = tris64_far[:, 0]
    e1 = tris64_far[:, 1] - v0
    e2 = tris64_far[:, 2] - v0
    h = np.cross(d, e2)
    det = (e1 * h).sum(1)
    ok = np.abs(det) > 1e-12
    inv = 1 / np.where(ok, det, 1)
    s = o - v0
    uu = (s * h).sum(1) * inv
    q = np.cross(s, e1)
    vv = (d * q).sum(1) * inv
    tt = (e2 * q).sum(1) * inv
    hit = ok & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt > 0)
    if hit.any():
        ref_t = tt[hit].min()
        assert abs(res["t"][0] - ref_t) / ref_t < 1e-12
    else:
        assert res["prim"][0] == -1
    assert np.isfinite(b.sah_cost())


def test_double_precision_batch(rng):
    tris = random_tris(200, seed=22).astype(np.float64)
    b = BVHDouble(tris)
    o = rng.uniform(-2, 12, (32, 3))
    d = rng.normal(size=(32, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    res = b.intersect(o, d)
    # compare against the f32 pipeline (loose tolerance)
    from tinybvh_tpu.core.intersect import brute_force_closest

    ref = brute_force_closest(make_rays(o.astype(np.float32),
                                        d.astype(np.float32)),
                              jnp.asarray(tris, jnp.float32))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(res["prim"] < 0, miss)
    np.testing.assert_allclose(res["t"][~miss], np.asarray(ref.t)[~miss],
                               rtol=1e-4)


# ---------------- double-precision TLAS (BLASInstanceEx) -------------------
def _unit_quad64():
    return np.array([
        [[-0.5, 0, -0.5], [0.5, 0, -0.5], [0.5, 0, 0.5]],
        [[-0.5, 0, -0.5], [0.5, 0, 0.5], [-0.5, 0, 0.5]],
    ], np.float64)


def test_tlas_double_instancing():
    """Two translated instances of one BLAS at planetary offsets that f32
    cannot represent — the double TLAS must resolve both exactly."""
    from tinybvh_tpu.ops.f64 import BLASInstanceEx, BVHDouble, TLASDouble

    blas = BVHDouble(_unit_quad64())
    big = 1e9  # offset where f32 quantizes to ~64 m steps
    t0 = np.eye(4)
    t0[:3, 3] = [big, 0.0, 0.0]
    t1 = np.eye(4)
    t1[:3, 3] = [big, 10.0, 0.0]
    tlas = TLASDouble([BLASInstanceEx(0, t0), BLASInstanceEx(0, t1)], [blas])

    o = np.array([[big, 5.0, 0.0], [big, 5.0, 0.0]], np.float64)
    d = np.array([[0, -1.0, 0], [0, 1.0, 0]], np.float64)
    h = tlas.intersect(o, d)
    np.testing.assert_allclose(h["t"], [5.0, 5.0], rtol=1e-12)
    assert h["inst"].tolist() == [0, 1]
    assert (h["prim"] >= 0).all()

    # occlusion: down-ray blocked, horizontal ray free
    occ = tlas.is_occluded(o, np.array([[0, -1, 0], [1, 0, 0]], np.float64))
    assert occ.tolist() == [True, False]


def test_tlas_double_mask_and_scale():
    """Instance visibility masks (≙ inst.mask & ray.mask) and non-uniform
    scale with un-normalized BLAS-space direction keeping world t."""
    from tinybvh_tpu.ops.f64 import BLASInstanceEx, BVHDouble, TLASDouble

    blas = BVHDouble(_unit_quad64())
    t0 = np.diag([3.0, 1.0, 3.0, 1.0])  # scale quad to 3x3
    i0 = BLASInstanceEx(0, t0, mask=0x1)
    tlas = TLASDouble([i0], [blas])
    o = np.array([[1.2, 4.0, 1.2]], np.float64)  # outside unit quad, inside scaled
    d = np.array([[0, -1.0, 0]], np.float64)
    h = tlas.intersect(o, d, mask=0x1)
    np.testing.assert_allclose(h["t"], [4.0], rtol=1e-12)
    # masked out -> miss
    h2 = tlas.intersect(o, d, mask=0x2)
    assert h2["prim"].tolist() == [-1]


def test_bvh_double_is_occluded():
    from tinybvh_tpu.ops.f64 import BVHDouble

    blas = BVHDouble(_unit_quad64())
    o = np.array([[0, 1.0, 0], [2.0, 1.0, 0]], np.float64)
    d = np.array([[0, -1.0, 0], [0, -1.0, 0]], np.float64)
    occ = blas.is_occluded(o, d)
    assert occ.tolist() == [True, False]
