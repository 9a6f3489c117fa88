"""Tests: serialization, sphere query, custom primitives, voxel DDA."""

import os

import jax.numpy as jnp
import numpy as np

from tinybvh_tpu.builders.binned import build_binned, build_binned_aabbs
from tinybvh_tpu.core.intersect import sphere_tri_overlap
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.io.loaders import random_tris, sphere_tris
from tinybvh_tpu.io.serialize import cached_build, load_bvh, save_bvh
from tinybvh_tpu.ops.queries import intersect_custom, intersect_sphere
from tinybvh_tpu.ops.voxel import VoxelSet, intersect_voxels
from tinybvh_tpu.traverse.stack import pack_tris


# ---------------- serialization ----------------------------------------
def test_save_load_roundtrip(tmp_path):
    tris = random_tris(300, seed=1)
    bvh = build_binned(tris, max_leaf=4)
    p = str(tmp_path / "a.npz")
    save_bvh(p, bvh)
    back = load_bvh(p)
    np.testing.assert_array_equal(np.asarray(bvh.left_first),
                                  np.asarray(back.left_first))
    np.testing.assert_array_equal(np.asarray(bvh.node_min),
                                  np.asarray(back.node_min))

    from tinybvh_tpu.layouts.mbvh import collapse_bvh2

    bvh8 = collapse_bvh2(bvh, tris)
    p8 = str(tmp_path / "b.npz")
    save_bvh(p8, bvh8)
    back8 = load_bvh(p8)
    np.testing.assert_array_equal(np.asarray(bvh8.child),
                                  np.asarray(back8.child))


def test_load_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.npz")
    np.savez(p, __tag__=np.asarray(999999), junk=np.zeros(3))
    assert load_bvh(p) is None
    with open(str(tmp_path / "noise.npz"), "wb") as f:
        f.write(b"not a npz")
    assert load_bvh(str(tmp_path / "noise.npz")) is None


def test_cached_build(tmp_path):
    tris = random_tris(200, seed=2)
    calls = []

    def builder(t):
        calls.append(1)
        return build_binned(t, max_leaf=4)

    b1 = cached_build(tris, builder, cache_dir=str(tmp_path))
    b2 = cached_build(tris, builder, cache_dir=str(tmp_path))
    assert len(calls) == 1  # second call came from cache
    np.testing.assert_array_equal(np.asarray(b1.count), np.asarray(b2.count))


# ---------------- sphere query ------------------------------------------
def test_sphere_query_matches_brute_force(rng):
    tris = random_tris(600, seed=3)
    bvh = build_binned(tris, max_leaf=8)
    packed = pack_tris(bvh, jnp.asarray(tris))
    q = 128
    centers = rng.uniform(-1, 11, (q, 3)).astype(np.float32)
    radii = rng.uniform(0.05, 1.0, q).astype(np.float32)
    got = intersect_sphere(bvh, packed, centers, radii, leaf_max=8)
    t = jnp.asarray(tris)
    ref = np.asarray(
        sphere_tri_overlap(
            jnp.asarray(centers)[:, None], jnp.asarray(radii)[:, None],
            t[None, :, 0], t[None, :, 1], t[None, :, 2],
        )
    ).any(axis=1)
    np.testing.assert_array_equal(np.asarray(got), ref)


# ---------------- custom primitives (spheres as in tiny_bvh_custom) -----
def test_custom_sphere_primitives(rng):
    """BVH over sphere AABBs + analytic ray/sphere test — the
    tiny_bvh_custom.cpp setup."""
    n = 200
    centers = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    radii = rng.uniform(0.1, 0.4, n).astype(np.float32)
    bvh = build_binned_aabbs(centers - radii[:, None], centers + radii[:, None],
                             max_leaf=4)
    cj = jnp.asarray(centers)
    rj = jnp.asarray(radii)

    def sphere_isect(o, d, pid, t_cur):
        c = cj[pid]  # (R, L, 3)
        r = rj[pid]
        oc = o[:, None, :] - c
        b = jnp.einsum("rlk,rk->rl", oc, d)
        cc = jnp.einsum("rlk,rlk->rl", oc, oc) - r * r
        disc = b * b - cc
        ok = disc >= 0
        sq = jnp.sqrt(jnp.maximum(disc, 0))
        t0 = -b - sq
        t1 = -b + sq
        th = jnp.where(t0 > 1e-5, t0, t1)
        hit = ok & (th > 1e-5) & (th < t_cur[:, None])
        return hit, jnp.where(hit, th, BVH_FAR), th * 0, th * 0

    o = rng.uniform(-2, 12, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    hits = intersect_custom(bvh, rays, sphere_isect, leaf_max=4)

    # brute force reference
    oc = o[:, None, :] - centers[None]
    b = np.einsum("rlk,rk->rl", oc, d)
    cc = np.einsum("rlk,rlk->rl", oc, oc) - radii[None] ** 2
    disc = b * b - cc
    sq = np.sqrt(np.maximum(disc, 0))
    t0 = -b - sq
    t1 = -b + sq
    th = np.where(t0 > 1e-5, t0, t1)
    th = np.where((disc >= 0) & (th > 1e-5), th, BVH_FAR)
    ref_t = th.min(axis=1)
    miss = ref_t >= BVH_FAR
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(hits.t)[~miss], ref_t[~miss], rtol=1e-4, atol=1e-5
    )


# ---------------- voxel DDA ---------------------------------------------
def test_voxel_dda_axis_rays():
    vs = VoxelSet()
    vs.set([100], [128], [128])  # one voxel at x=100
    vox = vs.freeze()
    # ray along +x through that voxel: hits front face at x=100/256
    o = np.array([[-1.0, (128.5) / 256, (128.5) / 256]], np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    t, n, v = intersect_voxels(vox, make_rays(o, d))
    np.testing.assert_allclose(float(t[0]), 1.0 + 100 / 256, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(v)[0], [100, 128, 128])
    np.testing.assert_allclose(np.asarray(n)[0], [-1, 0, 0], atol=1e-6)
    # ray that misses (offset y)
    o2 = np.array([[-1.0, 0.9, 0.5]], np.float32)
    t2, _, _ = intersect_voxels(vox, make_rays(o2, d))
    assert float(t2[0]) >= BVH_FAR


def test_voxel_dda_random_rays_vs_sampling(rng):
    """DDA result must match dense ray-marching ground truth."""
    vs = VoxelSet()
    # a hollow-ish blob of voxels
    xs, ys, zs = [], [], []
    for _ in range(400):
        p = rng.integers(60, 196, 3)
        xs.append(p[0]); ys.append(p[1]); zs.append(p[2])
    vs.set(xs, ys, zs)
    vox = vs.freeze()
    occ = np.zeros((256, 256, 256), bool)
    occ[np.array(xs), np.array(ys), np.array(zs)] = True

    n = 64
    o = rng.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t, _, v = intersect_voxels(vox, make_rays(o, d))
    t = np.asarray(t)
    v = np.asarray(v)
    # march each ray finely; first occupied voxel must match the DDA hit
    for i in range(n):
        ts = np.linspace(0, 3.0, 12000)
        p = (o[i][None] + ts[:, None] * d[i][None]) * 256
        ip = np.floor(p).astype(int)
        ok = ((ip >= 0) & (ip < 256)).all(axis=1)
        occ_hits = np.nonzero(ok & occ[
            ip[:, 0].clip(0, 255), ip[:, 1].clip(0, 255), ip[:, 2].clip(0, 255)
        ])[0]
        if occ_hits.size == 0:
            assert t[i] >= BVH_FAR, i
        else:
            assert t[i] < BVH_FAR, i
            np.testing.assert_array_equal(v[i], ip[occ_hits[0]], err_msg=str(i))


def test_voxel_topgrid_matches_two_level(rng):
    """The 3-level DDA (topgrid, ≙ tiny_bvh.h:3809-3827) must return
    exactly the same hits as the plain grid+brick walk."""
    from tinybvh_tpu.ops.voxel import VoxelSet, intersect_voxels

    v = VoxelSet()
    # sparse clusters far apart — the config the topgrid accelerates
    pts = (rng.integers(0, 4, (40, 3)) * 64
           + rng.integers(0, 8, (40, 3))).astype(np.int64)
    v.set(pts[:, 0], pts[:, 1], pts[:, 2])
    vox = v.freeze()
    vox2 = {k: val for k, val in vox.items() if k != "top"}

    o = rng.uniform(-0.5, 1.5, (256, 3)).astype(np.float32)
    tgt = (pts[rng.integers(0, 40, 256)] + 0.5) / 256.0
    d = tgt.astype(np.float32) - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    t3, n3, v3 = intersect_voxels(vox, rays)
    t2, n2, v2 = intersect_voxels(vox2, rays)
    np.testing.assert_allclose(np.asarray(t3), np.asarray(t2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(v3), np.asarray(v2))
    assert (np.asarray(t3) < 1e29).mean() > 0.5  # rays aimed at voxels hit


def test_save_load_bvh8q(tmp_path):
    """Quantized-layout serialization (≙ CWBVH Save/Load,
    tiny_bvh.h:5786-5820)."""
    from tinybvh_tpu.layouts.cwbvh import quantize_bvh8
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2

    tris = random_tris(300, seed=5)
    q = quantize_bvh8(collapse_bvh2(build_binned(tris, max_leaf=4),
                                    jnp.asarray(tris)))
    p = str(tmp_path / "q.npz")
    save_bvh(p, q)
    back = load_bvh(p)
    np.testing.assert_array_equal(np.asarray(q.qbounds),
                                  np.asarray(back.qbounds))
    np.testing.assert_array_equal(np.asarray(q.child), np.asarray(back.child))
    np.testing.assert_allclose(np.asarray(q.origin), np.asarray(back.origin))
