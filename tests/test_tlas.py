"""TLAS/instancing tests: two-level traversal vs brute force over
world-space transformed geometry."""

import jax.numpy as jnp
import numpy as np
import pytest

from tinybvh_tpu.api import BVH, TLAS
from tinybvh_tpu.core.intersect import brute_force_closest
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.io.loaders import random_tris, sphere_tris


def _mat(translate=(0, 0, 0), scale=1.0, yaw=0.0):
    m = np.eye(4, dtype=np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]) * scale
    m[:3, 3] = translate
    return m


def _world_tris(tris, m):
    t = np.asarray(tris) @ m[:3, :3].T + m[:3, 3]
    return t.astype(np.float32)


def _rays(rng, n, lo=-5, hi=15):
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return make_rays(o, d)


def test_single_instance_identity(rng):
    tris = random_tris(300, seed=41)
    blas = BVH(tris)
    tlas = TLAS([blas], np.eye(4, dtype=np.float32)[None])
    rays = _rays(rng, 128)
    h = tlas.intersect(rays)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(h.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(h.t)[~miss], np.asarray(ref.t)[~miss], rtol=1e-4, atol=1e-5
    )
    assert (np.asarray(h.inst)[~miss] == 0).all()


def test_grid_of_instances_matches_flattened(rng):
    """2x2x2 instance grid (the tiny_bvh_anim.cpp:147-165 setup) must equal
    brute force over the flattened world-space geometry."""
    tris = sphere_tris(8, 12, radius=0.8)
    blas = BVH(tris)
    mats, world = [], []
    for i in range(8):
        m = _mat(
            translate=(4.0 * (i & 1), 4.0 * ((i >> 1) & 1), 4.0 * (i >> 2)),
            scale=0.7 + 0.1 * i,
            yaw=0.3 * i,
        )
        mats.append(m)
        world.append(_world_tris(tris, m))
    tlas = TLAS([blas], np.stack(mats))
    rays = _rays(rng, 256, -3, 8)
    h = tlas.intersect(rays)
    allw = jnp.asarray(np.concatenate(world))
    ref = brute_force_closest(rays, allw)
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(h.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(h.t)[~miss], np.asarray(ref.t)[~miss], rtol=2e-4, atol=1e-4
    )
    # instance + local prim must identify the same world triangle
    n = tris.shape[0]
    got_global = np.asarray(h.inst) * n + np.asarray(h.prim)
    ref_global = np.asarray(ref.prim)
    eq = got_global[~miss] == ref_global[~miss]
    # ties at equal t may pick either instance; t already matched above
    assert eq.mean() > 0.95


def test_mixed_blases(rng):
    trisA = random_tris(200, seed=51)
    trisB = sphere_tris(8, 12, radius=1.2)
    a, b = BVH(trisA), BVH(trisB)
    pairs = [
        (0, _mat((0, 0, 0))),
        (1, _mat((12, 0, 0))),
        (1, _mat((0, 12, 0), scale=2.0)),
    ]
    tlas = TLAS([a, b], pairs)
    world = np.concatenate([
        _world_tris(trisA, pairs[0][1]),
        _world_tris(trisB, pairs[1][1]),
        _world_tris(trisB, pairs[2][1]),
    ])
    rays = _rays(rng, 256, -3, 16)
    h = tlas.intersect(rays)
    ref = brute_force_closest(rays, jnp.asarray(world))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(h.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(h.t)[~miss], np.asarray(ref.t)[~miss], rtol=2e-4, atol=1e-4
    )


def test_instance_masks(rng):
    tris = sphere_tris(8, 12)
    blas = BVH(tris)
    mats = np.stack([_mat((0, 0, 0)), _mat((0, 0, 0))])  # two co-located
    tlas = TLAS([blas], mats, masks=[0x0001, 0x0002])
    o = np.zeros((4, 3), np.float32)
    d = np.tile(np.array([[1, 0, 0]], np.float32), (4, 1))
    # mask 1 sees only instance 0, mask 2 only instance 1
    r1 = make_rays(o, d, mask=np.full(4, 0x0001, np.int32))
    r2 = make_rays(o, d, mask=np.full(4, 0x0002, np.int32))
    h1 = tlas.intersect(r1)
    h2 = tlas.intersect(r2)
    assert (np.asarray(h1.inst) == 0).all()
    assert (np.asarray(h2.inst) == 1).all()
    # mask 4 sees nothing
    r3 = make_rays(o, d, mask=np.full(4, 0x0004, np.int32))
    h3 = tlas.intersect(r3)
    assert (np.asarray(h3.prim) == -1).all()


def test_tlas_occlusion(rng):
    tris = sphere_tris(10, 16)
    blas = BVH(tris)
    tlas = TLAS([blas], np.stack([_mat((0, 0, 0)), _mat((5, 0, 0))]))
    o = np.array([[-3, 0, 0]], np.float32)
    d = np.array([[1, 0, 0]], np.float32)
    r = make_rays(o, d)
    assert bool(tlas.is_occluded(r, t_max=10.0)[0])
    assert not bool(tlas.is_occluded(r, t_max=1.0)[0])  # sphere starts at x=-1


def test_tlas_occlusion_early_exit_vs_brute_force(rng):
    """Any-hit wavefront occlusion (≙ IsOccludedTLAS tiny_bvh.h:3455) must
    agree with brute force over the flattened world geometry for random
    rays and finite t_max values."""
    tris = sphere_tris(6, 10)
    blas = BVH(tris)
    mats = np.stack([_mat((0, 0, 0)), _mat((3, 1, 0)), _mat((-2, -1, 2))])
    tlas = TLAS([blas], mats)
    world = np.concatenate(
        [tris + np.array(t, np.float32) for t in
         [(0, 0, 0), (3, 1, 0), (-2, -1, 2)]])
    o = rng.uniform(-6, 6, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    ref = brute_force_closest(rays, jnp.asarray(world))
    for t_max in (0.5, 2.0, 1e30):
        occ = np.asarray(tlas.is_occluded(rays, t_max=t_max))
        expect = np.asarray(ref.t) < t_max
        np.testing.assert_array_equal(occ, expect)


def test_tlas_wavefront_matches_lockstep(rng):
    """The wavefront two-level traversal must agree with the lockstep one."""
    from tinybvh_tpu.tlas.instance import (
        intersect_tlas8, intersect_tlas_wavefront,
    )

    trisA = random_tris(300, seed=61)
    trisB = sphere_tris(8, 12, radius=1.2)
    a, b = BVH(trisA), BVH(trisB)
    pairs = [(0, _mat((0, 0, 0))), (1, _mat((12, 0, 0))),
             (1, _mat((0, 12, 0), scale=2.0))]
    tlas = TLAS([a, b], pairs)
    rays = _rays(rng, 512, -3, 16)
    h_ref = intersect_tlas8(tlas._impl, rays)
    h_wf, ovf = intersect_tlas_wavefront(tlas._impl, rays)
    assert not bool(ovf)
    miss = np.asarray(h_ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(h_wf.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(h_wf.t)[~miss], np.asarray(h_ref.t)[~miss], rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(h_wf.inst), np.asarray(h_ref.inst))


def test_tlas_wavefront_masks():
    from tinybvh_tpu.tlas.instance import intersect_tlas_wavefront

    tris = sphere_tris(8, 12)
    blas = BVH(tris)
    mats = np.stack([_mat((0, 0, 0)), _mat((0, 0, 0))])
    tlas = TLAS([blas], mats, masks=[0x0001, 0x0002])
    o = np.zeros((4, 3), np.float32)
    d = np.tile(np.array([[1, 0, 0]], np.float32), (4, 1))
    r2 = make_rays(o, d, mask=np.full(4, 0x0002, np.int32))
    h2, _ = intersect_tlas_wavefront(tlas._impl, r2)
    assert (np.asarray(h2.inst) == 1).all()


def test_voxel_blas_in_tlas():
    """VoxelSet as a TLAS leaf (≙ the blas->layout == LAYOUT_VOXELSET
    dispatch, tiny_bvh.h:3357): triangle hits and voxel hits min-fold
    into one Hits record with exact distances in both frames."""
    # own generator, NOT the session rng fixture: the sanity guard below
    # (>=1 tri hit AND >=1 voxel win) depends on the exact ray draw, and
    # the shared fixture's state varies with test execution order
    rng = np.random.default_rng(7)
    from tinybvh_tpu.ops.voxel import VoxelSet, intersect_voxels
    from tinybvh_tpu.tlas.voxel_blas import (
        intersect_tlas_voxels, is_occluded_tlas_voxels, voxel_instance,
    )

    tris = sphere_tris(8, 12, radius=0.8)
    blas = BVH(tris)
    tlas = TLAS([blas], np.eye(4, dtype=np.float32)[None])

    # solid voxel slab placed beside the sphere via a transform
    v = VoxelSet()
    xs, ys, zs = np.meshgrid(np.arange(40, 216), np.arange(100, 130),
                             np.arange(40, 216), indexing="ij")
    v.set(xs.ravel(), ys.ravel(), zs.ravel())
    m = _mat(translate=(3.0, -2.0, 0.0), scale=4.0)
    vi = voxel_instance(v.freeze(), m)

    rays = _rays(rng, 256, lo=-4, hi=8)
    hits, _ = intersect_tlas_voxels(tlas._impl, [vi], rays)

    # reference: triangle-only TLAS + voxel DDA in the instance frame
    h_tri = tlas.intersect(rays)
    minv = np.linalg.inv(m)
    o2 = np.asarray(rays.o) @ minv[:3, :3].T + minv[:3, 3]
    d2 = np.asarray(rays.d) @ minv[:3, :3].T
    tv, _, _ = intersect_voxels(v.freeze(), make_rays(o2, d2))
    tv = np.asarray(tv)
    tt = np.asarray(h_tri.t)
    want_t = np.minimum(tv, tt)
    np.testing.assert_allclose(np.asarray(hits.t), want_t,
                               rtol=1e-4, atol=1e-5)
    vox_wins = tv < tt
    assert vox_wins.any() and (~vox_wins & (tt < BVH_FAR / 2)).any()
    np.testing.assert_array_equal(np.asarray(hits.inst)[vox_wins], 1)
    assert (np.asarray(hits.prim)[vox_wins] >= 0).all()

    # occlusion agrees with closest-hit
    occ, _ = is_occluded_tlas_voxels(tlas._impl, [vi], rays, 6.0)
    np.testing.assert_array_equal(np.asarray(occ), want_t < 6.0)

    # masked-out voxel instance contributes nothing
    vi_masked = voxel_instance(v.freeze(), m, mask=0x0002)
    rays1 = make_rays(rays.o, rays.d,
                      mask=np.full(rays.o.shape[0], 0x0001, np.int32))
    h2, _ = intersect_tlas_voxels(tlas._impl, [vi_masked], rays1)
    np.testing.assert_allclose(np.asarray(h2.t), tt, rtol=1e-4, atol=1e-5)
