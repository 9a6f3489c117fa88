"""Two-level rayloop engine: exact per-ray TLAS traversal vs brute force
over flattened world-space geometry and vs the lockstep intersect_tlas8."""

import jax.numpy as jnp
import numpy as np
import pytest

from tinybvh_tpu.api import BVH
from tinybvh_tpu.core.intersect import brute_force_closest
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.io.loaders import random_tris, sphere_tris
from tinybvh_tpu.tlas.instance import build_tlas, intersect_tlas8
from tinybvh_tpu.tlas.rayloop import (
    intersect_tlas_rayloop,
    is_occluded_tlas_rayloop,
    make_tlas_rayloop_tables,
)


def _mat(translate=(0, 0, 0), scale=1.0, yaw=0.0):
    m = np.eye(4, dtype=np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]) * scale
    m[:3, 3] = translate
    return m


def _world_tris(tris, m):
    t = np.asarray(tris) @ m[:3, :3].T + m[:3, 3]
    return t.astype(np.float32)


def _rays(rng, n, lo=-3, hi=8):
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return make_rays(o, d)


@pytest.fixture(scope="module")
def inst_scene():
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
    tlas = build_tlas([blas.bvh8], np.stack(mats),
                      host8s=[blas._bvh8_host])
    return tris, tlas, np.concatenate(world)


def test_matches_brute_force(rng, inst_scene):
    tris, tlas, world = inst_scene
    tb = make_tlas_rayloop_tables(tlas)
    rays = _rays(rng, 256)
    h, sovf = intersect_tlas_rayloop(tb, rays, min_size=64, k=4, LQ=12)
    assert not bool(jnp.any(sovf))
    ref = brute_force_closest(rays, jnp.asarray(world))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(h.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(h.t)[~miss], np.asarray(ref.t)[~miss], rtol=2e-4,
        atol=1e-4)
    n = tris.shape[0]
    got_global = np.asarray(h.inst) * n + np.asarray(h.prim)
    eq = got_global[~miss] == np.asarray(ref.prim)[~miss]
    assert eq.mean() > 0.95  # ties at equal t may pick either instance


def test_matches_lockstep_tlas8(rng, inst_scene):
    _, tlas, _ = inst_scene
    tb = make_tlas_rayloop_tables(tlas)
    rays = _rays(rng, 128)
    h, _ = intersect_tlas_rayloop(tb, rays, min_size=64, k=4, LQ=12)
    ho = intersect_tlas8(tlas, rays, BVH_FAR)
    hit = np.asarray(ho.prim) >= 0
    np.testing.assert_array_equal(np.asarray(h.prim) >= 0, hit)
    np.testing.assert_allclose(
        np.asarray(h.t)[hit], np.asarray(ho.t)[hit], rtol=1e-5, atol=1e-6)


def test_occlusion(rng, inst_scene):
    _, tlas, world = inst_scene
    tb = make_tlas_rayloop_tables(tlas)
    rays = _rays(rng, 128)
    ref = brute_force_closest(rays, jnp.asarray(world))
    t_max = jnp.full(128, 6.0, jnp.float32)
    occ, sovf = is_occluded_tlas_rayloop(tb, rays, t_max, min_size=64,
                                         k=4, LQ=12)
    assert not bool(jnp.any(sovf))
    expect = (np.asarray(ref.prim) >= 0) & (np.asarray(ref.t) < 6.0)
    np.testing.assert_array_equal(np.asarray(occ), expect)


def test_instance_masks(rng):
    """Rays masked away from an instance must not hit it."""
    tris = random_tris(64, seed=7)
    blas = BVH(tris)
    mats = np.stack([_mat((0, 0, 0)), _mat((3, 0, 0))])
    masks = np.array([0x1, 0x2], np.int32)
    tlas = build_tlas([blas.bvh8], mats, masks=masks,
                      host8s=[blas._bvh8_host])
    tb = make_tlas_rayloop_tables(tlas)
    rays = _rays(rng, 256, -2, 5)
    rays1 = rays.replace(mask=jnp.full(256, 0x1, jnp.int32))
    h, _ = intersect_tlas_rayloop(tb, rays1, min_size=64, k=4, LQ=12)
    hit = np.asarray(h.prim) >= 0
    assert (np.asarray(h.inst)[hit] == 0).all()
    ref = brute_force_closest(rays, jnp.asarray(np.asarray(tris)))
    np.testing.assert_array_equal(hit, np.asarray(ref.prim) >= 0)


def test_leaf_queue_pause_exactness(rng, inst_scene):
    """A tiny LQ forces mid-round pauses; the result must be unchanged."""
    _, tlas, world = inst_scene
    tb = make_tlas_rayloop_tables(tlas)
    rays = _rays(rng, 128)
    h1, _ = intersect_tlas_rayloop(tb, rays, min_size=64, k=4, LQ=8)
    h2, _ = intersect_tlas_rayloop(tb, rays, min_size=64, k=16, LQ=48)
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(h1.prim), np.asarray(h2.prim))
