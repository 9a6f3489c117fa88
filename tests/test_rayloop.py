"""rayloop engine: exact per-ray traversal vs the brute-force oracle.

Mirrors the validation stance of the reference's speedtest
(ValidateTraceResult, tiny_bvh_speedtest.cpp:338-381) but against O(R·N)
ground truth rather than another BVH.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tinybvh_tpu.api import BVH
from tinybvh_tpu.core.intersect import brute_force_any, brute_force_closest
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.io.loaders import random_tris, sphere_tris
from tinybvh_tpu.traverse.rayloop import (
    intersect_rayloop,
    is_occluded_rayloop,
    make_rayloop_tables,
)


def _rand_rays(scene, R, seed=0):
    rng = np.random.default_rng(seed)
    lo = scene.reshape(-1, 3).min(0)
    hi = scene.reshape(-1, 3).max(0)
    o = (lo - 0.5 * (hi - lo)
         + rng.random((R, 3)).astype(np.float32) * (hi - lo) * 2)
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return make_rays(o.astype(np.float32), d)


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("scene_fn,seed", [
    (lambda: sphere_tris(12, 24), 0),
    (lambda: random_tris(700, seed=5), 1),
])
def test_closest_matches_brute_force(scene_fn, seed, quantized):
    scene = scene_fn()
    bvh = BVH(scene)
    tb = make_rayloop_tables(bvh.bvh8, quantized=quantized,
                             host=bvh._bvh8_host)
    rays = _rand_rays(scene, 1200, seed)
    ref = brute_force_closest(rays, jnp.asarray(scene))
    hits, sovf = intersect_rayloop(tb, rays, min_size=128, k=4, LQ=12)
    assert int(jnp.sum(sovf)) == 0
    np.testing.assert_allclose(np.asarray(hits.t), np.asarray(ref.t),
                               rtol=1e-4, atol=1e-5)
    assert np.mean(np.asarray(hits.prim) == np.asarray(ref.prim)) > 0.999


def test_anyhit_matches_brute_force():
    scene = sphere_tris(10, 20)
    bvh = BVH(scene)
    tb = make_rayloop_tables(bvh.bvh8, host=bvh._bvh8_host)
    rays = _rand_rays(scene, 1000, 2)
    t_max = jnp.full(1000, 0.8, jnp.float32)
    occ, sovf = is_occluded_rayloop(tb, rays, t_max, min_size=128)
    ref = brute_force_any(rays, jnp.asarray(scene), 0.8)
    assert int(jnp.sum(sovf)) == 0
    assert bool(jnp.all(occ == ref))


def test_per_ray_tmax_and_misses():
    scene = sphere_tris(8, 16)
    bvh = BVH(scene)
    tb = make_rayloop_tables(bvh.bvh8, host=bvh._bvh8_host)
    R = 256
    # rays from outside pointing away: all miss
    o = np.full((R, 3), 5.0, np.float32)
    d = np.tile(np.array([[1, 0, 0]], np.float32), (R, 1))
    rays = make_rays(o, d)
    hits, _ = intersect_rayloop(tb, rays, min_size=64)
    assert bool(jnp.all(hits.prim == -1))
    # t_max shorter than the hit distance: becomes a miss
    o = np.tile(np.array([[0, 0, -3.0]], np.float32), (R, 1))
    d = np.tile(np.array([[0, 0, 1.0]], np.float32), (R, 1))
    rays = make_rays(o, d)
    far, _ = intersect_rayloop(tb, rays, min_size=64)
    assert bool(jnp.all(far.prim >= 0))
    near, _ = intersect_rayloop(tb, rays, min_size=64,
                                t_max=jnp.full(R, 1.0, jnp.float32))
    assert bool(jnp.all(near.prim == -1))


def test_tiny_batch_single_level():
    # batches below min_size run a single level to completion
    scene = random_tris(50, seed=9)
    bvh = BVH(scene)
    tb = make_rayloop_tables(bvh.bvh8, host=bvh._bvh8_host)
    rays = _rand_rays(scene, 64, 3)
    ref = brute_force_closest(rays, jnp.asarray(scene))
    hits, _ = intersect_rayloop(tb, rays)
    np.testing.assert_allclose(np.asarray(hits.t), np.asarray(ref.t),
                               rtol=1e-4, atol=1e-5)


def test_device_table_build_matches_host():
    scene = sphere_tris(8, 16)
    bvh = BVH(scene)
    th = make_rayloop_tables(bvh.bvh8, host=bvh._bvh8_host)
    td = make_rayloop_tables(bvh.bvh8)  # device path (tri_edges on device)
    np.testing.assert_allclose(np.asarray(th.leaf_row),
                               np.asarray(td.leaf_row), rtol=1e-6)
    assert bool(jnp.all(th.child == td.child))
