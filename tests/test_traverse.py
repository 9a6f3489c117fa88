"""Traversal golden tests: BVH results must match brute force exactly.

Mirrors (and strengthens) the reference's ValidateTraceResult strategy
(tiny_bvh_speedtest.cpp:338-381): instead of checksums vs the base BVH2, we
compare every traversal against O(R·N) brute-force geometry intersection.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tinybvh_tpu.api import BVH
from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.core.intersect import brute_force_any, brute_force_closest
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.io.loaders import random_tris, sphere_tris
from tinybvh_tpu.traverse.stack import intersect_bvh2, is_occluded_bvh2, pack_tris


def _random_rays(rng, n, extent=10.0):
    o = rng.uniform(-2, extent + 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return make_rays(o, d)


def _check_hits_match(hits, ref, tris, rtol=1e-4):
    """t must match; prim may differ only when two prims are hit at ~equal t."""
    t = np.asarray(hits.t)
    rt = np.asarray(ref.t)
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)
    np.testing.assert_allclose(t[~miss], rt[~miss], rtol=rtol, atol=1e-5)


@pytest.mark.parametrize("n_tris,n_rays", [(10, 64), (500, 256), (5000, 512)])
def test_closest_hit_matches_brute_force(rng, n_tris, n_rays):
    tris = random_tris(n_tris, seed=n_tris)
    bvh = build_binned(tris, max_leaf=8)
    packed = pack_tris(bvh, jnp.asarray(tris))
    rays = _random_rays(rng, n_rays)
    hits = intersect_bvh2(bvh, packed, rays, leaf_max=8)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    _check_hits_match(hits, ref, tris)


def test_closest_hit_sphere_inside_out(rng):
    tris = sphere_tris(16, 32)
    bvh = build_binned(tris, max_leaf=8)
    packed = pack_tris(bvh, jnp.asarray(tris))
    # rays from the center must all hit at t ≈ radius
    n = 128
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(np.zeros((n, 3), np.float32), d)
    hits = intersect_bvh2(bvh, packed, rays, leaf_max=8)
    t = np.asarray(hits.t)
    assert (np.asarray(hits.prim) >= 0).all()
    assert (np.abs(t - 1.0) < 0.05).all()  # coarse sphere tessellation


def test_t_max_clipping(rng):
    tris = random_tris(300, seed=11)
    bvh = build_binned(tris, max_leaf=8)
    packed = pack_tris(bvh, jnp.asarray(tris))
    rays = _random_rays(rng, 256)
    full = intersect_bvh2(bvh, packed, rays, leaf_max=8)
    t_clip = 3.0
    clipped = intersect_bvh2(bvh, packed, rays, t_max=t_clip, leaf_max=8)
    ft = np.asarray(full.t)
    cp = np.asarray(clipped.prim)
    # any hit beyond t_clip must disappear; hits inside must persist
    assert ((ft < t_clip) == (cp >= 0)).all()


def test_any_hit_matches_brute_force(rng):
    tris = random_tris(1000, seed=13)
    bvh = build_binned(tris, max_leaf=8)
    packed = pack_tris(bvh, jnp.asarray(tris))
    rays = _random_rays(rng, 512)
    for t_max in (0.5, 5.0, BVH_FAR):
        occ = is_occluded_bvh2(bvh, packed, rays, t_max, leaf_max=8)
        ref = brute_force_any(rays, jnp.asarray(tris), t_max)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_traversal_cost_counters(rng):
    tris = random_tris(2000, seed=17)
    bvh = build_binned(tris, max_leaf=8)
    packed = pack_tris(bvh, jnp.asarray(tris))
    rays = _random_rays(rng, 128)
    hits, cost = intersect_bvh2(bvh, packed, rays, leaf_max=8, with_cost=True)
    c = np.asarray(cost)
    assert (c >= 1.0).all()  # at least the root is visited
    assert c.mean() < 400  # sane traversal, not brute force


def test_api_end_to_end():
    """The tiny_bvh_minimal equivalent (tiny_bvh_minimal.cpp:20-61)."""
    tris = random_tris(8192, seed=42)
    bvh = BVH(tris)
    bvh.validate()
    h = bvh.intersect_one([5.0, 5.0, -5.0], [0.0, 0.0, 1.0])
    ref = brute_force_closest(
        make_rays([[5.0, 5.0, -5.0]], [[0.0, 0.0, 1.0]]), jnp.asarray(tris)
    )
    assert h["prim"] == int(ref.prim[0])
    occ = bvh.is_occluded(make_rays([[5.0, 5.0, -5.0]], [[0.0, 0.0, 1.0]]),
                          t_max=100.0)
    assert bool(occ[0]) == (h["prim"] >= 0)
