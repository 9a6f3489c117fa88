"""8-wide layout + traversal tests: golden vs brute force and vs BVH2."""

import jax.numpy as jnp
import numpy as np
import pytest

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.core.intersect import brute_force_any, brute_force_closest
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.io.loaders import random_tris, sphere_tris
from tinybvh_tpu.layouts.mbvh import collapse_bvh2
from tinybvh_tpu.traverse.wide import intersect_bvh8, is_occluded_bvh8


def _rays(rng, n, extent=10.0):
    o = rng.uniform(-2, extent + 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return make_rays(o, d)


@pytest.mark.parametrize("n_tris", [1, 5, 80, 2000])
def test_bvh8_matches_brute_force(rng, n_tris):
    tris = random_tris(n_tris, seed=n_tris + 7)
    bvh2 = build_binned(tris, max_leaf=4)
    bvh8 = collapse_bvh2(bvh2, tris)
    rays = _rays(rng, 256)
    hits = intersect_bvh8(bvh8, rays)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(hits.t)[~miss], np.asarray(ref.t)[~miss], rtol=1e-4,
        atol=1e-5,
    )


def test_bvh8_structure():
    tris = random_tris(500, seed=3)
    bvh2 = build_binned(tris, max_leaf=4)
    bvh8 = collapse_bvh2(bvh2, tris)
    child = np.asarray(bvh8.child)
    # every leaf row referenced at most once; all prims present exactly once
    prims = np.asarray(bvh8.leaf_prim).reshape(-1)
    prims = np.sort(prims[prims >= 0])
    np.testing.assert_array_equal(prims, np.arange(500))
    # interior child references are in range
    from tinybvh_tpu.layouts.mbvh import EMPTY_SLOT

    nodes = child[child >= 0]
    assert nodes.max(initial=0) < bvh8.n_nodes
    leaves = -child[(child < 0) & (child != EMPTY_SLOT)] - 1
    assert leaves.max(initial=0) < bvh8.n_leaves


def test_bvh8_occlusion(rng):
    tris = random_tris(800, seed=5)
    bvh2 = build_binned(tris, max_leaf=4)
    bvh8 = collapse_bvh2(bvh2, tris)
    rays = _rays(rng, 512)
    for t_max in (1.0, BVH_FAR):
        occ = is_occluded_bvh8(bvh8, rays, t_max)
        ref = brute_force_any(rays, jnp.asarray(tris), t_max)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_bvh8_sphere_closed_surface(rng):
    tris = sphere_tris(16, 32)
    bvh2 = build_binned(tris, max_leaf=4)
    bvh8 = collapse_bvh2(bvh2, tris)
    n = 256
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(np.zeros((n, 3), np.float32), d)
    hits = intersect_bvh8(bvh8, rays)
    assert (np.asarray(hits.prim) >= 0).all()
    assert (np.abs(np.asarray(hits.t) - 1.0) < 0.05).all()


def test_api_uses_bvh8_by_default():
    from tinybvh_tpu.api import BVH

    tris = random_tris(300, seed=6)
    b = BVH(tris)
    assert b.bvh8 is not None
    h = b.intersect_one([5.0, 5.0, -5.0], [0.0, 0.0, 1.0])
    ref = brute_force_closest(
        make_rays([[5.0, 5.0, -5.0]], [[0.0, 0.0, 1.0]]), jnp.asarray(tris)
    )
    assert h["prim"] == int(ref.prim[0])


def test_bvh4_width_collapse(rng):
    """width=4 collapse (≙ MBVH<4>/BVH4_CPU) traverses identically."""
    tris = random_tris(800, seed=91)
    bvh2 = build_binned(tris, max_leaf=4)
    bvh4 = collapse_bvh2(bvh2, tris, width=4)
    child = np.asarray(bvh4.child)
    from tinybvh_tpu.layouts.mbvh import EMPTY_SLOT

    # at most 4 live slots per node
    assert (child != EMPTY_SLOT).sum(axis=1).max() <= 4
    rays = _rays(rng, 256)
    hits = intersect_bvh8(bvh4, rays)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(hits.t)[~miss], np.asarray(ref.t)[~miss], rtol=1e-4,
        atol=1e-5,
    )
