"""SBVH (spatial splits) builder tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.builders.sbvh import build_sbvh
from tinybvh_tpu.core.intersect import brute_force_closest
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.io.loaders import random_tris
from tinybvh_tpu.layouts.bvh2 import sah_cost, validate_host
from tinybvh_tpu.layouts.mbvh import collapse_bvh2
from tinybvh_tpu.traverse.stack import intersect_bvh2, pack_tris
from tinybvh_tpu.traverse.wide import intersect_bvh8


def long_diagonal_tris(n, seed=0):
    """Long thin diagonal triangles — the worst case for object-split BVHs,
    where spatial splits pay off."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 10, (n, 1, 3)).astype(np.float32)
    d = rng.normal(size=(n, 1, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=2, keepdims=True) * 4.0  # length-4 slivers
    w = rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.05
    return np.concatenate([base, base + d, base + d * 0.5 + w], axis=1)


@pytest.mark.parametrize("n", [2, 50, 1000])
def test_sbvh_structure_valid(n):
    tris = random_tris(n, seed=n)
    bvh = build_sbvh(tris)
    # duplicates allowed; check tree structure + every prim present
    validate_host(bvh, strict_perm=False)
    prims = np.unique(np.asarray(bvh.prim_idx))
    np.testing.assert_array_equal(prims, np.arange(n))


def test_sbvh_traversal_matches_brute_force(rng):
    tris = long_diagonal_tris(800, seed=2)
    bvh = build_sbvh(tris, max_leaf=8)
    packed = pack_tris(bvh, jnp.asarray(tris))
    leaf_max = int(np.asarray(bvh.count).max())
    o = rng.uniform(-2, 12, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    hits = intersect_bvh2(bvh, packed, rays, leaf_max=leaf_max)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(hits.t)[~miss], np.asarray(ref.t)[~miss], rtol=1e-4,
        atol=1e-5,
    )


def test_sbvh_improves_sliver_scene():
    tris = long_diagonal_tris(2000, seed=3)
    c_obj = float(sah_cost(build_binned(tris)))
    c_sbvh = float(sah_cost(build_sbvh(tris, max_leaf=None)))
    assert c_sbvh < c_obj  # spatial splits must help on slivers


def test_sbvh_to_bvh8_traversal(rng):
    tris = long_diagonal_tris(500, seed=4)
    bvh = build_sbvh(tris, max_leaf=4)
    bvh8 = collapse_bvh2(bvh, tris)
    o = rng.uniform(-2, 12, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    hits = intersect_bvh8(bvh8, rays)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(hits.t)[~miss], np.asarray(ref.t)[~miss], rtol=1e-4,
        atol=1e-5,
    )
