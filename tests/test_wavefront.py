"""Wavefront traversal: must match brute force and the stack traversal."""

import jax.numpy as jnp
import numpy as np
import pytest

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.core.intersect import brute_force_any, brute_force_closest
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.io.loaders import random_tris, sphere_tris
from tinybvh_tpu.layouts.mbvh import collapse_bvh2
from tinybvh_tpu.traverse.wavefront import (
    intersect_wavefront,
    is_occluded_wavefront,
)


def _rays(rng, n, extent=10.0):
    o = rng.uniform(-2, extent + 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return make_rays(o, d)


@pytest.mark.parametrize("n_tris", [1, 5, 80, 2000])
def test_wavefront_matches_brute_force(rng, n_tris):
    tris = random_tris(n_tris, seed=n_tris + 7)
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    rays = _rays(rng, 256)
    hits, overflow = intersect_wavefront(bvh8, rays)
    assert not bool(overflow)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(hits.t)[~miss], np.asarray(ref.t)[~miss], rtol=1e-4,
        atol=1e-5,
    )


def test_wavefront_sphere_interior(rng):
    tris = sphere_tris(16, 32)
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    n = 256
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(np.zeros((n, 3), np.float32), d)
    # interior rays overlap nearly every node → needs a large frontier cap
    hits, overflow = intersect_wavefront(bvh8, rays, cap_factor=16)
    assert not bool(overflow)
    assert (np.asarray(hits.prim) >= 0).all()
    assert (np.abs(np.asarray(hits.t) - 1.0) < 0.05).all()


def test_wavefront_any_hit(rng):
    tris = random_tris(900, seed=5)
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    rays = _rays(rng, 512)
    for t_max in (1.0, BVH_FAR):
        occ = is_occluded_wavefront(bvh8, rays, t_max)
        ref = brute_force_any(rays, jnp.asarray(tris), t_max)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_wavefront_t_max(rng):
    tris = random_tris(400, seed=6)
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    rays = _rays(rng, 256)
    full, _ = intersect_wavefront(bvh8, rays)
    clipped, _ = intersect_wavefront(bvh8, rays, t_max=3.0)
    ft = np.asarray(full.t)
    cp = np.asarray(clipped.prim)
    assert ((ft < 3.0) == (cp >= 0)).all()


def test_quantized_cwbvh_matches(rng):
    """Quantized (CWBVH-style) bounds are conservative: identical hits."""
    from tinybvh_tpu.layouts.cwbvh import quantize_bvh8, to_bvh8

    tris = random_tris(1500, seed=44)
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    q = quantize_bvh8(bvh8)
    rays = _rays(rng, 512)
    h_ref, _ = intersect_wavefront(bvh8, rays)
    h_q, ovf = intersect_wavefront(q, rays, cap_factor=4)
    assert not bool(ovf)
    np.testing.assert_array_equal(np.asarray(h_q.prim), np.asarray(h_ref.prim))
    np.testing.assert_allclose(np.asarray(h_q.t), np.asarray(h_ref.t),
                               rtol=1e-6)
    # reconstruction contains the exact bounds
    rec = to_bvh8(q)
    b0 = np.asarray(bvh8.bounds).reshape(-1, 6, 8)
    br = np.asarray(rec.bounds).reshape(-1, 6, 8)
    ok = b0[:, :3] < 1e29  # skip empty slots
    assert (br[:, :3][ok] <= b0[:, :3][ok] + 1e-5).all()
    ok2 = b0[:, 3:] > -1e29
    assert (br[:, 3:][ok2] >= b0[:, 3:][ok2] - 1e-5).all()
