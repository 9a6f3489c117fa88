"""LBVH (Morton radix tree) builder tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from tinybvh_tpu.builders.lbvh import build_lbvh
from tinybvh_tpu.core.intersect import brute_force_closest
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.io.loaders import random_tris, sphere_tris
from tinybvh_tpu.layouts.bvh2 import sah_cost, validate_host
from tinybvh_tpu.traverse.stack import intersect_bvh2, pack_tris


@pytest.mark.parametrize("n", [1, 2, 3, 17, 256, 3000])
def test_lbvh_valid(n):
    tris = random_tris(n, seed=n + 100)
    bvh = build_lbvh(tris)
    validate_host(bvh, tris)


def test_lbvh_duplicate_centroids():
    tris = np.repeat(random_tris(1, seed=1), 64, axis=0)
    bvh = build_lbvh(tris)
    validate_host(bvh, tris)


def test_lbvh_traversal_matches_brute_force(rng):
    tris = random_tris(2000, seed=31)
    bvh = build_lbvh(tris)
    packed = pack_tris(bvh, jnp.asarray(tris))
    o = rng.uniform(-2, 12, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    hits = intersect_bvh2(bvh, packed, rays, leaf_max=1)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(hits.t)[~miss], np.asarray(ref.t)[~miss], rtol=1e-4
    )


def test_lbvh_quality_reasonable():
    """LBVH SAH should be within ~3x of binned SAH (typically ~1.3-2x)."""
    from tinybvh_tpu.builders.binned import build_binned

    tris = sphere_tris(24, 48)
    c_lbvh = float(sah_cost(build_lbvh(tris)))
    c_sah = float(sah_cost(build_binned(tris)))
    assert c_lbvh < 3.0 * c_sah
