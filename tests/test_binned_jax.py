"""On-device binned-SAH builder: validity, quality parity, traversal."""

import jax.numpy as jnp
import numpy as np
import pytest

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.builders.binned_jax import build_binned_device
from tinybvh_tpu.core.intersect import brute_force_closest
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.io.loaders import random_tris, sphere_tris
from tinybvh_tpu.layouts.bvh2 import sah_cost, validate_host
from tinybvh_tpu.layouts.mbvh import collapse_bvh2
from tinybvh_tpu.traverse.wide import intersect_bvh8


@pytest.mark.parametrize("n", [2, 33, 700])
def test_device_build_valid(n):
    tris = random_tris(n, seed=n + 50)
    bvh = build_binned_device(tris)
    validate_host(bvh, tris)


def test_device_build_quality_parity():
    """Device builder must match the host binned builder's SAH within 5%
    (identical algorithm, different tie-breaking)."""
    tris = sphere_tris(24, 48)
    c_host = float(sah_cost(build_binned(tris, max_leaf=4)))
    c_dev = float(sah_cost(build_binned_device(tris, max_leaf=4)))
    assert c_dev < c_host * 1.05


def test_device_build_traversal(rng):
    tris = random_tris(1200, seed=55)
    bvh = build_binned_device(tris)
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
