"""Reinsertion optimizer + EPO metric tests."""

import jax.numpy as jnp
import numpy as np

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.builders.optimize import epo_cost, optimize_reinsertion
from tinybvh_tpu.core.intersect import brute_force_closest
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.io.loaders import random_tris
from tinybvh_tpu.layouts.bvh2 import sah_cost, validate_host
from tinybvh_tpu.traverse.stack import intersect_bvh2, pack_tris


def test_optimize_regroups_hand_case():
    """Mismatched leaf pairing (0,10)/(1,11) must regroup to (0,1)/(10,11)
    — the canonical reinsertion win."""
    import jax.numpy as jnp

    from tinybvh_tpu.layouts.bvh2 import BVH2

    def box(x):
        return (np.array([x, 0, 0], np.float32),
                np.array([x + 1, 1, 1], np.float32))

    mn = np.full((10, 3), 1e30, np.float32)
    mx = np.full((10, 3), -1e30, np.float32)
    lf = np.zeros(10, np.int64)
    ct = np.zeros(10, np.int64)
    mn[0], mx[0] = box(0)[0], box(11)[1]
    lf[0] = 2
    for slot, xs in ((4, 0), (5, 10), (6, 1), (7, 11)):
        mn[slot], mx[slot] = box(xs)
        ct[slot] = 1
        lf[slot] = {4: 0, 5: 1, 6: 2, 7: 3}[slot]
    mn[2] = np.minimum(mn[4], mn[5]); mx[2] = np.maximum(mx[4], mx[5]); lf[2] = 4
    mn[3] = np.minimum(mn[6], mn[7]); mx[3] = np.maximum(mx[6], mx[7]); lf[3] = 6
    bvh = BVH2(
        node_min=jnp.asarray(mn), node_max=jnp.asarray(mx),
        left_first=jnp.asarray(lf, jnp.int32), count=jnp.asarray(ct, jnp.int32),
        prim_idx=jnp.arange(4, dtype=jnp.int32),
        n_nodes=jnp.asarray(8, jnp.int32),
    )
    before = float(sah_cost(bvh))
    opt = optimize_reinsertion(bvh, passes=8, batch=4)
    after = float(sah_cost(opt))
    assert after < before * 0.7  # 3.32 → 1.88 on this scene
    validate_host(opt, strict_perm=True)


def test_optimize_never_worse_on_median_tree(rng):
    tris = random_tris(1500, seed=8)
    bad = build_binned(tris, strategy="median")
    before = float(sah_cost(bad))
    opt = optimize_reinsertion(bad, passes=6, batch=64)
    after = float(sah_cost(opt))
    assert after <= before + 1e-4  # rollback guarantees no regression
    validate_host(opt, tris)


def test_optimize_keeps_traversal_correct(rng):
    tris = random_tris(800, seed=9)
    bvh = optimize_reinsertion(build_binned(tris, strategy="median"),
                               passes=3, batch=32)
    leaf_max = int(np.asarray(bvh.count).max())
    packed = pack_tris(bvh, jnp.asarray(tris))
    o = rng.uniform(-2, 12, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
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


def test_optimize_sah_tree_not_degraded():
    tris = random_tris(1000, seed=10)
    good = build_binned(tris)
    before = float(sah_cost(good))
    opt = optimize_reinsertion(good, passes=2, batch=24)
    assert float(sah_cost(opt)) <= before + 1e-3


def test_optimize_improves_binned_tree():
    """A real win on a binned-SAH tree over structured geometry — the
    reference's whole point (tiny_bvh_speedtest.cpp "BVH8_CPU optimized"):
    Mcomb-ranked reinsertion must cut SAH measurably, in every mode."""
    from tinybvh_tpu.io.loaders import sphere_tris

    # two interleaved shells: binned SAH leaves improvable overlap
    tris = np.concatenate([
        sphere_tris(24, 48, radius=1.0),
        sphere_tris(24, 48, radius=1.02),
        random_tris(2000, seed=4, extent=2.0, size=0.05) - 1.0,
    ]).astype(np.float32)
    bvh = build_binned(tris)
    before = float(sah_cost(bvh))
    opt = optimize_reinsertion(bvh, passes=8, batch=128)
    gain = 1.0 - float(sah_cost(opt)) / before
    # binned SAH is already strong on this geometry; the reference's own
    # gains at comparable iteration budgets are single-digit percent
    assert gain > 0.005, f"expected >0.5% SAH win, got {gain:.4f}"
    for mode in ("stochastic", "extreme"):
        o = optimize_reinsertion(bvh, passes=3, batch=32, mode=mode)
        assert float(sah_cost(o)) <= before + 1e-3


def test_epo_cost_reasonable():
    tris = random_tris(200, seed=11)
    bvh = build_binned(tris)
    e = epo_cost(bvh, tris)
    s = float(sah_cost(bvh))
    assert np.isfinite(e) and e > 0
    # EPO-blended cost is SAH-dominated scaled by (1-w) plus overlap term
    assert e < s  # w=0.71 shrinks the SAH part; overlap term is small here
