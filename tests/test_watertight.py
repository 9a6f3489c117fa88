"""Watertight (Woop) + Baldwin–Weber triangle tests — ≙ the reference's
WATERTIGHT_TRITEST path (tiny_bvh.h:8486-8507) and PrecomputeTriangle
(tiny_bvh.h:8577-8604)."""

import numpy as np
import jax.numpy as jnp

from tinybvh_tpu.core.intersect import (
    intersect_baldwin_weber, moller_trumbore, moller_trumbore_watertight,
    precompute_baldwin_weber, tri_edges,
)
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.io.loaders import random_tris


def _random_hits(n=512, seed=0):
    rng = np.random.default_rng(seed)
    tris = random_tris(n, seed=seed)
    # aim rays at points inside each triangle
    w = rng.dirichlet((1, 1, 1), n).astype(np.float32)
    target = np.einsum("nk,nkj->nj", w, tris)
    o = rng.uniform(-5, 15, (n, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return tris, o, d


def test_watertight_matches_moller_trumbore():
    tris, o, d = _random_hits()
    rays = make_rays(o, d)
    v0, e1, e2 = tri_edges(jnp.asarray(tris))
    far = jnp.full(o.shape[0], BVH_FAR)
    h1, t1, u1, v1 = moller_trumbore(rays.o, rays.d, v0, e1, e2, far)
    h2, t2, u2, v2 = moller_trumbore_watertight(
        rays.o, rays.d, rays.rd, jnp.asarray(tris[:, 0]),
        jnp.asarray(tris[:, 1]), jnp.asarray(tris[:, 2]), far)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    m = np.asarray(h1)
    assert m.mean() > 0.9  # the construction aims at the triangles
    np.testing.assert_allclose(np.asarray(t1)[m], np.asarray(t2)[m],
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(u1)[m], np.asarray(u2)[m],
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(v1)[m], np.asarray(v2)[m],
                               rtol=1e-3, atol=2e-3)


def test_watertight_shared_edge_never_leaks():
    """Rays aimed exactly at shared edges must hit at least one of the two
    adjacent triangles — the property plain MT does not guarantee."""
    rng = np.random.default_rng(3)
    leaks = 0
    total = 0
    for trial in range(64):
        # a PLANAR quad split along its diagonal (a folded quad's shared
        # edge can be a silhouette, where missing both is geometrically
        # correct); both tris share edge (p1, p2)
        # p1-p2 on the x-axis, p0 above, p3 below — a true planar quad
        p2d = np.array(
            [[rng.uniform(-0.5, 1.5), rng.uniform(0.2, 1.5)],
             [0.0, 0.0],
             [rng.uniform(0.8, 2.0), 0.0],
             [rng.uniform(-0.5, 1.5), -rng.uniform(0.2, 1.5)]],
            np.float32)
        basis = rng.normal(size=(3, 3)).astype(np.float32)
        basis[0] /= np.linalg.norm(basis[0])
        basis[1] -= basis[1] @ basis[0] * basis[0]
        basis[1] /= np.linalg.norm(basis[1])
        p = p2d @ basis[:2] + rng.uniform(-1, 1, 3).astype(np.float32)
        t0 = np.stack([p[0], p[1], p[2]])
        t1 = np.stack([p[1], p[3], p[2]])
        # aim at points on the shared edge
        lam = rng.uniform(0.05, 0.95, 8).astype(np.float32)
        target = lam[:, None] * p[1] + (1 - lam[:, None]) * p[2]
        o = rng.uniform(2, 4, (8, 3)).astype(np.float32)
        d = target - o
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rays = make_rays(o, d)
        far = jnp.full(8, BVH_FAR)
        hits = []
        for tt in (t0, t1):
            h, _, _, _ = moller_trumbore_watertight(
                rays.o, rays.d, rays.rd,
                jnp.asarray(np.broadcast_to(tt[0], (8, 3))),
                jnp.asarray(np.broadcast_to(tt[1], (8, 3))),
                jnp.asarray(np.broadcast_to(tt[2], (8, 3))), far)
            hits.append(np.asarray(h))
        total += 8
        leaks += int((~(hits[0] | hits[1])).sum())
    assert leaks == 0, f"{leaks}/{total} edge rays leaked"


def test_baldwin_weber_matches_moller_trumbore():
    tris, o, d = _random_hits(seed=7)
    rays = make_rays(o, d)
    v0, e1, e2 = tri_edges(jnp.asarray(tris))
    far = jnp.full(o.shape[0], BVH_FAR)
    h1, t1, u1, v1 = moller_trumbore(rays.o, rays.d, v0, e1, e2, far)
    T = precompute_baldwin_weber(tris)
    h2, t2, u2, v2 = intersect_baldwin_weber(rays.o, rays.d, T, far)
    m = np.asarray(h1)
    # B&W and MT may disagree only on razor-edge cases
    agree = np.mean(np.asarray(h1) == np.asarray(h2))
    assert agree > 0.995, agree
    both = m & np.asarray(h2)
    np.testing.assert_allclose(np.asarray(t1)[both], np.asarray(t2)[both],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(u1)[both], np.asarray(u2)[both],
                               rtol=2e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(v1)[both], np.asarray(v2)[both],
                               rtol=2e-3, atol=3e-3)


# ---- engine-level wiring: Config.tri_test must flip the leaf test ------
# (≙ the reference switching the actual leaf test via WATERTIGHT_TRITEST,
#  tiny_bvh.h:131, 8486-8507)

def _quad_edge_case(seed):
    """A planar quad split along a diagonal + 8 rays aimed exactly at the
    shared edge (the adversarial case where plain MT may miss both)."""
    rng = np.random.default_rng(seed)
    p2d = np.array(
        [[rng.uniform(-0.5, 1.5), rng.uniform(0.2, 1.5)],
         [0.0, 0.0],
         [rng.uniform(0.8, 2.0), 0.0],
         [rng.uniform(-0.5, 1.5), -rng.uniform(0.2, 1.5)]],
        np.float32)
    basis = rng.normal(size=(3, 3)).astype(np.float32)
    basis[0] /= np.linalg.norm(basis[0])
    basis[1] -= basis[1] @ basis[0] * basis[0]
    basis[1] /= np.linalg.norm(basis[1])
    p = p2d @ basis[:2] + rng.uniform(-1, 1, 3).astype(np.float32)
    tris = np.stack([np.stack([p[0], p[1], p[2]]),
                     np.stack([p[1], p[3], p[2]])]).astype(np.float32)
    lam = rng.uniform(0.05, 0.95, 8).astype(np.float32)
    target = lam[:, None] * p[1] + (1 - lam[:, None]) * p[2]
    o = rng.uniform(2, 4, (8, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return tris, make_rays(o, d)


def test_tri_test_engine_parity():
    """All three leaf tests produce brute-force-equal hits through both the
    lockstep and wavefront engines on a generic scene."""
    from tinybvh_tpu.builders.binned import build_binned
    from tinybvh_tpu.core.intersect import brute_force_closest
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2
    from tinybvh_tpu.traverse.stack import intersect_bvh2, pack_tris
    from tinybvh_tpu.traverse.wavefront import intersect_wavefront
    from tinybvh_tpu.io.loaders import sphere_tris

    tris = sphere_tris(8, 16)
    bvh = build_binned(tris, max_leaf=4)
    packed = pack_tris(bvh, jnp.asarray(tris))
    bvh8 = collapse_bvh2(bvh, tris)
    rng = np.random.default_rng(11)
    n = 128
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = -o + rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    rp = np.asarray(ref.prim)
    rt = np.asarray(ref.t)
    for tt in ("mt", "watertight", "baldwin"):
        h1 = intersect_bvh2(bvh, packed, rays, leaf_max=4, tri_test=tt)
        h2, ovf = intersect_wavefront(bvh8, rays, cap_factor=8, tri_test=tt)
        assert not bool(np.asarray(ovf))
        for h in (h1, h2):
            m = np.asarray(h.prim) >= 0
            # a non-MT test may legitimately HIT razor edges the MT-based
            # brute force misses; it must not MISS where MT clearly hits
            assert np.mean((~m) & (rp >= 0)) < 0.01, tt
            assert np.mean(m == (rp >= 0)) > 0.97, tt
            both = m & (rp >= 0)
            np.testing.assert_allclose(np.asarray(h.t)[both], rt[both],
                                       rtol=1e-3, atol=1e-3)


def test_tri_test_config_reaches_engines():
    """use_config(tri_test="watertight") makes BOTH engines watertight:
    shared-edge rays never leak (64 adversarial quads)."""
    from tinybvh_tpu import use_config
    from tinybvh_tpu.builders.binned import build_binned
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2
    from tinybvh_tpu.traverse.stack import intersect_bvh2, pack_tris
    from tinybvh_tpu.traverse.wavefront import intersect_wavefront

    leaks_stack = leaks_wf = 0
    with use_config(tri_test="watertight"):
        for trial in range(16):
            tris, rays = _quad_edge_case(trial)
            bvh = build_binned(tris, max_leaf=2)
            packed = pack_tris(bvh, jnp.asarray(tris))
            h1 = intersect_bvh2(bvh, packed, rays, leaf_max=2)
            leaks_stack += int((np.asarray(h1.prim) < 0).sum())
            bvh8 = collapse_bvh2(bvh, tris)
            h2, _ = intersect_wavefront(bvh8, rays)
            leaks_wf += int((np.asarray(h2.prim) < 0).sum())
    assert leaks_stack == 0, f"lockstep leaked {leaks_stack} edge rays"
    assert leaks_wf == 0, f"wavefront leaked {leaks_wf} edge rays"
