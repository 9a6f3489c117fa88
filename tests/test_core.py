"""Unit tests for the L0/L1 substrate: vec math, slab test, Möller–Trumbore."""

import jax.numpy as jnp
import numpy as np

from tinybvh_tpu.core import intersect as isect
from tinybvh_tpu.core import vecmath as vm
from tinybvh_tpu.core.rays import make_rays


def test_safe_rcp():
    x = jnp.array([2.0, -4.0, 0.0, 1e-30])
    r = np.asarray(vm.safe_rcp(x))
    assert r[0] == 0.5 and r[1] == -0.25
    assert r[2] >= vm.BVH_FAR and r[3] >= vm.BVH_FAR


def test_half_area():
    mn = jnp.array([[0.0, 0.0, 0.0]])
    mx = jnp.array([[2.0, 3.0, 4.0]])
    # half area of 2x3x4 box: (2*3 + 3*4 + 4*2) = 26
    assert float(vm.half_area(mn, mx)[0]) == 26.0
    # empty box → 0
    mn2, mx2 = vm.aabb_empty((1,))
    assert float(vm.half_area(mn2, mx2)[0]) == 0.0


def test_slab_test_basic():
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    rd = vm.safe_rcp(d)
    bmin = jnp.array([[-1.0, -1.0, -1.0]])
    bmax = jnp.array([[1.0, 1.0, 1.0]])
    t = isect.slab_test(o, rd, jnp.array([1e30]), bmin, bmax)
    np.testing.assert_allclose(np.asarray(t), [4.0], rtol=1e-6)
    # pointing away → miss
    t2 = isect.slab_test(o, vm.safe_rcp(-d), jnp.array([1e30]), bmin, bmax)
    assert float(t2[0]) >= vm.BVH_FAR
    # ray origin inside the box → hit with negative entry distance
    o3 = jnp.array([[0.0, 0.0, 0.0]])
    t3 = isect.slab_test(o3, rd, jnp.array([1e30]), bmin, bmax)
    assert float(t3[0]) < 0.0
    # closer existing hit prunes the box
    t4 = isect.slab_test(o, rd, jnp.array([2.0]), bmin, bmax)
    assert float(t4[0]) >= vm.BVH_FAR


def test_moller_trumbore_closed_form():
    # unit triangle in z=0 plane
    tri = jnp.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    v0, e1, e2 = isect.tri_edges(tri)
    o = jnp.array([[0.25, 0.25, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit, t, u, v = isect.moller_trumbore(o, d, v0, e1, e2, jnp.array([1e30]))
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 3.0, rtol=1e-6)
    np.testing.assert_allclose(float(u[0]), 0.25, atol=1e-6)
    np.testing.assert_allclose(float(v[0]), 0.25, atol=1e-6)
    # outside the triangle
    o2 = jnp.array([[0.9, 0.9, -3.0]])
    hit2, _, _, _ = isect.moller_trumbore(o2, d, v0, e1, e2, jnp.array([1e30]))
    assert not bool(hit2[0])
    # parallel ray
    d3 = jnp.array([[1.0, 0.0, 0.0]])
    hit3, _, _, _ = isect.moller_trumbore(o, d3, v0, e1, e2, jnp.array([1e30]))
    assert not bool(hit3[0])


def test_transform_aabb_matches_corner_transform(rng):
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = rng.normal(size=(3, 3))
    m[:3, 3] = rng.normal(size=3)
    bmin = np.array([-1.0, -2.0, -0.5], np.float32)
    bmax = np.array([1.5, 0.5, 2.0], np.float32)
    corners = np.array(
        [[bmin[0] if i & 1 else bmax[0],
          bmin[1] if i & 2 else bmax[1],
          bmin[2] if i & 4 else bmax[2]] for i in range(8)]
    )
    tc = corners @ m[:3, :3].T + m[:3, 3]
    emin, emax = tc.min(axis=0), tc.max(axis=0)
    gmin, gmax = vm.transform_aabb(jnp.asarray(m), jnp.asarray(bmin), jnp.asarray(bmax))
    np.testing.assert_allclose(np.asarray(gmin), emin, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gmax), emax, rtol=1e-5, atol=1e-5)


def test_morton_encode():
    q = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1023, 1023, 1023]],
                  dtype=jnp.uint32)
    codes = np.asarray(vm.morton_encode_3d(q))
    assert codes[0] == 4 and codes[1] == 2 and codes[2] == 1
    assert codes[3] == (1 << 30) - 1


def test_brute_force_against_single_tri():
    tri = jnp.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    rays = make_rays([[0.2, 0.2, -1.0], [5.0, 5.0, -1.0]],
                     [[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    hits = isect.brute_force_closest(rays, tri)
    assert int(hits.prim[0]) == 0 and int(hits.prim[1]) == -1
    np.testing.assert_allclose(float(hits.t[0]), 1.0, rtol=1e-6)
