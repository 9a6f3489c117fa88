"""Packet traversal tests: tiles of coherent pinhole rays vs brute force."""

import jax.numpy as jnp
import numpy as np

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.core.intersect import brute_force_closest
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.io.loaders import random_tris, sphere_tris
from tinybvh_tpu.layouts.mbvh import collapse_bvh2
from tinybvh_tpu.render.camera import auto_camera
from tinybvh_tpu.traverse.packet import intersect_packets


def _tiled_primary_rays(lo, hi, W=32, H=32):
    """Primary rays reordered into 16x16 tiles (the packet layout)."""
    eye, fwd, right, up = auto_camera(lo, hi)
    xs = (np.arange(W) + 0.5) / W - 0.5
    ys = (np.arange(H) + 0.5) / H - 0.5
    gx, gy = np.meshgrid(xs, ys)
    d = (fwd[None, None] + 0.9 * gx[..., None] * right[None, None]
         + 0.9 * gy[..., None] * up[None, None])
    d = d / np.linalg.norm(d, axis=2, keepdims=True)
    # reorder scanlines into 16x16 tiles
    d_t = d.reshape(H // 16, 16, W // 16, 16, 3).transpose(0, 2, 1, 3, 4)
    d_flat = d_t.reshape(-1, 3).astype(np.float32)
    o = np.broadcast_to(eye.astype(np.float32), d_flat.shape)
    return make_rays(o, d_flat)


def test_packets_match_brute_force():
    tris = sphere_tris(24, 48, radius=2.0, center=(0, 0, 0))
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    rays = _tiled_primary_rays(tris.min(axis=(0, 1)), tris.max(axis=(0, 1)))
    hits, overflow = intersect_packets(bvh8, rays, max_leaves=512, chunk=32)
    assert not np.asarray(overflow).any()
    ref = brute_force_closest(rays, jnp.asarray(tris))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(hits.t)[~miss], np.asarray(ref.t)[~miss], rtol=1e-4,
        atol=1e-5,
    )


def test_packets_random_scene():
    tris = random_tris(3000, seed=77)
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    rays = _tiled_primary_rays(tris.min(axis=(0, 1)), tris.max(axis=(0, 1)))
    hits, overflow = intersect_packets(bvh8, rays, max_leaves=512, chunk=32)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    ov = np.asarray(overflow)
    # only validate non-overflow tiles (others would retrace via wavefront)
    keep = ~np.repeat(ov, 256)
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(
        (np.asarray(hits.prim) < 0)[keep], miss[keep])
    both = keep & ~miss
    np.testing.assert_allclose(
        np.asarray(hits.t)[both], np.asarray(ref.t)[both], rtol=1e-4,
        atol=1e-5,
    )


def test_packets_pallas_interpret_matches_xla():
    """The Pallas leaf-resolve path (interpret mode on CPU) must agree with
    the XLA chunked path and brute force, for both kernel block widths."""
    tris = sphere_tris(24, 48, radius=2.0, center=(0, 0, 0))
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    rays = _tiled_primary_rays(tris.min(axis=(0, 1)), tris.max(axis=(0, 1)))
    ref, _ = intersect_packets(bvh8, rays, max_leaves=512, chunk=32)
    got, overflow = intersect_packets(bvh8, rays, max_leaves=512,
                                      use_pallas=True, interpret=True)
    assert not np.asarray(overflow).any()
    np.testing.assert_array_equal(np.asarray(got.prim) < 0,
                                  np.asarray(ref.prim) < 0)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    bf = brute_force_closest(rays, jnp.asarray(tris))
    np.testing.assert_allclose(
        np.where(np.asarray(got.prim) >= 0, np.asarray(got.t), 0),
        np.where(np.asarray(bf.prim) >= 0, np.asarray(bf.t), 0),
        rtol=1e-4, atol=1e-4)


def test_phase1_flat_matches_classic():
    """The flat-pair-buffer phase 1 must produce the same leaf sets per
    tile as the in-loop per-tile list builder."""
    from tinybvh_tpu.traverse.packet import (
        collect_tile_leaves, collect_tile_leaves_flat,
    )

    tris = sphere_tris(24, 48, radius=2.0, center=(0, 0, 0))
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    rays = _tiled_primary_rays(tris.min(axis=(0, 1)), tris.max(axis=(0, 1)))
    T = rays.o.shape[0] // 256
    o = np.asarray(rays.o).reshape(T, 256, 3)
    d = jnp.asarray(rays.d).reshape(T, 256, 3)
    tile_o = jnp.asarray(o[:, 0])
    la, ova = collect_tile_leaves(bvh8, tile_o, d, 512, 64)
    lb, ovb = collect_tile_leaves_flat(bvh8, tile_o, d, 512, 64)
    assert not np.asarray(ova).any() and not np.asarray(ovb).any()
    la, lb = np.asarray(la), np.asarray(lb)
    for t in range(T):
        sa = set(la[t][la[t] != 2**31 - 1].tolist())
        sb = set(lb[t][lb[t] != 2**31 - 1].tolist())
        assert sa == sb, f"tile {t}: {sa ^ sb}"


def test_is_occluded_packets_point_light():
    """Shadow bundles from a point light through the packet tracer must
    match per-segment brute force."""
    from tinybvh_tpu.traverse.packet import is_occluded_packets

    tris = sphere_tris(16, 32, radius=1.0, center=(0, 0, 0))
    rays = _tiled_primary_rays(tris.min(axis=(0, 1)) - 2,
                               tris.max(axis=(0, 1)) + 2)
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    # endpoints: a plane of points behind the sphere (some shadowed) at
    # z=+3, in tile order
    R = rays.o.shape[0]
    g = np.linspace(-2.5, 2.5, 16)
    px, py = np.meshgrid(g, g)
    pts = np.stack([px, py, np.full_like(px, 3.0)], -1).reshape(-1, 3)
    pts = np.tile(pts, (R // 256, 1)).astype(np.float32)
    light = np.array([0.0, 0.0, -4.0], np.float32)

    occ, overflow = is_occluded_packets(bvh8, light, pts, max_leaves=512)
    assert not np.asarray(overflow).any()

    seg = make_rays(np.broadcast_to(light, pts.shape), pts - light)
    bf = brute_force_closest(seg, jnp.asarray(tris))
    ref = (np.asarray(bf.prim) >= 0) & (np.asarray(bf.t) < 1.0 - 1e-3)
    np.testing.assert_array_equal(np.asarray(occ), ref)


def test_sorted_packets_incoherent_rays():
    """Diffuse-style incoherent rays through the sorted-packet path must
    match brute force exactly (culling is conservative)."""
    from tinybvh_tpu.traverse.packet import intersect_packets_sorted

    tris = sphere_tris(16, 32, radius=1.0, center=(0, 0, 0))
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    rng = np.random.default_rng(7)
    R = 1024
    # random origins on a shell around the sphere, random inward-ish dirs
    o = rng.normal(size=(R, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 3.0
    d = rng.normal(size=(R, 3)).astype(np.float32) - o * 0.25
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o.astype(np.float32), d.astype(np.float32))
    hits, ov = intersect_packets_sorted(
        bvh8, rays, tris.min(axis=(0, 1)), tris.max(axis=(0, 1)),
        max_leaves=512)
    bf = brute_force_closest(rays, jnp.asarray(tris))
    ok = ~np.asarray(ov)
    assert ok.mean() > 0.9  # most tiles must fit the leaf budget
    np.testing.assert_array_equal(np.asarray(hits.prim)[ok] < 0,
                                  np.asarray(bf.prim)[ok] < 0)
    hit = ok & (np.asarray(bf.prim) >= 0)
    np.testing.assert_allclose(np.asarray(hits.t)[hit],
                               np.asarray(bf.t)[hit], rtol=1e-4, atol=1e-4)
