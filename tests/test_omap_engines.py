"""Opacity micromaps in the FAST engines (wavefront + packet2) and the
texture-driven baker — ≙ the reference's foliage path, which consults
omaps on every traversal route (tiny_bvh.h:8514-8522) and bakes them from
alpha textures over mesh UVs (tiny_scene.h:1682-1750)."""

import numpy as np
import jax.numpy as jnp

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.io.loaders import random_tris
from tinybvh_tpu.layouts.mbvh import collapse_bvh2
from tinybvh_tpu.ops.omap import bake_omap, bake_omap_texture, leaf_align
from tinybvh_tpu.traverse.packet2 import (
    build_packet_aux, intersect_packets2, is_occluded_packets2,
)
from tinybvh_tpu.traverse.wavefront import (
    intersect_wavefront, is_occluded_wavefront,
)
from tinybvh_tpu.traverse.wide import intersect_bvh8


def _quad(z, size=8.0):
    """Two triangles spanning [0,size]² at depth z."""
    return np.array(
        [[[0, 0, z], [size, 0, z], [0, size, z]],
         [[size, size, z], [0, size, z], [size, 0, z]]], np.float32)


def _scene_with_alpha_quad():
    """An alpha-checkered quad at z=1 in front of a solid quad at z=3."""
    tris = np.concatenate([_quad(1.0), _quad(3.0)])
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    # checkerboard alpha texture; quad UVs = xy/size. 8x8 texels so the
    # S=8 micro-cells sample it 1:1 (a finer checker would alias)
    tex = np.indices((8, 8)).sum(axis=0) % 2 == 0
    uv = np.zeros((4, 3, 2), np.float32)
    uv[0] = [[0, 0], [1, 0], [0, 1]]
    uv[1] = [[1, 1], [0, 1], [1, 0]]
    uv[2:] = 1.0  # back quad: opaque texel region irrelevant (no omap)
    om = bake_omap_texture(uv[:2], tex.astype(np.float32), S=8)
    # back quad fully opaque
    om_full = np.concatenate(
        [np.asarray(om), np.ones((2, 8, 8), bool)]).astype(bool)
    om_leaf = leaf_align(jnp.asarray(om_full), bvh8)
    return tris, bvh8, om_leaf


def test_wavefront_omap_matches_lockstep():
    tris, bvh8, om_leaf = _scene_with_alpha_quad()
    rng = np.random.default_rng(5)
    o = np.stack([rng.uniform(0.5, 7.5, 256), rng.uniform(0.5, 7.5, 256),
                  np.full(256, -2.0)], axis=1).astype(np.float32)
    d = np.tile(np.array([[0, 0, 1.0]], np.float32), (256, 1))
    rays = make_rays(o, d)
    ref = intersect_bvh8(bvh8, rays, omap=om_leaf)   # validated engine
    h, _ = intersect_wavefront(bvh8, rays, omap=om_leaf)
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(ref.prim))
    # transparent cells must reveal the back quad (prim 2/3), not miss
    back = np.asarray(h.prim) >= 2
    assert back.any() and (np.asarray(h.prim) >= 0).all()
    occ = is_occluded_wavefront(bvh8, rays, t_max=2.0, omap=om_leaf)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref.t) < 2.0)


def test_packet2_omap_perforated_shadow():
    """The fused packet kernel's in-G-row alpha test agrees with the
    wavefront result; a checkerboard quad casts a perforated shadow."""
    tris, bvh8, om_leaf = _scene_with_alpha_quad()
    aux = build_packet_aux(bvh8, omap=om_leaf)
    assert aux.omap_s == 8
    # one 256-ray tile of parallel rays through the checker quad
    g = (np.arange(16) + 0.5) / 16 * 8.0
    gx, gy = np.meshgrid(g, g)
    o = np.stack([gx, gy, np.full_like(gx, -2.0)], -1).reshape(-1, 3)
    d = np.tile(np.array([[0, 0, 1.0]], np.float32), (256, 1))
    rays = make_rays(o.astype(np.float32), d)
    ref, _ = intersect_wavefront(bvh8, rays, omap=om_leaf)
    h, ovf = intersect_packets2(bvh8, aux, rays, max_leaves=64,
                                interpret=True, retrace=False)
    assert not bool(np.asarray(ovf).any())
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(ref.prim))
    hit_front = np.asarray(h.prim) < 2
    assert hit_front.any() and (~hit_front).any()   # perforated

    # shadow bundle from a point light behind the camera: occlusion must
    # show the same perforation pattern
    light = np.array([4.0, 4.0, -6.0], np.float32)
    pts = (o + np.array([0, 0, 4.5])).astype(np.float32)  # behind z=1 quad
    occ, ovf2 = is_occluded_packets2(bvh8, aux, light, pts, max_leaves=64,
                                     interpret=True, retrace=False)
    assert not bool(np.asarray(ovf2).any())
    occ = np.asarray(occ)
    assert occ.any() and (~occ).any()


def test_packet2_omap_absent_is_noop(rng):
    tris = random_tris(500, seed=3)
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    om = bake_omap(500, lambda p, u, v: np.ones_like(p, bool), S=4)
    aux_o = build_packet_aux(bvh8, omap=leaf_align(om, bvh8))
    aux_p = build_packet_aux(bvh8)
    o = rng.uniform(-1, 11, (256, 3)).astype(np.float32)
    c = np.float32([5, 5, 5]) - o
    d = (c / np.linalg.norm(c, axis=1, keepdims=True)).astype(np.float32)
    rays = make_rays(o, d)
    h1, _ = intersect_packets2(bvh8, aux_o, rays, max_leaves=256,
                               interpret=True, retrace=False)
    h2, _ = intersect_packets2(bvh8, aux_p, rays, max_leaves=256,
                               interpret=True, retrace=False)
    np.testing.assert_array_equal(np.asarray(h1.prim), np.asarray(h2.prim))
