"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.core.intersect import brute_force_closest
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.io.loaders import random_tris
from tinybvh_tpu.parallel.mesh import (
    make_mesh,
    render_step_dp,
    shard_scene,
    trace_sharded,
)
from tinybvh_tpu.traverse.stack import pack_tris


def _rays(rng, n):
    o = rng.uniform(-2, 12, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return make_rays(o, d)


def test_scene_sharded_trace_matches_brute_force(rng):
    assert len(jax.devices()) >= 8
    mesh = make_mesh(2, 4)
    tris = random_tris(777, seed=21)
    bvhs, packed, gids = shard_scene(tris, 4)
    rays = _rays(rng, 256)
    hits = trace_sharded(mesh, bvhs, packed, gids, rays)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(hits.t)[~miss], np.asarray(ref.t)[~miss], rtol=1e-4
    )


def _tile_rays(T=8, seed=9):
    """Tile-ordered camera rays (16x16 bundles sharing an origin) for the
    packet engine; T tiles = T*256 rays."""
    rng = np.random.default_rng(seed)
    eye = np.array([0.5, 0.5, -4.0], np.float32)
    d = []
    for _ in range(T):
        cx, cy = rng.uniform(0.2, 0.8, 2)
        gx, gy = np.meshgrid((np.arange(16) + 0.5) / 16 * 0.2,
                             (np.arange(16) + 0.5) / 16 * 0.2)
        dd = np.stack([cx + gx, cy + gy, np.full_like(gx, 4.0)], -1)
        dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
        d.append(dd.reshape(-1, 3))
    d = np.concatenate(d).astype(np.float32)
    return make_rays(np.broadcast_to(eye, d.shape).copy(), d)


def test_packet2_dp_matches_single_device():
    """The flagship packet2 engine inside shard_map (VERDICT r2 #5): the
    8-device data-parallel trace must equal the single-device trace
    exactly — each shard runs the identical pipeline on its tile block.
    (No wall-clock speedup assertion here: the 8 'devices' share one
    physical CPU core; scaling is measured on real hardware by bench.py.)"""
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2
    from tinybvh_tpu.parallel.mesh import trace_packets_dp
    from tinybvh_tpu.traverse.packet2 import build_packet_aux, \
        intersect_packets2

    assert len(jax.devices()) >= 8
    tris = random_tris(1500, seed=23)
    b2 = build_binned(tris, max_leaf=4)
    bvh8 = collapse_bvh2(b2, jnp.asarray(tris))
    aux = build_packet_aux(bvh8)
    rays = _tile_rays(T=8)
    mesh = make_mesh(8, 1)
    hits = trace_packets_dp(mesh, bvh8, aux, rays, interpret=True)
    ref, _ = intersect_packets2(bvh8, aux, rays, interpret=True)
    np.testing.assert_array_equal(np.asarray(hits.prim), np.asarray(ref.prim))
    np.testing.assert_allclose(np.asarray(hits.t), np.asarray(ref.t),
                               rtol=1e-5)
    assert (np.asarray(ref.prim) >= 0).mean() > 0.2


def test_packet2_scene_sharded_matches_brute_force():
    """Two-axis mesh with packet2 as the per-shard engine: geometry split
    over 'scene', tiles over 'rays', winners min-combined over ICI."""
    from tinybvh_tpu.parallel.mesh import (
        shard_scene_packets, trace_packets_sharded,
    )

    assert len(jax.devices()) >= 8
    mesh = make_mesh(4, 2)
    tris = random_tris(1200, seed=24)
    b8s, auxes, gids = shard_scene_packets(tris, 2)
    rays = _tile_rays(T=8)
    hits = trace_packets_sharded(mesh, b8s, auxes, gids, rays,
                                 interpret=True)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    miss = np.asarray(ref.prim) < 0
    np.testing.assert_array_equal(np.asarray(hits.prim) < 0, miss)
    np.testing.assert_allclose(
        np.asarray(hits.t)[~miss], np.asarray(ref.t)[~miss], rtol=1e-4)


def test_render_step_dp_runs_sharded(rng):
    mesh = make_mesh(8, 1)
    tris = random_tris(500, seed=22)
    bvh = build_binned(tris, max_leaf=8)
    packed = pack_tris(bvh, jnp.asarray(tris))
    rays = _rays(rng, 512)
    img = render_step_dp(mesh, bvh, packed, rays, [0.3, 0.8, 0.5])
    img = np.asarray(img)
    assert img.shape == (512, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # something was shaded
