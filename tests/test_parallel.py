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
