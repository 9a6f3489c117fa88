"""Instanced (TLAS) path tracer tests."""

import jax
import numpy as np

from tinybvh_tpu.api import BVH, TLAS
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.render.pathtracer_tlas import trace_paths_tlas
from tests.test_pathtracer import _quad


def _scene():
    """Cornell-ish: box walls as one BLAS instance, light as another."""
    walls = np.concatenate([
        _quad([0, 0, 0], [2, 0, 0], [2, 0, 2], [0, 0, 2]),
        _quad([0, 2, 2], [2, 2, 2], [2, 2, 0], [0, 2, 0]),
        _quad([0, 0, 2], [2, 0, 2], [2, 2, 2], [0, 2, 2]),
        _quad([0, 0, 0], [0, 0, 2], [0, 2, 2], [0, 2, 0]),
        _quad([2, 0, 2], [2, 0, 0], [2, 2, 0], [2, 2, 2]),
    ])
    light = _quad([0.7, 1.98, 1.3], [1.3, 1.98, 1.3],
                  [1.3, 1.98, 0.7], [0.7, 1.98, 0.7])
    b_walls = BVH(walls)
    b_light = BVH(light)
    eye = np.eye(4, dtype=np.float32)
    tlas = TLAS([b_walls, b_light], [(0, eye), (1, eye)])
    inst_albedo = np.array([[0.7, 0.7, 0.7], [0, 0, 0]], np.float32)
    inst_emissive = np.array([[0, 0, 0], [8, 8, 8]], np.float32)
    return (tlas._impl, inst_albedo, inst_emissive,
            light.astype(np.float32), np.full((2, 3), 8.0, np.float32))


def test_tlas_pt_direct_light():
    tlas, alb, emi, lt, le = _scene()
    r = make_rays([[1.0, 1.0, 1.0]], [[0.0, 1.0, 0.0]])
    rad = trace_paths_tlas(tlas, alb, emi, lt, le, r,
                           jax.random.PRNGKey(0), bounces=1)
    assert float(np.asarray(rad)[0].sum()) >= 8.0 * 3 - 1e-3


def test_tlas_pt_lit_interior():
    tlas, alb, emi, lt, le = _scene()
    rng = np.random.default_rng(4)
    n = 256
    o = np.tile(np.array([[1.0, 1.0, 0.2]], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    acc = np.zeros((n, 3), np.float32)
    key = jax.random.PRNGKey(1)
    for _ in range(6):
        key, k = jax.random.split(key)
        acc += np.asarray(trace_paths_tlas(tlas, alb, emi, lt, le, rays, k,
                                           bounces=3))
    acc /= 6
    assert np.isfinite(acc).all()
    assert 0.005 < acc.mean() < 8.0
