"""Per-generation tuning tables (≙ the reference's vendor #define
specialization, tiny_ocl.h:366-369)."""

import numpy as np

from tinybvh_tpu.tuning import Tuning, _TABLES, detect_generation, get_tuning


def test_tables_complete():
    for key, t in _TABLES.items():
        assert isinstance(t, Tuning)
        assert t.max_leaves % 32 == 0, key      # K2f super-block granularity
        assert t.max_blocks % 16 == 0, key
        assert t.mt_precision in ("highest", "vpu")


def test_detect_on_this_backend():
    gen = detect_generation()
    assert gen in _TABLES
    # tests force the CPU backend (conftest)
    assert gen == "cpu"
    assert get_tuning() is _TABLES["cpu"]
    assert get_tuning("v5e").max_blocks == 256


def test_api_packet_path_uses_tuning(rng):
    """engine='packets' resolves its budgets through the table and still
    matches the brute-force oracle."""
    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.core.intersect import brute_force_closest
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.io.loaders import sphere_tris

    tris = np.asarray(sphere_tris(10, 20), np.float32)
    bvh = BVH(tris)
    o = np.tile(np.float32([0, 0, -4]), (512, 1))
    d = np.float32([0, 0, 1]) + rng.standard_normal((512, 3)).astype(
        np.float32) * 0.2
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    h = bvh.intersect(rays, engine="packets")
    href = brute_force_closest(rays, bvh.tris)
    np.testing.assert_allclose(np.asarray(h.t), np.asarray(href.t),
                               rtol=1e-4, atol=1e-5)
