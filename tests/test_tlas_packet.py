"""TLAS packet engine tests: per-instance packet2 passes vs the exact
lockstep two-level traversal (validated itself in test_tlas.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tinybvh_tpu.api import BVH
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.io.loaders import sphere_tris
from tinybvh_tpu.tlas.instance import intersect_tlas8
from tinybvh_tpu.tlas.packet import (
    build_tlas_packet, intersect_tlas_packets2, is_occluded_tlas_packets2,
)


def _mat(translate=(0, 0, 0), scale=1.0, yaw=0.0):
    m = np.eye(4, dtype=np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]) * scale
    m[:3, 3] = translate
    return m


@pytest.fixture(scope="module")
def inst_scene():
    tris = sphere_tris(8, 12, radius=0.8)
    blas = BVH(tris).bvh8
    mats = [
        _mat((0, 0, 0)),
        _mat((2.5, 0, 0), scale=0.8, yaw=0.4),
        _mat((0, 2.5, 0), scale=1.2, yaw=1.1),
        _mat((2.5, 2.5, 0), scale=0.6, yaw=2.0),
    ]
    tp = build_tlas_packet([blas], np.stack(mats))
    return tp


def _camera_rays(T=8, seed=5):
    """T 16x16 tiles from one eye, aimed across the 2x2 instance grid."""
    rng = np.random.default_rng(seed)
    eye = np.array([1.2, 1.2, -6.0], np.float32)
    d = []
    for _ in range(T):
        cx, cy = rng.uniform(-0.45, 0.45, 2)
        gx, gy = np.meshgrid((np.arange(16) + 0.5) / 16 * 0.12,
                             (np.arange(16) + 0.5) / 16 * 0.12)
        dd = np.stack([cx + gx, cy + gy, np.full_like(gx, 1.0)], -1)
        dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
        d.append(dd.reshape(-1, 3))
    d = np.concatenate(d).astype(np.float32)
    o = np.broadcast_to(eye, d.shape)
    return make_rays(o, d)


def test_tlas_packet_matches_lockstep(inst_scene):
    tp = inst_scene
    rays = _camera_rays()
    hits, ovf = intersect_tlas_packets2(tp, rays, interpret=True)
    ref = intersect_tlas8(tp.tlas, rays)
    hit_ref = np.asarray(ref.prim) >= 0
    hit_got = np.asarray(hits.prim) >= 0
    assert hit_ref.mean() > 0.1, "camera missed the scene (bad fixture)"
    np.testing.assert_array_equal(hit_got, hit_ref)
    np.testing.assert_allclose(
        np.asarray(hits.t)[hit_ref], np.asarray(ref.t)[hit_ref],
        rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(hits.inst)[hit_ref], np.asarray(ref.inst)[hit_ref])
    # prim is BLAS-local in both engines
    np.testing.assert_array_equal(
        np.asarray(hits.prim)[hit_ref], np.asarray(ref.prim)[hit_ref])


def test_tlas_packet_mask_hides_instance(inst_scene):
    tp = inst_scene
    tp_masked = tp.replace(inst_mask=jnp.asarray([0xFFFF, 0, 0xFFFF, 0xFFFF],
                                                 jnp.int32))
    rays = _camera_rays()
    hits, _ = intersect_tlas_packets2(tp_masked, rays, interpret=True)
    got_inst = np.asarray(hits.inst)
    assert not (got_inst == 1).any()
    # rays that previously hit instance 1 must now see through it
    ref = intersect_tlas8(tp.tlas, rays)
    was1 = np.asarray(ref.inst) == 1
    if was1.any():
        t_new = np.asarray(hits.t)[was1]
        t_old = np.asarray(ref.t)[was1]
        assert (t_new >= t_old - 1e-5).all()


def test_tlas_packet_overflow_retrace(inst_scene):
    """A tiny leaf budget forces overflow; the in-call wavefront retrace
    must still deliver the exact result."""
    tp = inst_scene
    rays = _camera_rays(T=4)
    hits, ovf = intersect_tlas_packets2(
        tp, rays, interpret=True, max_leaves=32, retrace=True)
    ref = intersect_tlas8(tp.tlas, rays)
    hit_ref = np.asarray(ref.prim) >= 0
    np.testing.assert_array_equal(np.asarray(hits.prim) >= 0, hit_ref)
    np.testing.assert_allclose(
        np.asarray(hits.t)[hit_ref], np.asarray(ref.t)[hit_ref],
        rtol=1e-4, atol=1e-5)


def test_tlas_packet_occlusion(inst_scene):
    """Shared-origin shadow segments: occlusion fold across instances
    must match segment tests against the lockstep engine."""
    tp = inst_scene
    rng = np.random.default_rng(11)
    light = np.array([1.2, 1.2, -6.0], np.float32)
    # receiver points across the instance cluster (tile-ordered is only a
    # perf matter; 256-multiple is required)
    pts = rng.uniform(-1.5, 4.0, (512, 3)).astype(np.float32)
    occ, ovf = is_occluded_tlas_packets2(tp, light, pts, interpret=True)
    seg = pts - light[None]
    rays = make_rays(np.broadcast_to(light, pts.shape).copy(), seg)
    ref = intersect_tlas8(tp.tlas, rays)
    ref_occ = (np.asarray(ref.prim) >= 0) & (np.asarray(ref.t) < 1.0 - 1e-3)
    np.testing.assert_array_equal(np.asarray(occ), ref_occ)


def test_bucketed_matches_lockstep(inst_scene):
    """Bucketed (per-tile instance worklist) engine vs exact lockstep."""
    from tinybvh_tpu.tlas.packet import intersect_tlas_packets2_bucketed

    tp = inst_scene
    rays = _camera_rays(T=8)
    hits, ovf = intersect_tlas_packets2_bucketed(
        tp, rays, rounds=4, max_leaves=256, interpret=True, retrace=False)
    assert not np.asarray(ovf).any()
    ref = intersect_tlas8(tp.tlas, rays, BVH_FAR)
    np.testing.assert_array_equal(np.asarray(hits.prim),
                                  np.asarray(ref.prim))
    np.testing.assert_array_equal(np.asarray(hits.inst),
                                  np.asarray(ref.inst))
    ok = np.asarray(ref.prim) >= 0
    np.testing.assert_allclose(np.asarray(hits.t)[ok],
                               np.asarray(ref.t)[ok], rtol=1e-4, atol=1e-5)


def test_bucketed_round_overflow_retraced(inst_scene):
    """rounds smaller than the per-tile candidate count must flag the
    tiles and the wavefront retrace must restore exact hits."""
    from tinybvh_tpu.tlas.packet import intersect_tlas_packets2_bucketed

    tp = inst_scene
    rays = _camera_rays(T=4, seed=11)
    _, ovf0 = intersect_tlas_packets2_bucketed(
        tp, rays, rounds=1, max_leaves=256, interpret=True, retrace=False)
    hits, ovf = intersect_tlas_packets2_bucketed(
        tp, rays, rounds=1, max_leaves=256, interpret=True, retrace=True,
        wf_cap_factor=24)
    ref = intersect_tlas8(tp.tlas, rays, BVH_FAR)
    np.testing.assert_array_equal(np.asarray(hits.prim),
                                  np.asarray(ref.prim))
    np.testing.assert_array_equal(np.asarray(hits.inst),
                                  np.asarray(ref.inst))
    assert not np.asarray(ovf).any()


def test_bucketed_many_instances():
    """64 instances, single shared BLAS (≙ the 3,375-dragon layout,
    tiny_bvh_gpu2.cpp:124-136) — compile cost is one scan body; hits
    must match the lockstep oracle exactly."""
    from tinybvh_tpu.tlas.packet import intersect_tlas_packets2_bucketed

    tris = sphere_tris(6, 10, radius=0.45)
    blas = BVH(tris).bvh8
    rng = np.random.default_rng(3)
    mats = []
    for i in range(64):
        mats.append(_mat(((i % 8) * 1.1, (i // 8) * 1.1, 0),
                         scale=float(rng.uniform(0.5, 1.0)),
                         yaw=float(rng.uniform(0, 3.0))))
    tp = build_tlas_packet([blas], np.stack(mats))
    rays = _camera_rays(T=4, seed=9)
    # recenter the camera on the 8x8 grid
    o = np.asarray(rays.o) + np.array([2.5, 2.5, 0], np.float32)
    rays = make_rays(o, np.asarray(rays.d))
    hits, ovf = intersect_tlas_packets2_bucketed(
        tp, rays, rounds=8, max_leaves=256, interpret=True, retrace=True,
        wf_cap_factor=24)
    ref = intersect_tlas8(tp.tlas, rays, BVH_FAR)
    np.testing.assert_array_equal(np.asarray(hits.prim),
                                  np.asarray(ref.prim))
    np.testing.assert_array_equal(np.asarray(hits.inst),
                                  np.asarray(ref.inst))
    assert not np.asarray(ovf).any()
