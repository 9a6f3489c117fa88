"""Public api.BVH surface tests."""

import numpy as np

from tinybvh_tpu.api import BVH
from tinybvh_tpu.core.rays import make_rays


def test_from_vertex_buffer_strided_and_indexed(rng):
    """Arbitrary-stride interleaved vertex buffers + indexed triangles
    (≙ bvhvec4slice, tiny_bvh.h:428-436, and the indexed Build overloads)
    must produce the same BVH as the plain (N, 3, 3) input."""
    from tinybvh_tpu.io.loaders import random_tris

    tris = random_tris(64, seed=9)
    verts = tris.reshape(-1, 3)                       # (192, 3) soup
    # interleave: [x y z nx ny nz pad] stride-7 records with offset 2
    buf = np.zeros((verts.shape[0], 7), np.float32)
    buf[:, 2:5] = verts
    flat = np.concatenate([np.zeros(2, np.float32), buf.reshape(-1)])
    b1 = BVH.from_vertex_buffer(flat, stride=7, offset=4)  # 2 pad + 2 in-record
    b0 = BVH(tris)
    assert b1.tris.shape == b0.tris.shape
    np.testing.assert_allclose(np.asarray(b1.tris), np.asarray(b0.tris))

    # indexed: shared vertex pool, (N, 3) indices
    pool, inv = np.unique(verts.round(4), axis=0, return_inverse=True)
    b2 = BVH.from_vertex_buffer(pool.reshape(-1), stride=3,
                                indices=inv.reshape(-1, 3))
    r = make_rays(np.zeros((8, 3), np.float32) - 2.0,
                  rng.normal(size=(8, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(b2.intersect(r).t),
                               np.asarray(b0.intersect(r).t),
                               rtol=1e-3, atol=1e-4)


def test_engine_selection_parity(rng):
    """Every engine choice returns the same exact hits (≙ the reference's
    per-layout Intersect parity in speedtest's ValidateTraceResult)."""
    from tinybvh_tpu.io.loaders import random_tris

    tris = random_tris(400, seed=2)
    b = BVH(tris)
    o = rng.uniform(-2, 12, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    base = b.intersect(rays, engine="lockstep")
    for eng in ("auto", "wavefront", "packets"):
        h = b.intersect(rays, engine=eng)
        np.testing.assert_array_equal(np.asarray(h.prim),
                                      np.asarray(base.prim), err_msg=eng)
        m = np.asarray(base.prim) >= 0
        np.testing.assert_allclose(np.asarray(h.t)[m],
                                   np.asarray(base.t)[m], rtol=1e-4,
                                   atol=1e-5, err_msg=eng)
    occ0 = np.asarray(b.is_occluded(rays, 5.0, engine="lockstep"))
    for eng in ("auto", "wavefront"):
        np.testing.assert_array_equal(
            np.asarray(b.is_occluded(rays, 5.0, engine=eng)), occ0,
            err_msg=eng)
