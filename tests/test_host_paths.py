"""All-host build-path parity.

Through the bench machine's device tunnel, D2H readbacks cost minutes
per MB and every eager op / jitted function pays a per-shape remote
compile — so api.BVH, the TLAS merge, and the packet tables all compute
in numpy and upload once (round 3). These tests pin the numpy twins to
the original device-side implementations.
"""

import numpy as np

from tinybvh_tpu.api import BVH, TLAS
from tinybvh_tpu.io.loaders import sphere_tris


def _mats(n):
    out = []
    for i in range(n):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [2.5 * (i & 1), 2.5 * ((i >> 1) & 1), 2.5 * (i >> 2)]
        out.append(m)
    return np.stack(out)


def test_collapse_as_host_matches_device():
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2
    from tinybvh_tpu.native import build_binned_native

    tris = np.asarray(sphere_tris(10, 20), np.float32)
    got = build_binned_native(tris, max_leaf=4, return_host=True)
    if got is None:  # no C compiler: nothing to compare
        return
    bvh2, host = got
    h8 = collapse_bvh2(None, tris, host=host, as_host=True)
    dev = collapse_bvh2(bvh2, tris, host=host)
    assert (h8["bounds"] == np.asarray(dev.bounds)).all()
    assert (h8["child"] == np.asarray(dev.child)).all()
    assert (h8["leaf_tris"] == np.asarray(dev.leaf_tris)).all()
    assert (h8["leaf_prim"] == np.asarray(dev.leaf_prim)).all()


def test_native_collapse_matches_python_twin():
    """builder.c::tinybvh_collapse_bvh8 at combine=0 must be bit-identical
    to the python collapse (layouts/mbvh.py)."""
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2
    from tinybvh_tpu.native import build_binned_native, collapse_bvh8_native

    tris = np.asarray(sphere_tris(10, 20), np.float32)
    got = build_binned_native(tris, max_leaf=4, return_host=True,
                              make_device=False)
    if got is None:  # no C compiler: nothing to compare
        return
    _, host = got
    c0 = collapse_bvh8_native(host, tris, combine=0)
    py = collapse_bvh2(None, tris, host=host, as_host=True)
    for k in ("bounds", "child", "leaf_tris", "leaf_prim"):
        assert np.array_equal(c0[k], py[k]), k


def test_native_collapse_combine_correct():
    """combine=4 (≙ CombineLeafs(4), tiny_bvh.h:5463-5465) packs small
    subtrees into full leaves: every prim exactly once, leaf bounds
    contain their triangles, and traced hits are identical to a
    no-combine trace."""
    import jax.numpy as jnp

    from tinybvh_tpu.config import use_config
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.native import available
    from tinybvh_tpu.traverse.wavefront import intersect_wavefront

    if not available():
        return
    tris = np.asarray(sphere_tris(12, 24), np.float32)
    with use_config(leaf_combine=4):
        b4 = BVH(tris)
    with use_config(leaf_combine=0):
        b0 = BVH(tris)
    lp = np.asarray(b4.bvh8.leaf_prim)
    live = lp[lp >= 0]
    assert live.size == tris.shape[0]
    assert np.unique(live).size == tris.shape[0]
    # combining must reduce leaf count and raise fill on a real mesh
    assert b4.bvh8.leaf_prim.shape[0] < b0.bvh8.leaf_prim.shape[0]
    # wide-node bounds contain their leaf triangles
    ch = np.asarray(b4.bvh8.child)
    bd = np.asarray(b4.bvh8.bounds).reshape(-1, 6, 8)
    lt = np.asarray(b4.bvh8.leaf_tris)
    for n in range(0, ch.shape[0], 7):
        for k in range(8):
            c = ch[n, k]
            if c >= 0 or c == -(2**31) + 1:
                continue
            li = -(c + 1)
            m = lp[li] >= 0
            if not m.any():
                continue
            t = lt[li][m]
            assert (t.reshape(-1, 3) >= bd[n, :3, k] - 1e-4).all()
            assert (t.reshape(-1, 3) <= bd[n, 3:, k] + 1e-4).all()
    rng = np.random.default_rng(5)
    o = rng.uniform(-3, 3, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    h4, _ = intersect_wavefront(b4.bvh8, rays, cap_factor=16)
    h0, _ = intersect_wavefront(b0.bvh8, rays, cap_factor=16)
    assert (np.asarray(h4.prim) == np.asarray(h0.prim)).all()
    m = np.asarray(h0.prim) >= 0
    np.testing.assert_allclose(np.asarray(h4.t)[m], np.asarray(h0.t)[m],
                               rtol=1e-5, atol=1e-6)


def test_packet_aux_host_matches_jitted():
    from tinybvh_tpu.traverse.packet2 import (
        build_packet_aux, build_packet_aux_host,
    )

    tris = np.asarray(sphere_tris(10, 20), np.float32)
    b = BVH(tris)
    if b._bvh8_host is None:
        return
    ah = build_packet_aux_host(b._bvh8_host)
    ad = build_packet_aux(b.bvh8)
    for f in ("leaf_lo", "leaf_hi", "blk_lo", "blk_hi", "center"):
        np.testing.assert_allclose(
            np.asarray(getattr(ah, f)), np.asarray(getattr(ad, f)),
            rtol=1e-6, atol=1e-6, err_msg=f)
    # gtab_pad carries bit-cast prim ids (NaN floats for -1 padding):
    # compare value lanes numerically, payload lanes bitwise
    x = np.asarray(ah.gtab_pad)
    y = np.asarray(ad.gtab_pad)
    assert ah.pack == ad.pack
    nfeat = 48 * ah.pack
    np.testing.assert_allclose(x[:, :nfeat], y[:, :nfeat],
                               rtol=1e-6, atol=1e-6)
    assert (x[:, nfeat:].view(np.int32) == y[:, nfeat:].view(np.int32)).all()


def test_tlas_host8s_matches_device_merge():
    from tinybvh_tpu.tlas.instance import build_tlas

    tris = np.asarray(sphere_tris(10, 20), np.float32)
    b = BVH(tris)
    if b._bvh8_host is None:
        return
    mats = _mats(4)
    th = build_tlas([b.bvh8], mats, host8s=[b._bvh8_host])
    td = build_tlas([b.bvh8], mats)
    for f in ("bounds", "child", "leaf_tris", "leaf_prim", "inst_inv",
              "inst_mask"):
        a = np.asarray(getattr(th, f))
        c = np.asarray(getattr(td, f))
        np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6, err_msg=f)


def test_api_tlas_trace_with_host_merge():
    """api.TLAS (which threads host copies automatically) traces
    identically to a TLAS over the raw device BVH8."""
    from tinybvh_tpu.core.rays import make_rays

    tris = np.asarray(sphere_tris(10, 20), np.float32)
    b = BVH(tris)
    mats = _mats(4)
    t_api = TLAS([b], mats)
    t_raw = TLAS([b.bvh8], mats)       # no host copies available
    rng = np.random.default_rng(5)
    o = np.tile(np.float32([1.2, 1.2, -5]), (256, 1))
    d = np.float32([0, 0, 1]) + rng.standard_normal((256, 3)).astype(
        np.float32) * 0.25
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    h1 = t_api.intersect(rays)
    h2 = t_raw.intersect(rays)
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(h1.prim) == np.asarray(h2.prim)).all()
    assert float(np.mean(np.asarray(h1.prim) >= 0)) > 0.1
