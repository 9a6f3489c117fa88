"""Packet-v2 pipeline tests (dense cull kernel + sorted early-exit MT).

All Pallas kernels run in interpret mode on the CPU backend. Oracles:
the wavefront engine (validated against brute force in test_wavefront.py)
and direct f64 brute-force Moller-Trumbore.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.io.loaders import random_tris
from tinybvh_tpu.layouts.mbvh import collapse_bvh2
from tinybvh_tpu.traverse.packet import collect_tile_leaves, _tile_planes
from tinybvh_tpu.traverse.packet2 import (
    _I32MAX, _decode_keys, build_packet_aux, cull_tiles, intersect_packets2,
    intersect_packets2_sorted, is_occluded_packets2,
)
from tinybvh_tpu.traverse.wavefront import intersect_wavefront


@pytest.fixture(scope="module")
def scene():
    tris = random_tris(3000, seed=0)
    bvh2 = build_binned(tris, max_leaf=4)
    bvh8 = collapse_bvh2(bvh2, jnp.asarray(tris))
    aux = build_packet_aux(bvh8)
    return tris, bvh8, aux


def _camera_rays(T=4, seed=3):
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
    o = np.broadcast_to(eye, d.shape)
    return o, d


def test_g_rows_match_moller_trumbore(scene):
    """The triple-product rows must reproduce MT's (det, u, v, t)."""
    # local rng: the session fixture's state depends on test order, and a
    # near-degenerate sample would make this flaky in full-suite runs
    rng = np.random.default_rng(7)
    tris, bvh8, aux = scene
    if aux.pack == 2:
        # packed rows: lanes [0:96] reshape back to per-tri 48-lane rows
        g = np.asarray(aux.gtab_pad[:2 * aux.n_leaves, :96]).reshape(-1, 48)
    else:
        g = np.asarray(aux.gtab_pad[:4 * aux.n_leaves, :48])
    lt = np.asarray(bvh8.leaf_tris).reshape(-1, 3, 3)
    lp = np.asarray(bvh8.leaf_prim).reshape(-1)
    c0 = np.asarray(aux.center)
    sel = rng.choice(np.where(lp >= 0)[0], 64, replace=False)
    o = rng.uniform(-2, 12, (64, 3)).astype(np.float32) - c0
    d = rng.normal(size=(64, 3)).astype(np.float32)
    f = np.concatenate(
        [d, np.cross(o, d), o, np.ones((64, 1)), np.zeros((64, 2))], axis=1)
    for i, tri_i in enumerate(sel):
        gi = g[tri_i]
        det = gi[0:12] @ f[i]
        up = gi[12:24] @ f[i]
        vp = gi[24:36] @ f[i]
        tp = gi[36:48] @ f[i]
        v0 = (lt[tri_i, 0] - c0).astype(np.float64)
        e1 = (lt[tri_i, 1] - lt[tri_i, 0]).astype(np.float64)
        e2 = (lt[tri_i, 2] - lt[tri_i, 0]).astype(np.float64)
        d64, o64 = d[i].astype(np.float64), o[i].astype(np.float64)
        h = np.cross(d64, e2)
        det_ref = float(e1 @ h)
        # skip ill-conditioned cases: the f32 triple-product path loses
        # accuracy exactly where MT itself is numerically meaningless
        if abs(det_ref) < 1e-4 * float(np.linalg.norm(e1) * np.linalg.norm(h)
                                       + 1e-30):
            continue
        s = o64 - v0
        u_ref = float(s @ h) / det_ref
        q = np.cross(s, e1)
        v_ref = float(d64 @ q) / det_ref
        t_ref = float(e2 @ q) / det_ref
        assert np.isclose(up / det, u_ref, atol=2e-3 * max(1, abs(u_ref)))
        assert np.isclose(vp / det, v_ref, atol=2e-3 * max(1, abs(v_ref)))
        assert np.isclose(tp / det, t_ref, atol=2e-3 * max(1, abs(t_ref)))


def test_cull_matches_frontier_collector(scene):
    """Dense segment cull ⊇ BFS collector leaf sets, and = the numpy
    segment-frustum reference (hierarchy-free equivalence at SPAN
    granularity)."""
    from tinybvh_tpu.traverse.packet2 import SPAN

    tris, bvh8, aux = scene
    o, d = _camera_rays(T=4)
    T = 4
    o4 = jnp.asarray(o.reshape(T, 256, 3))
    d4 = jnp.asarray(d.reshape(T, 256, 3))
    planes = _tile_planes(o4[:, 0], d4)
    posn = jnp.maximum(planes, 0.0)
    negn = jnp.minimum(planes, 0.0)
    olo, ohi = o4.min(axis=1), o4.max(axis=1)
    thresh = (jnp.einsum("tpk,tk->tp", posn, olo)
              + jnp.einsum("tpk,tk->tp", negn, ohi))
    keys, counts = cull_tiles(aux, posn, negn, thresh, olo, ohi,
                              k_cap=256, interpret=True)
    ref_lv, _ = collect_tile_leaves(bvh8, olo, d4, max_leaves=512,
                                    pair_cap_factor=64, tile_ohi=ohi)
    _, segs = _decode_keys(keys)
    keys_np = np.asarray(keys)
    segs_np = np.asarray(segs)
    ref_np = np.asarray(ref_lv)
    # numpy reference: a segment survives iff its union box passes every
    # tile plane (same test as the collector's per-leaf slab logic)
    slo = np.asarray(aux.leaf_lo).T      # (Spad, 3)
    shi = np.asarray(aux.leaf_hi).T
    n_segs = aux.n_segs
    pn = np.asarray(posn)
    nn = np.asarray(negn)
    th = np.asarray(thresh)
    for t in range(T):
        got = set(segs_np[t][keys_np[t] != _I32MAX].tolist())
        want_leaves = set(ref_np[t][ref_np[t] != 2**31 - 1].tolist())
        # every collector leaf is covered by a surviving segment
        assert {lf // SPAN for lf in want_leaves} <= got
        dist = (pn[t] @ shi.T + nn[t] @ slo.T - th[t][:, None])  # (4, Spad)
        ok = ~(dist < 0).any(axis=0)
        ok[n_segs:] = False
        want_segs = set(np.where(ok)[0].tolist())
        assert got == want_segs
        assert int(np.asarray(counts)[t]) == len(want_segs)


def test_primary_matches_wavefront(scene):
    tris, bvh8, aux = scene
    o, d = _camera_rays(T=4)
    rays = make_rays(o, d)
    hits, ovf = intersect_packets2(bvh8, aux, rays, max_leaves=256,
                                   interpret=True, retrace=False)
    ref, wovf = intersect_wavefront(bvh8, rays, cap_factor=16)
    assert not bool(np.asarray(wovf))
    assert not np.asarray(ovf).any()
    hp, rp = np.asarray(hits.prim), np.asarray(ref.prim)
    assert (hp == rp).all()
    m = rp >= 0
    assert m.mean() > 0.3
    np.testing.assert_allclose(np.asarray(hits.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4, atol=1e-4)
    # barycentrics recovered in-kernel must match the wavefront's MT
    np.testing.assert_allclose(np.asarray(hits.u)[m], np.asarray(ref.u)[m],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(hits.v)[m], np.asarray(ref.v)[m],
                               rtol=1e-3, atol=1e-3)


def test_occlusion_vs_brute_force(scene):
    tris, bvh8, aux = scene
    o, d = _camera_rays(T=2)
    rays = make_rays(o, d)
    ref, _ = intersect_wavefront(bvh8, rays, cap_factor=16)
    pts = np.asarray(ref.t)[:, None] * d + o
    pts = np.clip(pts, -50, 50)
    light = np.array([5.0, 14.0, 5.0], np.float32)
    occ, ovf = is_occluded_packets2(bvh8, aux, light, pts[:512],
                                    interpret=True, retrace=True,
                                    wf_cap_factor=24)
    assert not np.asarray(ovf).any()
    lt = np.asarray(tris, np.float64)
    v0 = lt[:, 0]
    e1 = lt[:, 1] - v0
    e2 = lt[:, 2] - v0
    oo = light.astype(np.float64)
    for i in range(0, 512, 17):
        dd = pts[i].astype(np.float64) - oo
        h = np.cross(dd, e2)
        det = (e1 * h).sum(1)
        ok = np.abs(det) > 1e-15
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        s = oo - v0
        u = (s * h).sum(1) * inv
        q = np.cross(s, e1)
        v = (dd[None] * q).sum(1) * inv
        t = (e2 * q).sum(1) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0) & (t < 1 - 1e-3)
        assert bool(np.asarray(occ)[i]) == bool(hit.any())


def test_sorted_diffuse_matches_wavefront(scene, rng):
    tris, bvh8, aux = scene
    o = rng.uniform(-1, 11, (2048, 3)).astype(np.float32)
    d = rng.normal(size=(2048, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    hits, fb = intersect_packets2_sorted(
        bvh8, aux, rays, [0.0, 0.0, 0.0], [10.0, 10.0, 10.0],
        max_leaves=256, interpret=True, retrace=True, wf_cap_factor=24)
    ref, wovf = intersect_wavefront(bvh8, rays, cap_factor=24)
    assert not bool(np.asarray(wovf))
    assert (np.asarray(hits.prim) == np.asarray(ref.prim)).all()


def test_overflow_reported_and_retraced(scene):
    """A tiny leaf budget must flag overflow; retrace must restore hits."""
    tris, bvh8, aux = scene
    o, d = _camera_rays(T=1)
    rays = make_rays(o, d)
    hits, ovf = intersect_packets2(bvh8, aux, rays, max_leaves=32,
                                   interpret=True, retrace=False)
    # this camera tile sees more than 32/4 leaf rows worth only if dense;
    # force overflow with a wide bundle instead
    rng = np.random.default_rng(0)
    dw = rng.normal(size=(256, 3)).astype(np.float32)
    dw /= np.linalg.norm(dw, axis=1, keepdims=True)
    ow = np.full((256, 3), 5.0, np.float32)
    rays_w = make_rays(ow, dw)
    hits0, ovf0 = intersect_packets2(bvh8, aux, rays_w, max_leaves=32,
                                     interpret=True, retrace=False)
    assert np.asarray(ovf0).all()
    hits1, ovf1 = intersect_packets2(bvh8, aux, rays_w, max_leaves=32,
                                     interpret=True, retrace=True,
                                     wf_cap_factor=24)
    ref, _ = intersect_wavefront(bvh8, rays_w, cap_factor=24)
    assert (np.asarray(hits1.prim) == np.asarray(ref.prim)).all()
    assert not np.asarray(ovf1).any()


def test_primary_vpu_variant_matches(scene):
    """The pure-VPU broadcast-FMA MT path (mt_precision='vpu') computes
    the same f32 math as the MXU dots — hits must be identical."""
    tris, bvh8, aux = scene
    o, d = _camera_rays(T=4)
    rays = make_rays(o, d)
    h0, _ = intersect_packets2(bvh8, aux, rays, max_leaves=256,
                               interpret=True, retrace=False)
    h1, _ = intersect_packets2(bvh8, aux, rays, max_leaves=256,
                               interpret=True, retrace=False,
                               mt_precision="vpu")
    np.testing.assert_array_equal(np.asarray(h0.prim), np.asarray(h1.prim))
    m = np.asarray(h0.prim) >= 0
    np.testing.assert_allclose(np.asarray(h1.t)[m], np.asarray(h0.t)[m],
                               rtol=1e-5, atol=1e-6)


def test_fused_kernel_dead_keys_within_count(scene):
    """Worklist-overflow tiles report count=k_cap+1 with fewer live keys;
    dead entries inside [0, count) are pre-decoded by the wrapper to the
    sentinel segment's row offset (so DMAs stay in bounds — OOB
    descriptors kill the TPU worker) and must produce no hits."""
    import jax.numpy as jnp
    from tinybvh_tpu.traverse.packet2 import (
        _KPB, SEG_ROWS, TILE, mt_resolve_fused,
    )

    tris, bvh8, aux = scene
    K = 64
    T = 2
    # tile 0: one live offset (segment 0) then sentinel (dead) entries,
    # count beyond the live prefix
    sent = int(aux.gtab_pad.shape[0]) - SEG_ROWS // aux.pack
    offs = np.full((T, K), sent, np.int32)
    offs[0, 0] = 0  # segment 0
    counts = np.array([K, 0], np.int32)  # count beyond the live prefix
    lbg = np.zeros((T, 1, K // _KPB), np.float32)
    tmax = np.full((T, 1), 1e30, np.float32)
    o_t = np.zeros((T, 3, TILE), np.float32)
    o_t[:, 2, :] = -3.0 - np.asarray(aux.center)[2]
    d_t = np.zeros((T, 3, TILE), np.float32)
    d_t[:, 2, :] = 1.0
    t, i, _, _, _ = mt_resolve_fused(
        jnp.asarray(offs), jnp.asarray(counts), jnp.asarray(lbg),
        jnp.asarray(tmax), jnp.asarray(o_t) - np.asarray(aux.center)[:, None]
        + np.asarray(aux.center)[:, None], jnp.asarray(d_t),
        aux.gtab_pad, k_cap=K, interpret=True, pack=aux.pack)
    t = np.asarray(t)
    # tile 1 (count 0) must be all misses; tile 0 only hits leaf-0 tris
    assert (t[1] >= 1e29).all()
    assert np.isfinite(t).all()


def test_cull_leaf_bits_20_same_survivors(scene):
    """Scenes beyond 2^18 leaf rows use wider leaf-id bits in cull keys
    (the >=1M-tri scale point); the survivor SET must be identical and
    the coarser decoded distances must stay lower bounds."""
    tris, bvh8, aux = scene
    o, d = _camera_rays(T=2)
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.traverse.packet import _tile_planes
    import jax.numpy as jnp

    T = o.shape[0] // 256
    ot = o.reshape(T, 256, 3)
    dt = d.reshape(T, 256, 3)
    olo, ohi = ot.min(axis=1), ot.max(axis=1)
    planes = _tile_planes(ot[:, 0], dt)
    posn = jnp.maximum(planes, 0.0)
    negn = jnp.minimum(planes, 0.0)
    thresh = (jnp.einsum("tpk,tk->tp", posn, olo)
              + jnp.einsum("tpk,tk->tp", negn, ohi))
    k18, c18 = cull_tiles(aux, posn, negn, thresh, olo, ohi,
                          k_cap=256, interpret=True, leaf_bits=18)
    k20, c20 = cull_tiles(aux, posn, negn, thresh, olo, ohi,
                          k_cap=256, interpret=True, leaf_bits=20)
    np.testing.assert_array_equal(np.asarray(c18), np.asarray(c20))
    for t in range(T):
        lb18, l18 = _decode_keys(k18[t], 18)
        lb20, l20 = _decode_keys(k20[t], 20)
        n = int(np.asarray(c18)[t])
        assert set(np.asarray(l18)[:n].tolist()) \
            == set(np.asarray(l20)[:n].tolist())
        # coarser keys truncate more mantissa: still lower bounds
        m18 = {int(l): float(b) for l, b in
               zip(np.asarray(l18)[:n], np.asarray(lb18)[:n])}
        for l, b in zip(np.asarray(l20)[:n], np.asarray(lb20)[:n]):
            assert b <= m18[int(l)] + 1e-6


def test_cull_chunked_matches_single_pass(scene):
    """The chunked K1b compaction (accumulator merged per worklist chunk)
    must produce the same survivor SETS and counts as a single-pass cull,
    at every chunk size — including chunk=1 (one block per merge) which
    exercises the accumulator carry hardest."""
    tris, bvh8, aux = scene
    o, d = _camera_rays(T=4)
    T = 4
    o4 = jnp.asarray(o.reshape(T, 256, 3))
    d4 = jnp.asarray(d.reshape(T, 256, 3))
    planes = _tile_planes(o4[:, 0], d4)
    posn = jnp.maximum(planes, 0.0)
    negn = jnp.minimum(planes, 0.0)
    olo, ohi = o4.min(axis=1), o4.max(axis=1)
    thresh = (jnp.einsum("tpk,tk->tp", posn, olo)
              + jnp.einsum("tpk,tk->tp", negn, ohi))
    kw = dict(k_cap=256, interpret=True, max_blocks=8)
    k_ref, c_ref = cull_tiles(aux, posn, negn, thresh, olo, ohi,
                              chunk_blocks=8, **kw)   # single-pass path
    for chunk in (1, 2, 3):
        k, c = cull_tiles(aux, posn, negn, thresh, olo, ohi,
                          chunk_blocks=chunk, **kw)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))
        for t in range(T):
            n = int(np.asarray(c_ref)[t])
            got = set(np.asarray(k)[t, :n].tolist())
            want = set(np.asarray(k_ref)[t, :n].tolist())
            assert got == want
            assert (np.asarray(k)[t, n:] == _I32MAX).all()


def test_tiny_scene_default_tri_blk(rng=None):
    """Scenes with fewer gtab rows than the default 256-row MT super-block
    must still trace correctly: the drain-wait descriptor is sourced from
    the VMEM scratch (always 2*tri_blk rows), never from gtab_pad, which
    can have fewer rows than tri_blk on tiny scenes (r3 advisor finding:
    a gtab_pad-sourced descriptor read out of bounds on the compiled
    TPU path for scenes under ~230 tris)."""
    from tinybvh_tpu.core.intersect import brute_force_closest

    rng = np.random.default_rng(11)
    tris = random_tris(30, seed=3)                    # gtab_pad rows < 256
    bvh2 = build_binned(tris, max_leaf=4)
    bvh8 = collapse_bvh2(bvh2, jnp.asarray(tris))
    aux = build_packet_aux(bvh8)
    assert aux.gtab_pad.shape[0] < 256
    o = np.full((256, 3), -3.0, np.float32)
    d = (np.array([[0.5, 0.5, 0.5]]) +
         0.1 * rng.normal(size=(256, 3))).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    h, ovf = intersect_packets2(bvh8, aux, rays, max_leaves=512,
                                interpret=True, retrace=False,
                                max_blocks=32)
    ref = brute_force_closest(rays, jnp.asarray(tris))
    np.testing.assert_allclose(np.asarray(h.t), np.asarray(ref.t),
                               rtol=1e-4, atol=1e-5)
    assert int(np.asarray(ovf).sum()) == 0


def test_packet_retrace_restores_hits(scene):
    """retrace='packet' (escalated-budget second cull pass) must restore
    the hits a tiny first-pass budget dropped, and clear the mask."""
    tris, bvh8, aux = scene
    rng = np.random.default_rng(0)
    dw = rng.normal(size=(256, 3)).astype(np.float32)
    dw /= np.linalg.norm(dw, axis=1, keepdims=True)
    ow = np.full((256, 3), 5.0, np.float32)
    rays_w = make_rays(ow, dw)
    _, ovf0 = intersect_packets2(bvh8, aux, rays_w, max_leaves=32,
                                 interpret=True, retrace=False)
    assert np.asarray(ovf0).all()
    hits1, ovf1 = intersect_packets2(bvh8, aux, rays_w, max_leaves=32,
                                     interpret=True, retrace="packet",
                                     retrace_ml=4096, retrace_blocks=256)
    ref, _ = intersect_wavefront(bvh8, rays_w, cap_factor=24)
    assert (np.asarray(hits1.prim) == np.asarray(ref.prim)).all()
    assert not np.asarray(ovf1).any()


def test_packet_retrace_mixed_tiles(scene):
    """Escalation must only REPLACE overflowed tiles: a coherent (narrow)
    tile and a wide tile in one batch, tiny budget — both end exact."""
    tris, bvh8, aux = scene
    o, d = _camera_rays(T=1)
    rng = np.random.default_rng(3)
    dw = rng.normal(size=(256, 3)).astype(np.float32)
    dw /= np.linalg.norm(dw, axis=1, keepdims=True)
    d2 = np.concatenate([d, dw])
    o2 = np.concatenate([o, np.full((256, 3), 5.0, np.float32)])
    rays2 = make_rays(o2, d2)
    hits, ovf = intersect_packets2(bvh8, aux, rays2, max_leaves=64,
                                   interpret=True, retrace="packet",
                                   retrace_ml=4096, retrace_blocks=256)
    ref, _ = intersect_wavefront(bvh8, rays2, cap_factor=24)
    assert (np.asarray(hits.prim) == np.asarray(ref.prim)).all()
    assert not np.asarray(ovf).any()


def test_occlusion_sorted_matches_unsorted(scene):
    """Direction-sorted shadow bundles must return the same per-ray
    occlusion as pixel-order bundles (only the tiling changes)."""
    from tinybvh_tpu.traverse.packet2 import is_occluded_packets2_sorted

    tris, bvh8, aux = scene
    o, d = _camera_rays(T=2)
    rays = make_rays(o, d)
    ref, _ = intersect_wavefront(bvh8, rays, cap_factor=16)
    pts = np.clip(np.asarray(ref.t)[:, None] * d + o, -50, 50)[:512]
    light = np.array([5.0, 14.0, 5.0], np.float32)
    occ0, _ = is_occluded_packets2(bvh8, aux, light, pts,
                                   interpret=True, retrace=True,
                                   wf_cap_factor=24)
    occ1, ovf1 = is_occluded_packets2_sorted(
        bvh8, aux, light, pts, interpret=True, retrace="packet",
        retrace_ml=4096, retrace_blocks=256)
    np.testing.assert_array_equal(np.asarray(occ0), np.asarray(occ1))
    assert not np.asarray(ovf1).any()


def test_per_ray_t_max(scene):
    """t_max as an (R,) array: rays with t_max=0 must report no hits,
    the rest must match the scalar-t_max trace."""
    tris, bvh8, aux = scene
    o, d = _camera_rays(T=2)
    rays = make_rays(o, d)
    h_ref, _ = intersect_packets2(bvh8, aux, rays, max_leaves=256,
                                  interpret=True, retrace=False)
    tm = np.full(512, 1e30, np.float32)
    tm[256:] = 0.0
    h, _ = intersect_packets2(bvh8, aux, rays, max_leaves=256,
                              t_max=jnp.asarray(tm), interpret=True,
                              retrace=False)
    np.testing.assert_array_equal(np.asarray(h.prim)[:256],
                                  np.asarray(h_ref.prim)[:256])
    assert (np.asarray(h.prim)[256:] == -1).all()


@pytest.mark.parametrize("m", [2, 4, 8])
def test_span_mult_matches_fine(scene, m):
    """Coarse cull granularity (span_mult) must reproduce the fine trace
    exactly — each coarse key DMAs span_mult contiguous fine segments, so
    only the cull granularity (not the tested geometry) changes."""
    tris, bvh8, aux = scene
    o, d = _camera_rays(T=4)
    rays = make_rays(o, d)
    ref, _ = intersect_packets2(bvh8, aux, rays, max_leaves=512,
                                interpret=True, retrace=False)
    hits, ovf = intersect_packets2(bvh8, aux, rays,
                                   max_leaves=512 * m, span_mult=m,
                                   interpret=True, retrace=False)
    assert not np.asarray(ovf).any()
    rp = np.asarray(ref.prim)
    assert (np.asarray(hits.prim) == rp).all()
    hm = rp >= 0
    np.testing.assert_allclose(np.asarray(hits.t)[hm],
                               np.asarray(ref.t)[hm], rtol=1e-4, atol=1e-4)


def test_span_mult_diffuse_and_occlusion(scene):
    """span_mult through the sorted-diffuse and shadow wrappers."""
    from tinybvh_tpu.traverse.packet2 import is_occluded_packets2_sorted

    tris, bvh8, aux = scene
    rng = np.random.default_rng(11)
    o = rng.uniform(-1, 11, (1024, 3)).astype(np.float32)
    d = rng.normal(size=(1024, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    hits, fb = intersect_packets2_sorted(
        bvh8, aux, rays, [0.0, 0.0, 0.0], [10.0, 10.0, 10.0],
        max_leaves=2048, span_mult=4, interpret=True, retrace="packet",
        retrace_ml=8192, retrace_blocks=256)
    ref, wovf = intersect_wavefront(bvh8, rays, cap_factor=24)
    assert not bool(np.asarray(wovf))
    assert (np.asarray(hits.prim) == np.asarray(ref.prim)).all()

    oc, dc = _camera_rays(T=2)
    rays_c = make_rays(oc, dc)
    refc, _ = intersect_wavefront(bvh8, rays_c, cap_factor=16)
    pts = np.clip(np.asarray(refc.t)[:, None] * dc + oc, -50, 50)[:512]
    light = np.array([5.0, 14.0, 5.0], np.float32)
    occ0, _ = is_occluded_packets2(bvh8, aux, light, pts,
                                   interpret=True, retrace=True,
                                   wf_cap_factor=24)
    occ1, ovf1 = is_occluded_packets2_sorted(
        bvh8, aux, light, pts, interpret=True, retrace="packet",
        max_leaves=1024, span_mult=4, retrace_ml=8192, retrace_blocks=256)
    np.testing.assert_array_equal(np.asarray(occ0), np.asarray(occ1))
    assert not np.asarray(ovf1).any()
