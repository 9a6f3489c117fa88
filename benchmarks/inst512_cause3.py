"""inst512 loss localization, part 3: per-ray blame assignment.

Part 2 showed the bad rays are COMPLETE misses (prim=-1) even with a
full leaf budget, no escalation, and extra rounds — so the loss is in
candidate generation or in the per-instance packet pass itself. For
each bad ray:
  1. find the TRUE instance by brute-forcing the bunny in every
     instance frame (translation-only grid, so shift the origin);
  2. check whether that instance is in its tile's candidate list
     (replicating the bucketed engine's frustum-vs-AABB cull + order);
  3. trace that single instance with intersect_packets2 on the full
     batch and see whether the ray finds the hit.
(2) fails -> TLAS-level cull bug. (3) fails -> packet2/grazing bug.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinybvh_tpu.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from bench import _camera_rays, _load_bunny
from tinybvh_tpu.api import BVH
from tinybvh_tpu.core.rays import Rays, make_rays
from tinybvh_tpu.core.vecmath import safe_rcp
from tinybvh_tpu.tlas.packet import build_tlas_packet
from tinybvh_tpu.traverse.packet import TILE, _tile_planes
from tinybvh_tpu.traverse.packet2 import intersect_packets2

BAD = [130059, 130074, 130090, 130105, 130119, 130120, 130135, 130148,
       131311, 131339, 131355, 131370, 131386]


def main():
    bunny, _ = _load_bunny()
    bvh_b = BVH(bunny)
    blas = bvh_b.bvh8
    tris = np.asarray(bunny, np.float32)           # (N, 3, 3)
    ex = tris.reshape(-1, 3).max(0) - tris.reshape(-1, 3).min(0)
    offs = []
    for i in range(8):
        for j in range(8):
            for k in range(8):
                offs.append(ex * 1.15 * np.array([i, j, k], np.float32))
    offs = np.stack(offs)                          # (512, 3)
    mats = np.tile(np.eye(4, dtype=np.float32), (512, 1, 1))
    mats[:, :3, 3] = offs
    tp = build_tlas_packet([blas], mats, host8s=[bvh_b._bvh8_host])
    jax.block_until_ready(tp.tlas.bounds)
    n_segs = -(-int(blas.n_leaves) // 4)
    full_ml = 4 * (-(-n_segs // 8) * 8)
    wlo = np.asarray(tris.reshape(-1, 3).min(0))
    whi = wlo + np.asarray(ex) * np.array([1.15 * 7 + 1] * 3)
    o, d, _, _ = _camera_rays(wlo, whi, W=512, H=512)
    o = np.asarray(o, np.float32)
    d = np.asarray(d, np.float32)
    rays = make_rays(o, d)

    # ---- true instance per bad ray (host brute force, MT in f64) -------
    v0 = tris[:, 0].astype(np.float64)
    e1 = (tris[:, 1] - tris[:, 0]).astype(np.float64)
    e2 = (tris[:, 2] - tris[:, 0]).astype(np.float64)

    def brute(o1, d1):
        h = np.cross(d1[None, :], e2)
        a = np.einsum("nk,nk->n", e1, h)
        ok = np.abs(a) > 1e-12
        f = np.where(ok, 1.0 / np.where(ok, a, 1.0), 0.0)
        s = o1[None, :] - v0
        u = f * np.einsum("nk,nk->n", s, h)
        q = np.cross(s, e1)
        vv = f * np.einsum("nk,nk->n", d1[None, :], q)
        t = f * np.einsum("nk,nk->n", e2, q)
        good = ok & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (t > 1e-6)
        t = np.where(good, t, np.inf)
        p = int(np.argmin(t))
        return t[p], p

    true_inst, true_prim, true_t = {}, {}, {}
    for b in BAD:
        best = (np.inf, -1, -1)
        for ii in range(512):
            t1, p1 = brute(o[b].astype(np.float64) - offs[ii],
                           d[b].astype(np.float64))
            if t1 < best[0]:
                best = (t1, ii, p1)
        true_t[b], true_inst[b], true_prim[b] = best
        print(f"ray {b}: true inst {best[1]} prim {best[2]} "
              f"t {best[0]:.5f}", flush=True)

    # ---- replicate the bucketed engine's candidate build ---------------
    R = o.shape[0]
    T = R // TILE
    ot = jnp.asarray(o).reshape(T, TILE, 3)
    dt = jnp.asarray(d).reshape(T, TILE, 3)
    olo = ot.min(axis=1)
    ohi = ot.max(axis=1)
    planes = _tile_planes(ot[:, 0], dt)
    posn = jnp.maximum(planes, 0.0)
    negn = jnp.minimum(planes, 0.0)
    thresh = (jnp.einsum("tpk,tk->tp", posn, olo)
              + jnp.einsum("tpk,tk->tp", negn, ohi))
    wlo_i = tp.inst_wlo
    whi_i = tp.inst_whi
    dist = -thresh[:, :, None]
    for k in range(3):
        dist = (dist + posn[:, :, k, None] * whi_i[None, None, :, k]
                + negn[:, :, k, None] * wlo_i[None, None, :, k])
    hit_i = np.asarray(jnp.logical_not(jnp.any(dist < 0.0, axis=1)))
    g2 = jnp.zeros((T, 512), jnp.float32)
    for k in range(3):
        gk = jnp.maximum(olo[:, None, k] - whi_i[None, :, k],
                         wlo_i[None, :, k] - ohi[:, None, k])
        g2 = g2 + jnp.maximum(gk, 0.0) ** 2
    key = np.asarray(jnp.where(jnp.asarray(hit_i), g2, jnp.inf))

    for b in BAD:
        t0 = b // TILE
        ti = true_inst[b]
        n_cand = int(hit_i[t0].sum())
        if not hit_i[t0, ti]:
            print(f"ray {b}: tile {t0} CULLS true inst {ti} "
                  f"(n_cand {n_cand})", flush=True)
            continue
        rank = int((key[t0] < key[t0, ti]).sum())
        print(f"ray {b}: tile {t0} keeps inst {ti} at rank {rank}"
              f"/{n_cand}", flush=True)

    # ---- single-instance packet trace for the distinct true instances --
    for ti in sorted({true_inst[b] for b in BAD}):
        o2 = jnp.asarray(o - offs[ti])
        d2 = jnp.asarray(d)
        rays2 = Rays(o=o2, d=d2, rd=safe_rcp(d2),
                     mask=jnp.ones(R, jnp.int32))
        h, ovf = intersect_packets2(
            blas, tp.auxes[0], rays2, max_leaves=full_ml,
            t_max=jnp.float32(1e30), max_blocks=256, retrace=False)
        jax.block_until_ready(h.t)
        t_np = np.asarray(h.t)
        p_np = np.asarray(h.prim)
        for b in BAD:
            if true_inst[b] != ti:
                continue
            print(f"ray {b}: single-inst {ti} trace -> prim {p_np[b]} "
                  f"t {t_np[b]:.5f} (true prim {true_prim[b]} "
                  f"t {true_t[b]:.5f}) ovf_tile "
                  f"{bool(np.asarray(ovf)[b // TILE])}", flush=True)


if __name__ == "__main__":
    main()
