"""inst512 loss localization, part 4: bisect engine round 0.

Part 3 showed each bad ray's tile KEEPS the true instance (tile 512:
rank 0 of 1 candidate) and a plain full-batch single-instance
intersect_packets2 call finds the exact hit. So the loss is introduced
by what the bucketed engine's scan body does differently:
  (a) per-TILE transforms (each tile in its own candidate's frame,
      neighbors in different frames) via einsum with inst_inv, vs the
      probe's shared `o - offs[ti]`;
  (b) per-ray t_max VECTOR (t_best carry) vs scalar.
Run engine round 0 manually outside the scan and toggle each.
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
from tinybvh_tpu.core.vecmath import BVH_FAR, safe_rcp
from tinybvh_tpu.tlas.packet import build_tlas_packet
from tinybvh_tpu.traverse.packet import TILE, _tile_planes
from tinybvh_tpu.traverse.packet2 import intersect_packets2

BAD = [130059, 130074, 130090, 130105, 130119, 130120, 130135, 130148,
       131311, 131339, 131355, 131370, 131386]
TRUE_T = {130059: 157.64810, 130074: 157.32053, 130090: 157.76155,
          130105: 157.57443, 130119: 157.04421, 130120: 157.57051,
          130135: 157.77347, 130148: 157.26257, 131311: 142.46458,
          131339: 139.57694, 131355: 139.33535, 131370: 139.45596,
          131386: 139.31527}
TRUE_INST = {130059: 472, 130074: 472, 130090: 472, 130105: 472,
             130119: 472, 130120: 472, 130135: 472, 130148: 472,
             131311: 39, 131339: 39, 131355: 39, 131370: 39, 131386: 39}


def main():
    bunny, _ = _load_bunny()
    bvh_b = BVH(bunny)
    blas = bvh_b.bvh8
    tris = np.asarray(bunny, np.float32)
    ex = tris.reshape(-1, 3).max(0) - tris.reshape(-1, 3).min(0)
    offs = []
    for i in range(8):
        for j in range(8):
            for k in range(8):
                offs.append(ex * 1.15 * np.array([i, j, k], np.float32))
    offs = np.stack(offs)
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
    R = o.shape[0]
    T = R // TILE
    rays = make_rays(o, d)

    # ---- engine's candidate build (same algebra as the bucketed scan) --
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
    hit_i = jnp.logical_not(jnp.any(dist < 0.0, axis=1))
    g2 = jnp.zeros((T, 512), jnp.float32)
    for k in range(3):
        gk = jnp.maximum(olo[:, None, k] - whi_i[None, :, k],
                         wlo_i[None, :, k] - ohi[:, None, k])
        g2 = g2 + jnp.maximum(gk, 0.0) ** 2
    key = jnp.where(hit_i, g2, jnp.inf)
    order = jnp.argsort(key, axis=1)
    taken = jnp.take_along_axis(hit_i, order, axis=1)
    cand = np.asarray(jnp.where(taken, order.astype(jnp.int32), -1))

    def round_r(r, tmax_vec):
        cand_r = jnp.asarray(cand[:, r])
        safe = jnp.maximum(cand_r, 0)
        inv_r = tp.inst_inv[safe]
        dead = cand_r < 0
        o2 = (jnp.einsum("tij,tkj->tki", inv_r[:, :3, :3], ot)
              + inv_r[:, None, :3, 3]).reshape(R, 3)
        d2 = jnp.einsum("tij,tkj->tki", inv_r[:, :3, :3], dt).reshape(R, 3)
        rays_r = Rays(o=o2, d=d2, rd=safe_rcp(d2),
                      mask=jnp.ones(R, jnp.int32))
        dead_r = jnp.repeat(dead, TILE)
        tm = jnp.where(dead_r, 0.0, tmax_vec)
        h_r, ovf_r = intersect_packets2(
            blas, tp.auxes[0], rays_r, max_leaves=full_ml,
            t_max=tm, max_blocks=256, retrace=False)
        return h_r, ovf_r, np.asarray(cand_r)

    def report(tag, h, ovf, cand_r):
        jax.block_until_ready(h.t)
        t_np = np.asarray(h.t)
        p_np = np.asarray(h.prim)
        ovf_np = np.asarray(ovf)
        for b in BAD:
            t0 = b // TILE
            if cand_r[t0] != TRUE_INST[b]:
                continue
            ok = p_np[b] >= 0 and abs(t_np[b] - TRUE_T[b]) <= 0.005 * TRUE_T[b]
            print(f"{tag} ray {b} (tile {t0} cand {cand_r[t0]}): "
                  f"prim {p_np[b]} t {t_np[b]:.4f} "
                  f"{'OK' if ok else 'MISS'} ovf {bool(ovf_np[t0])}",
                  flush=True)

    far_vec = jnp.full(R, jnp.float32(BVH_FAR))

    # A: engine round 0 exactly (per-tile transforms, vector t_max)
    h, ovf, c0 = round_r(0, far_vec)
    report("A r0 vec-tmax ", h, ovf, c0)

    # B: same but SCALAR t_max (isolate the vector-tmax path)
    cand_r = jnp.asarray(cand[:, 0])
    safe = jnp.maximum(cand_r, 0)
    inv_r = tp.inst_inv[safe]
    o2 = (jnp.einsum("tij,tkj->tki", inv_r[:, :3, :3], ot)
          + inv_r[:, None, :3, 3]).reshape(R, 3)
    d2 = jnp.einsum("tij,tkj->tki", inv_r[:, :3, :3], dt).reshape(R, 3)
    rays_b = Rays(o=o2, d=d2, rd=safe_rcp(d2), mask=jnp.ones(R, jnp.int32))
    h, ovf = intersect_packets2(blas, tp.auxes[0], rays_b,
                                max_leaves=full_ml,
                                t_max=jnp.float32(BVH_FAR),
                                max_blocks=256, retrace=False)
    report("B r0 scal-tmax", h, ovf, np.asarray(cand_r))

    # rank-5 rays (tile 508, inst 472): run their round directly
    for b in BAD:
        t0 = b // TILE
        ranks = list(cand[t0])
        if TRUE_INST[b] in ranks:
            r = ranks.index(TRUE_INST[b])
            if r != 0:
                h, ovf, cr = round_r(r, far_vec)
                report(f"C r{r} vec-tmax", h, ovf, cr)
                break


if __name__ == "__main__":
    main()
