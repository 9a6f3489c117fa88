"""Which coherence-sort ordering minimizes exact-diffuse cull work?

The exact diffuse trace is at the depth-12 MXU roofline (r5 span/vpu
probes), so the remaining lever is OVER-COVERAGE: total surviving
(segment x tile) rows. Same cull shapes for every ordering — only the
ray permutation changes — so this sweep costs one compile total.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinybvh_tpu.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.diffuse_split import _bench
from bench import _camera_rays, _load_bunny
from tinybvh_tpu.api import BVH
from tinybvh_tpu.core.rays import RAY_MASK_ALL, Rays, make_rays
from tinybvh_tpu.core.vecmath import safe_rcp
from tinybvh_tpu.traverse import packet2 as p2
from tinybvh_tpu.traverse.packet import _spread10


def _raw_diffuse(bvh, aux):
    """Bench-style diffuse bounce rays, UNSORTED."""
    lo, hi = bvh.aabb
    o, d, center, extent = _camera_rays(np.asarray(lo), np.asarray(hi))
    rays = make_rays(o, d)
    far = jnp.asarray(1e30, jnp.float32)
    hits, _ = p2.intersect_packets2(bvh.bvh8, aux, rays, max_leaves=512,
                                    t_max=far, max_blocks=64, retrace=False)
    jax.block_until_ready(hits.t)
    rng = np.random.default_rng(2)
    tris_np = np.asarray(bvh.tris)
    prim = np.asarray(hits.prim)
    ht = np.asarray(hits.t)
    ht = np.where(np.isfinite(ht) & (ht < 1e29), ht, 1.0)
    p = o + ht[:, None] * d
    tri = tris_np[np.maximum(prim, 0)]
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    nrm = np.where((np.sum(nrm * d, 1) > 0)[:, None], -nrm, nrm)
    dd = rng.normal(size=(p.shape[0], 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    dd = np.where((np.sum(dd * nrm, 1) < 0)[:, None], -dd, dd)
    do = (p + nrm * 1e-3).astype(np.float32)
    return do, dd, np.asarray(lo), np.asarray(hi)


def _keys(o, d, lo, hi):
    ext = np.maximum(hi - lo, 1e-20)
    q = np.clip(((o - lo) / ext * 1024.0).astype(np.int64), 0, 1023)
    om = (np.asarray(_spread10(jnp.asarray(q[:, 0], jnp.int32)), np.int64)
          | (np.asarray(_spread10(jnp.asarray(q[:, 1], jnp.int32)),
                        np.int64) << 1)
          | (np.asarray(_spread10(jnp.asarray(q[:, 2], jnp.int32)),
                        np.int64) << 2))
    qd = np.clip(((d + 1.0) * 0.5 * 1024).astype(np.int64), 0, 1023)
    dm = (np.asarray(_spread10(jnp.asarray(qd[:, 0], jnp.int32)), np.int64)
          | (np.asarray(_spread10(jnp.asarray(qd[:, 1], jnp.int32)),
                        np.int64) << 1)
          | (np.asarray(_spread10(jnp.asarray(qd[:, 2], jnp.int32)),
                        np.int64) << 2))
    octant = ((d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2
              + (d[:, 2] < 0)).astype(np.int64)
    ad = np.abs(d)
    dom = np.argmax(ad, axis=1)
    amax = ad.max(axis=1)
    r = ad / np.maximum(amax, 1e-20)[:, None]
    ratios = np.stack([np.where(dom == 0, r[:, 1], r[:, 0]),
                       np.where(dom == 2, r[:, 1], r[:, 2])], axis=1)
    sub = ((ratios[:, 0] > 0.5) * 2 + (ratios[:, 1] > 0.5)).astype(np.int64)
    return {
        "current (oct|sub|om19)": (octant << 27) | (sub << 25) | (om >> 5),
        "origin-major om|oct": (om << 3) | octant,
        "pure origin morton": om,
        "dir-morton15|om15": ((dm >> 15) << 15) | (om >> 15),
        "oct|om-major|sub": (octant << 26) | ((om >> 9) << 5),
        "6D interleave": sum(
            (((om >> (29 - i)) & 1) << (59 - 2 * i)
             | ((dm >> (29 - i)) & 1) << (58 - 2 * i))
            for i in range(30)),
    }


def main():
    bunny, _ = _load_bunny()
    bvh = BVH(bunny)
    aux = bvh.packet_aux
    jax.block_until_ready(aux.gtab_pad)
    do, dd, lo, hi = _raw_diffuse(bvh, aux)
    R = do.shape[0]
    far = jnp.asarray(1e30, jnp.float32)
    MB, ML = 512, 21504
    kk = ML // p2.SPAN

    def counts_for(order):
        o_s = jnp.asarray(do[order])
        d_s = jnp.asarray(dd[order])
        rays = Rays(o=o_s, d=d_s, rd=safe_rcp(d_s),
                    mask=jnp.full(R, RAY_MASK_ALL, jnp.int32))
        (posn, negn, thresh, olo, ohi, tcap, dlen,
         tmax_rt, t0) = p2._tile_frusta(aux, rays, far)
        lb = max(p2._LEAF_BITS, (aux.leaf_lo.shape[1] - 1).bit_length())
        _, counts = p2.cull_tiles(aux, posn, negn, thresh, olo, ohi, tcap,
                                  k_cap=kk, max_blocks=MB, leaf_bits=lb)
        return np.minimum(np.asarray(counts), kk), rays

    results = {}
    for name, key in _keys(do, dd, lo, hi).items():
        order = np.argsort(key, kind="stable")
        c, rays = counts_for(order)
        results[name] = (c.mean(), rays)
        print(f"{name:26s}: segs mean {c.mean():7.1f}  "
              f"p90 {np.percentile(c, 90):7.1f}  max {c.max():6d}",
              flush=True)

    best = sorted(results.items(), key=lambda kv: kv[1][0])[:2]
    for name, (_, rays) in best:
        def f(rays=rays):
            return p2.intersect_packets2(
                bvh.bvh8, aux, rays, max_leaves=ML, t_max=far,
                max_blocks=MB, retrace=False, tri_blk=512,
                tiles_per_step=8)
        _bench(f, f"full trace [{name[:22]:22s}]", R)


if __name__ == "__main__":
    main()
