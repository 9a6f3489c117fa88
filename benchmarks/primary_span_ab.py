"""Primary-phase A/B: span_mult x tri_blk on the bench camera config.

The fused MT kernel is fixed-cost-bound per super-block; at tri_blk=128 /
pack=2 the issue loop starts 16 descriptors per block. span_mult=m cuts
that to 16/m at the price of walking the coarse segments' extra rows —
camera tiles are tight (mean ~17 fine segs), so the row growth matters
more here than on diffuse. Exact traces only (retrace="packet").
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinybvh_tpu.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from benchmarks.diffuse_split import _bench
from bench import _camera_rays, _load_bunny
from tinybvh_tpu.api import BVH
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.traverse import packet2 as p2


def main():
    bunny, _ = _load_bunny()
    bvh = BVH(bunny)
    aux = bvh.packet_aux
    jax.block_until_ready(aux.gtab_pad)
    lo, hi = bvh.aabb
    o, d, _, _ = _camera_rays(np.asarray(lo), np.asarray(hi))
    rays = make_rays(o, d)
    jax.block_until_ready(rays.o)
    R = o.shape[0]
    far = jnp.asarray(1e30, jnp.float32)

    # survivor stats per granularity (camera tiles)
    for m in (1, 2, 4):
        kk = 512 * m // (p2.SPAN * m)
        (posn, negn, thresh, olo, ohi, tcap, dlen,
         tmax_rt, t0) = p2._tile_frusta(aux, rays, far)
        lb = max(p2._LEAF_BITS,
                 (aux.leaf_lo.shape[1] // m - 1).bit_length())
        _, counts = p2.cull_tiles(aux, posn, negn, thresh, olo, ohi,
                                  tcap, k_cap=kk, max_blocks=256,
                                  leaf_bits=lb, span_mult=m)
        c = np.minimum(np.asarray(counts), kk)
        print(f"m={m}: segs mean {c.mean():6.1f}  p90 "
              f"{np.percentile(c, 90):6.1f}  rows/tile "
              f"{c.mean() * 8 * m:7.0f}  ovf {(np.asarray(counts) > kk).sum()}",
              flush=True)

    def full(m, tb, tps=8, ml=512):
        def f():
            return p2.intersect_packets2(
                bvh.bvh8, aux, rays, max_leaves=ml * m, t_max=far,
                max_blocks=256, retrace="packet", retrace_ml=2048 * m,
                retrace_blocks=256, tri_blk=tb, tiles_per_step=tps,
                span_mult=m)
        return f

    _bench(full(1, 128), "primary m=1 tb=128 (bench cfg)", R)
    _bench(full(2, 128), "primary m=2 tb=128            ", R)
    _bench(full(2, 256), "primary m=2 tb=256            ", R)
    _bench(full(4, 128), "primary m=4 tb=128            ", R)
    _bench(full(4, 256), "primary m=4 tb=256            ", R)
    _bench(full(1, 128, tps=16), "primary m=1 tb=128 tps=16     ", R)
    _bench(full(2, 128, tps=16), "primary m=2 tb=128 tps=16     ", R)


if __name__ == "__main__":
    main()
