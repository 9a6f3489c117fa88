"""A/B the span_mult DMA coalescing on the bench diffuse + shadow configs.

r5 split probe: the exact diffuse trace is DMA-ISSUE-bound — ~1M
surviving span-4 segments x ~110 ns/descriptor = 109 of 116 ms. A coarse
cull key covers span_mult consecutive fine segments (contiguous gtab
rows -> ONE descriptor), so issue count drops span_mult x while MT rows
grow only by the cluster fill factor. This probe measures survivors and
wall time at span_mult in {1, 2, 4, 8} on the real bench shapes.
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

from benchmarks.diffuse_split import _diffuse_rays, _bench
from bench import _camera_rays, _load_bunny
from tinybvh_tpu.api import BVH
from tinybvh_tpu.traverse import packet2 as p2


def main():
    bunny, _ = _load_bunny()
    bvh = BVH(bunny)
    aux = bvh.packet_aux
    jax.block_until_ready(aux.gtab_pad)
    drays = _diffuse_rays(bvh, aux)
    jax.block_until_ready(drays.o)
    R = drays.o.shape[0]
    far = jnp.asarray(1e30, jnp.float32)
    MB = 512

    # survivor counts per granularity (keys and MT rows)
    for m in (1, 2, 4, 8):
        ml = 21504 * m if m < 8 else 21504 * 4   # keep key caps sane
        kk = ml // (p2.SPAN * m)
        (posn, negn, thresh, olo, ohi, tcap, dlen,
         tmax_rt, t0) = p2._tile_frusta(aux, drays, far)
        lb = max(p2._LEAF_BITS,
                 (aux.leaf_lo.shape[1] // m - 1).bit_length())
        keys, counts = p2.cull_tiles(aux, posn, negn, thresh, olo, ohi,
                                     tcap, k_cap=kk, max_blocks=MB,
                                     leaf_bits=lb, span_mult=m)
        c = np.asarray(counts)
        ovf = (c > kk).sum()
        cc = np.minimum(c, kk)
        print(f"m={m}: keys mean {cc.mean():8.1f}  p90 "
              f"{np.percentile(cc, 90):8.1f}  max {cc.max():6d}  "
              f"rows/tile {cc.mean() * 16 * m:9.0f}  ovf tiles {ovf}",
              flush=True)

    def full(m, ml, tb=512, tps=8):
        def f():
            return p2.intersect_packets2(
                bvh.bvh8, aux, drays, max_leaves=ml, t_max=far,
                max_blocks=MB, retrace=False, tri_blk=tb,
                tiles_per_step=tps, span_mult=m)
        return f

    base = _bench(full(1, 21504), "diffuse m=1 ml=21504 tb=512", R)
    for m, ml in ((2, 21504 * 2), (4, 21504 * 4), (8, 21504 * 8)):
        t = _bench(full(m, ml), f"diffuse m={m} ml={ml:6d} tb=512", R)
        print(f"   speedup vs m=1: {base / t:5.2f}x", flush=True)
    # larger super-blocks amortize fixed cost further at coarse spans
    _bench(full(4, 21504 * 4, tb=1024), "diffuse m=4 tb=1024        ", R)
    _bench(full(8, 21504 * 8, tb=1024), "diffuse m=8 tb=1024        ", R)


if __name__ == "__main__" and not os.environ.get("PREC_AB"):
    main()


def precision_ab():
    """Is exact diffuse bound by the HIGHEST-precision MXU passes?"""
    bunny, _ = _load_bunny()
    bvh = BVH(bunny)
    aux = bvh.packet_aux
    jax.block_until_ready(aux.gtab_pad)
    drays = _diffuse_rays(bvh, aux)
    jax.block_until_ready(drays.o)
    R = drays.o.shape[0]
    far = jnp.asarray(1e30, jnp.float32)

    def full(prec, tb=512, m=1):
        def f():
            return p2.intersect_packets2(
                bvh.bvh8, aux, drays, max_leaves=21504 * m, t_max=far,
                max_blocks=512, retrace=False, tri_blk=tb,
                tiles_per_step=8, mt_precision=prec, span_mult=m)
        return f

    _bench(full("highest"), "diffuse highest tb=512     ", R)
    _bench(full("vpu"), "diffuse vpu     tb=512     ", R)
    _bench(full("vpu", tb=1024), "diffuse vpu     tb=1024    ", R)
    _bench(full("vpu", m=4), "diffuse vpu     m=4        ", R)
    h1 = full("highest")()[0]
    h2 = full("vpu")()[0]
    import numpy as _np
    print("vpu vs highest prim agree:",
          float(_np.mean(_np.asarray(h1.prim) == _np.asarray(h2.prim))))


if __name__ == "__main__" and os.environ.get("PREC_AB"):
    precision_ab()
