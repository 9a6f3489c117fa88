"""Split the EXACT diffuse trace cost into cull vs MT on the real TPU.

diffuse_probe.py showed exactness costs 5x (7.55 approx -> 1.44 exact
MRays/s): the true survivor distribution (mean 616 segs/tile) makes the
incoherent phase the worst ratio vs the reference. This probe times the
cull stage alone (same frusta, exact budget) against the full pipeline
so the next optimization targets the dominant stage:

  * cull-bound  -> butterfly/accumulator width (chunked merge) work
  * MT-bound    -> per-segment DMA count/bytes (2-tris-per-row packing)

Also sweeps tri_blk / tiles_per_step on the full exact call.
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

from bench import _camera_rays, _load_bunny
from tinybvh_tpu.api import BVH
from tinybvh_tpu.core.rays import RAY_MASK_ALL, Rays, make_rays
from tinybvh_tpu.core.vecmath import safe_rcp
from tinybvh_tpu.traverse import packet2 as p2


def _diffuse_rays(bvh, aux):
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
    # pre-sort into the coherent tiling so the probe measures the core
    from tinybvh_tpu.traverse.packet import sort_rays_coherent

    order, _ = sort_rays_coherent(jnp.asarray(do), jnp.asarray(dd),
                                  jnp.asarray(lo), jnp.asarray(hi))
    order = np.asarray(order)
    do, dd = do[order], dd[order]
    mask = np.full(p.shape[0], RAY_MASK_ALL, np.int32)
    return Rays(o=jnp.asarray(do), d=jnp.asarray(dd),
                rd=jnp.asarray(safe_rcp(dd)), mask=jnp.asarray(mask))


def _bench(f, label, R):
    out = f()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f() for _ in range(4)]
        np.asarray(jnp.ravel(jax.tree_util.tree_leaves(outs[-1])[0])[:1])
        best = min(best, (time.perf_counter() - t0) / 4)
        time.sleep(1.5)
    print(f"{label}: {best*1e3:7.2f} ms  ({R/best/1e6:5.2f} MRays/s)",
          flush=True)
    return best


def main():
    bunny, _ = _load_bunny()
    bvh = BVH(bunny)
    aux = bvh.packet_aux
    jax.block_until_ready(aux.gtab_pad)
    drays = _diffuse_rays(bvh, aux)
    jax.block_until_ready(drays.o)
    R = drays.o.shape[0]
    far = jnp.asarray(1e30, jnp.float32)

    ML, MB = 8192, 512
    kk = ML // p2.SPAN

    @jax.jit
    def cull_only(rays):
        (posn, negn, thresh, olo, ohi, tcap, dlen,
         tmax_rt, t0) = p2._tile_frusta(aux, rays, 1e30)
        leaf_bits = max(p2._LEAF_BITS,
                        (aux.leaf_lo.shape[1] - 1).bit_length())
        keys, counts = p2.cull_tiles(aux, posn, negn, thresh, olo, ohi,
                                     tcap, k_cap=kk, max_blocks=MB,
                                     leaf_bits=leaf_bits)
        return counts

    def full(tb=256, tps=8):
        def f():
            return p2.intersect_packets2(
                bvh.bvh8, aux, drays, max_leaves=ML, t_max=far,
                max_blocks=MB, retrace=False, tri_blk=tb,
                tiles_per_step=tps)
        return f

    t_cull = _bench(lambda: cull_only(drays), "cull only (ml=8192)      ", R)
    t_full = _bench(full(), "full tb=256 tps=8        ", R)
    print(f"  -> MT+sort share: {1e3 * (t_full - t_cull):.2f} ms")
    _bench(full(512, 8), "full tb=512 tps=8        ", R)
    _bench(full(256, 16), "full tb=256 tps=16       ", R)
    _bench(full(512, 16), "full tb=512 tps=16       ", R)


if __name__ == "__main__":
    main()
