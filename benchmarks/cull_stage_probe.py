"""Per-stage timing of the packet2 cull on the real TPU: K1a block cull,
XLA worklist compaction, K1b leaf cull — to direct optimization at the
actual cost center (measured 8.5 ms total on bunny with mean survivors
of only 38/tile).

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python benchmarks/cull_stage_probe.py
"""

import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench
    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.io.loaders import load_bin
    from tinybvh_tpu.traverse import packet2 as p2
    from tinybvh_tpu.traverse.packet import _tile_planes

    print("device:", jax.devices()[0], flush=True)
    tris = load_bin("/root/reference/testdata/bunny.bin")
    bvh = BVH(tris)
    aux = bvh.packet_aux
    jax.block_until_ready(aux.gtab_pad)

    lo, hi = bvh.aabb
    o, d, _, _ = bench._camera_rays(np.asarray(lo), np.asarray(hi))
    T = o.shape[0] // 256
    o_t = jnp.asarray(o).reshape(T, 256, 3)
    d_t = jnp.asarray(d).reshape(T, 256, 3)
    olo = o_t.min(axis=1)
    ohi = o_t.max(axis=1)
    planes = _tile_planes(o_t[:, 0], d_t)
    posn = jnp.maximum(planes, 0.0)
    negn = jnp.minimum(planes, 0.0)
    thresh = (jnp.einsum("tpk,tk->tp", posn, olo)
              + jnp.einsum("tpk,tk->tp", negn, ohi))
    jax.block_until_ready((posn, negn, thresh, olo, ohi))
    TB, LANES = p2.TB, p2.LANES
    G = T // TB
    nbpad = aux.blk_lo.shape[1]
    nb = aux.n_blocks
    max_blocks = 256
    tp = T
    desc = jnp.concatenate([
        posn.reshape(tp, 12), negn.reshape(tp, 12), thresh,
        olo, ohi, jnp.full((tp, 1), 1e30, jnp.float32),
        jnp.zeros((tp, 128 - p2._D_LANES), jnp.float32)], axis=1)
    jax.block_until_ready(desc)

    @jax.jit
    def k1a():
        return pl.pallas_call(
            partial(p2._cull_blocks_kernel, n_blocks=nb),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((TB, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, nbpad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, nbpad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=jax.ShapeDtypeStruct((G, 1, nbpad), jnp.int32),
            out_specs=pl.BlockSpec((1, 1, nbpad), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(desc, aux.blk_lo, aux.blk_hi)[:, 0, :]

    @jax.jit
    def k1a_wl():
        blkmask = k1a()
        m = blkmask > 0
        rank = jnp.cumsum(m, axis=1) - m
        gidx = jnp.arange(G, dtype=jnp.int32)[:, None]
        tgt = gidx * max_blocks + jnp.minimum(rank, max_blocks - 1)
        blk_ids = jnp.broadcast_to(
            jnp.arange(nbpad, dtype=jnp.int32), m.shape)
        wl = jnp.full((G * max_blocks,), -1, jnp.int32).at[
            jnp.where(m, tgt, G * max_blocks - 1)
        ].max(jnp.where(m, blk_ids, -1)).reshape(G, 1, max_blocks)
        n_blk_g = (rank[:, -1] + m[:, -1]).astype(jnp.int32)
        return wl, n_blk_g

    def cull_full():
        return p2.cull_tiles(aux, posn, negn, thresh, olo, ohi,
                             k_cap=512, max_blocks=max_blocks)

    for name, fn in (("K1a", k1a), ("K1a+worklist", k1a_wl),
                     ("cull full", cull_full)):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        c = time.perf_counter() - t0
        dt = bench._amortized(fn)
        print(f"{name:14s} compile {c:6.1f}s  amortized {dt * 1e3:7.2f} ms",
              flush=True)

    # live blocks per group (how much work K1b actually has)
    _, nbg = k1a_wl()
    nbg = np.asarray(nbg)
    print(f"live blocks/group: mean={nbg.mean():.1f} "
          f"p90={np.percentile(nbg, 90):.0f} max={nbg.max()} (nb={nb})",
          flush=True)


if __name__ == "__main__":
    main()
