"""Production-config time split of packet2 on the real TPU: cull vs
fused MT vs XLA glue, at the bench's bunny-primary configuration
(K=512, max_blocks=64). Directs optimization at the current cost center.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/split_probe.py
"""

import time

import numpy as np


def _amortize(fn, n=8):
    import jax
    import jax.numpy as jnp

    def barrier(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.ravel(leaf)[:1])

    barrier(fn())
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        barrier(outs[-1])
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
        time.sleep(1.5)
    return best


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.io.loaders import load_bin
    from tinybvh_tpu.traverse import packet2 as p2
    from tinybvh_tpu.traverse.packet import _tile_planes

    K, MB = 768, 32     # leaf budget (Kk = K//SPAN segment keys)
    tris = load_bin("/root/reference/testdata/bunny.bin")
    bvh = BVH(tris)
    aux = bvh.packet_aux
    jax.block_until_ready(aux.gtab_pad)
    lo, hi = bvh.aabb
    o, d, _, _ = bench._camera_rays(np.asarray(lo), np.asarray(hi))
    rays = make_rays(o, d)
    R = o.shape[0]
    T = R // 256
    far = jnp.asarray(1e30, jnp.float32)

    o_t = rays.o.reshape(T, 256, 3)
    d_t = rays.d.reshape(T, 256, 3)
    olo = o_t.min(axis=1)
    ohi = o_t.max(axis=1)
    planes = _tile_planes(o_t[:, 0], d_t)
    posn = jnp.maximum(planes, 0.0)
    negn = jnp.minimum(planes, 0.0)
    thresh = (jnp.einsum("tpk,tk->tp", posn, olo)
              + jnp.einsum("tpk,tk->tp", negn, ohi))
    jax.block_until_ready((posn, negn, thresh))

    Kk = K // p2.SPAN
    rps = p2.SEG_ROWS // aux.pack
    kpb = 256 // rps

    def cull():
        return p2.cull_tiles(aux, posn, negn, thresh, olo, ohi,
                             k_cap=Kk, max_blocks=MB)

    keys, counts = cull()
    jax.block_until_ready(keys)
    print("cull survivors: mean %.1f p90 %d max %d" % (
        float(jnp.mean(counts)),
        int(jnp.percentile(counts, 90)), int(jnp.max(counts))), flush=True)

    # frozen MT inputs at exactly the production shapes
    nbk = Kk // kpb
    lb, _ = p2._decode_keys(keys)
    live = keys != p2._I32MAX
    lbmin = jnp.where(live, lb, 1e30).reshape(T, nbk, kpb).min(axis=2)
    order = jnp.argsort(lbmin, axis=1)
    keys_s = jnp.take_along_axis(keys.reshape(T, nbk, kpb), order[..., None],
                                 axis=1).reshape(T, Kk)
    lb2, _ = p2._decode_keys(keys_s)
    live2 = keys_s != p2._I32MAX
    dlen = jnp.linalg.norm(d_t, axis=-1)
    maxd = jnp.maximum(dlen.max(axis=1), 1e-20)
    gate = (jnp.where(live2, lb2, 1e30).reshape(T, nbk, kpb).min(axis=2)
            / maxd[:, None])
    blk_live = live2.reshape(T, nbk, kpb).any(axis=2)
    lbg = jnp.where(blk_live, gate, jnp.inf).reshape(T, 1, nbk)
    n_live_blk = jnp.sum(blk_live, axis=1)
    cnt_k = jnp.where(jnp.minimum(counts, Kk) > 0, n_live_blk * kpb, 0)
    max_seg = aux.gtab_pad.shape[0] // rps - 1
    _, segs = p2._decode_keys(keys_s)
    offs = jnp.where(live2, jnp.minimum(segs, max_seg),
                     max_seg).astype(jnp.int32) * rps
    o_c = jnp.transpose(o_t - aux.center, (0, 2, 1))
    d_tt = jnp.transpose(d_t, (0, 2, 1))
    tmax = jnp.full((T, 1), 1e30, jnp.float32)
    jax.block_until_ready((offs, cnt_k, lbg, o_c, d_tt, tmax))

    def mt():
        return p2.mt_resolve_fused(offs, cnt_k, lbg, tmax, o_c, d_tt,
                                   aux.gtab_pad, k_cap=Kk,
                                   tri_blk=kpb * rps, pack=aux.pack)

    def full(tb=256, tps=8):
        def f():
            return p2.intersect_packets2(bvh.bvh8, aux, rays, max_leaves=K,
                                         t_max=far, max_blocks=MB,
                                         retrace=False, tri_blk=tb,
                                         tiles_per_step=tps)
        return f

    t_full = _amortize(full())
    t_cull = _amortize(cull)
    t_mt = _amortize(mt)
    print(f"full  {t_full*1e3:7.2f} ms  ({R/t_full/1e6:.1f} MRays/s)",
          flush=True)
    print(f"cull  {t_cull*1e3:7.2f} ms", flush=True)
    print(f"mt    {t_mt*1e3:7.2f} ms  ({t_mt/T*1e6:.2f} us/tile)",
          flush=True)
    print(f"glue  {(t_full-t_cull-t_mt)*1e3:7.2f} ms (residual)", flush=True)
    for tb, tps in ((512, 8), (256, 16), (512, 16), (128, 8)):
        t = _amortize(full(tb, tps))
        print(f"full tb={tb} tps={tps}  {t*1e3:7.2f} ms  "
              f"({R/t/1e6:.1f} MRays/s)", flush=True)


if __name__ == "__main__":
    main()
