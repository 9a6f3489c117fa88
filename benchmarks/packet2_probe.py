"""Real-TPU probe for the packet2 pipeline: per-stage + end-to-end timing.

STALE (r3 segment change): stage_gather still decodes cull keys as
per-leaf ids and stage_fused still builds per-32-key gates, so the
printed PER-STAGE numbers no longer reflect the production
segment-granularity pipeline (SPAN/SEG_ROWS) — use split_probe.py for
current per-stage timing. The end-to-end and agreement checks at the
end remain valid.

Timing methodology per benchmarks/op_cost_probe.py: jitted calls, input
varied between repeats where cheap, host transfer forced at the end of each
timed region. Run standalone on the tunneled TPU (single client!).
"""

import time
import sys

import numpy as np


def main(K=256):
    import jax
    import jax.numpy as jnp

    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.io.loaders import load_bin
    from tinybvh_tpu.traverse import packet2 as p2
    from tinybvh_tpu.traverse.packet import _tile_planes

    tris = load_bin("/root/reference/testdata/bunny.bin")
    print("tris:", tris.shape, "backend:", jax.default_backend(), flush=True)
    bvh = BVH(tris)
    bvh8 = bvh.bvh8
    aux = p2.build_packet_aux(bvh8)
    jax.block_until_ready(aux.gtab_pad)
    print("aux ready: L =", aux.n_leaves, flush=True)

    lo, hi = bvh.aabb
    center = (lo + hi) * 0.5
    extent = float(np.max(hi - lo))
    eye = center + np.array([0.6, 0.35, 1.1]) * extent * 1.2
    fwd = center - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    W = H = 640
    xs = (np.arange(W) + 0.5) / W - 0.5
    ys = (np.arange(H) + 0.5) / H - 0.5
    gx, gy = np.meshgrid(xs, ys)
    d = (fwd[None, None] + 0.9 * gx[..., None] * right[None, None]
         + 0.9 * gy[..., None] * up[None, None])
    d /= np.linalg.norm(d, axis=2, keepdims=True)
    d = d.reshape(H // 16, 16, W // 16, 16, 3).transpose(0, 2, 1, 3, 4)
    d = d.reshape(-1, 3).astype(np.float32)
    o = np.broadcast_to(eye.astype(np.float32), d.shape)
    rays = make_rays(o, d)
    R = d.shape[0]
    T = R // 256
    print("rays:", R, "tiles:", T, flush=True)

    def timeit(name, fn, *args, reps=3, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args, **kw)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        print(f"{name:22s} {min(ts)*1e3:8.2f} ms", flush=True)
        return out, min(ts)

    def timeit_n(name, fn, *args, n=10, **kw):
        """Amortized DEVICE time: queue n async dispatches, sync once —
        the ~30 ms tunnel round-trip floor is paid once, so
        (wall - floor)/n ~ device time per call."""
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(*args, **kw) for _ in range(n)]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        print(f"{name:22s} {dt/n*1e3:8.2f} ms/call amortized over {n}",
              flush=True)
        return dt / n

    # stage 1: cull
    o4 = jnp.asarray(o.reshape(T, 256, 3))
    d4 = jnp.asarray(d.reshape(T, 256, 3))

    import functools

    @functools.partial(jax.jit, static_argnames=("k_cap",))
    def stage_cull(aux, o4, d4, k_cap):
        olo, ohi = o4.min(axis=1), o4.max(axis=1)
        planes = _tile_planes(o4[:, 0], d4)
        posn = jnp.maximum(planes, 0.0)
        negn = jnp.minimum(planes, 0.0)
        thresh = (jnp.einsum("tpk,tk->tp", posn, olo)
                  + jnp.einsum("tpk,tk->tp", negn, ohi))
        return p2.cull_tiles(aux, posn, negn, thresh, olo, ohi, k_cap=k_cap)

    (keys, counts), t_cull = timeit("cull (K1)", stage_cull, aux, o4, d4, K)
    cnt = np.asarray(counts)
    print("  leaf counts: mean", cnt.mean(), "max", cnt.max(),
          "overflow tiles:", (cnt > K).sum(), flush=True)

    # K1 substages: coarse block kernel alone, then + worklist compaction
    from tinybvh_tpu.traverse.packet2 import (
        TB, _cull_blocks_kernel, LANES)
    import jax as _jax

    @functools.partial(_jax.jit, static_argnames=())
    def stage_k1a(aux, o4, d4):
        olo, ohi = o4.min(axis=1), o4.max(axis=1)
        planes = _tile_planes(o4[:, 0], d4)
        posn = jnp.maximum(planes, 0.0)
        negn = jnp.minimum(planes, 0.0)
        thresh = (jnp.einsum("tpk,tk->tp", posn, olo)
                  + jnp.einsum("tpk,tk->tp", negn, ohi))
        import jax.experimental.pallas as _pl
        from jax.experimental.pallas import tpu as _pltpu
        from tinybvh_tpu.traverse.packet2 import _D_LANES
        G = posn.shape[0] // TB
        nbpad = aux.blk_lo.shape[1]
        tp = posn.shape[0]
        desc = jnp.concatenate([
            posn.reshape(tp, 12), negn.reshape(tp, 12), thresh,
            olo, ohi, jnp.full((tp, 1), 1e30, jnp.float32),
            jnp.zeros((tp, 128 - _D_LANES), jnp.float32)], axis=1)
        blkmask = _pl.pallas_call(
            functools.partial(_cull_blocks_kernel, n_blocks=aux.n_blocks),
            grid=(G,),
            in_specs=[
                _pl.BlockSpec((TB, 128), lambda i: (i, 0),
                              memory_space=_pltpu.VMEM),
                _pl.BlockSpec((3, nbpad), lambda i: (0, 0),
                              memory_space=_pltpu.VMEM),
                _pl.BlockSpec((3, nbpad), lambda i: (0, 0),
                              memory_space=_pltpu.VMEM),
            ],
            out_shape=_jax.ShapeDtypeStruct((G, 1, nbpad), jnp.int32),
            out_specs=_pl.BlockSpec((1, 1, nbpad), lambda i: (i, 0, 0),
                                    memory_space=_pltpu.VMEM),
        )(desc, aux.blk_lo, aux.blk_hi)
        return blkmask

    bm, t_k1a = timeit("  K1a coarse", stage_k1a, aux, o4, d4)
    nsurv = (np.asarray(bm)[:, 0, :] > 0).sum(axis=1)
    print("  surviving blocks/group: mean", nsurv.mean(), "max",
          nsurv.max(), flush=True)

    @jax.jit
    def stage_gather(aux, keys):
        keys_s = keys[:, :K]
        _, leaves = p2._decode_keys(keys_s)
        live = keys_s != p2._I32MAX
        lrow = jnp.where(live, leaves, 0)
        gflat = aux.gtab_pad[:, :48]
        zrow = jnp.int32(4 * aux.n_leaf_rows)
        lanes4 = jnp.arange(4, dtype=jnp.int32)
        tri_idx = jnp.where(live[:, :, None],
                            lrow[:, :, None] * 4 + lanes4,
                            zrow).reshape(T, K * 4)
        geom = gflat[tri_idx]
        blk_live = live.reshape(T, K // 32, 32).any(axis=2)
        lbg = jnp.where(blk_live, 0.0, jnp.inf).reshape(T, 1, K // 32)
        return geom, lbg, lrow

    (geom, lbg, lrow), t_gather = timeit("gather", stage_gather, aux, keys)

    o_c = jnp.transpose(o4 - aux.center, (0, 2, 1))
    d_t = jnp.transpose(d4, (0, 2, 1))
    tmax = jnp.full((T, 1, 1), 1e30, jnp.float32)
    (bt, bi), t_mt = timeit("MT (K2)", p2.mt_resolve, o_c, d_t, geom, lbg,
                            tmax)

    # fused K2 stage alone (same inputs as gather+MT combined)
    @functools.partial(jax.jit, static_argnames=())
    def stage_fused(aux, keys, counts, o4, d4):
        keys_s = keys[:, :K]
        lbg = jnp.zeros((T, 1, K // 32), jnp.float32)
        tmax = jnp.full((T, 1), 1e30, jnp.float32)
        o_c = jnp.transpose(o4 - aux.center, (0, 2, 1))
        d_t = jnp.transpose(d4, (0, 2, 1))
        return p2.mt_resolve_fused(keys_s, jnp.minimum(counts, K), lbg,
                                   tmax, o_c, d_t, aux.gtab_pad, k_cap=K)

    _, t_fused = timeit("fused K2", stage_fused, aux, keys, counts, o4, d4)

    # end-to-end
    def e2e(rays, fused=True):
        hits, ovf = p2.intersect_packets2(bvh8, aux, rays, max_leaves=K,
                                          retrace=False, fused=fused)
        return hits.t, hits.prim, ovf

    _, t_e2e_uf = timeit("end-to-end unfused", e2e, rays, fused=False)
    (ht, hp, ovf), t_e2e = timeit("end-to-end", e2e, rays)
    print(f"primary MRays/s (packet2): {R / t_e2e / 1e6:.2f}", flush=True)

    # pure-VPU broadcast-FMA variant (full f32, no MXU passes)
    def e2e_vpu(rays):
        hits, ovf2 = p2.intersect_packets2(bvh8, aux, rays, max_leaves=K,
                                           retrace=False,
                                           mt_precision="vpu")
        return hits.t, hits.prim, ovf2

    (ht_v, hp_v, _), t_e2e_v = timeit("end-to-end (VPU)", e2e_vpu, rays)
    dif = int((np.asarray(hp_v) != np.asarray(hp)).sum())
    print(f"VPU vs HIGHEST: prim diffs {dif}  "
          f"({R / t_e2e_v / 1e6:.2f} MRays/s)", flush=True)

    # ---- amortized device times (tunnel floor paid once per batch) ------
    d_cull = timeit_n("cull (amort)", stage_cull, aux, o4, d4, K)
    d_fused = timeit_n("fused K2 (amort)", stage_fused, aux, keys, counts,
                       o4, d4)
    d_e2e = timeit_n("e2e (amort)", e2e, rays)
    d_vpu = timeit_n("e2e VPU (amort)", e2e_vpu, rays)
    print(f"DEVICE primary MRays/s: highest {R/d_e2e/1e6:.2f}  "
          f"vpu {R/d_vpu/1e6:.2f}", flush=True)

    # ---- big batch (4x rays): device-rate at amortized dispatch ---------
    W2 = 1280
    xs2 = (np.arange(W2) + 0.5) / W2 - 0.5
    gx2, gy2 = np.meshgrid(xs2, xs2)
    d2 = (fwd[None, None] + 0.9 * gx2[..., None] * right[None, None]
          + 0.9 * gy2[..., None] * up[None, None])
    d2 /= np.linalg.norm(d2, axis=2, keepdims=True)
    d2 = d2.reshape(W2 // 16, 16, W2 // 16, 16, 3).transpose(0, 2, 1, 3, 4)
    d2 = d2.reshape(-1, 3).astype(np.float32)
    o2 = np.broadcast_to(eye.astype(np.float32), d2.shape)
    rays2 = make_rays(o2, d2)
    R2 = d2.shape[0]
    (_, hp2, ov2), t_big = timeit("e2e 1.6M rays", e2e, rays2)
    print(f"big-batch primary MRays/s: {R2 / t_big / 1e6:.2f} "
          f"(ovf {int(np.asarray(ov2).sum())})", flush=True)
    print("hit rate:", float(np.mean(np.asarray(hp) >= 0)),
          "overflow:", int(np.asarray(ovf).sum()), flush=True)

    # agreement vs wavefront
    from tinybvh_tpu.traverse.wavefront import intersect_wavefront
    ref, wovf = intersect_wavefront(bvh8, rays, cap_factor=6)
    agree = float(np.mean(np.asarray(hp) == np.asarray(ref.prim)))
    print("prim agree vs wavefront:", agree,
          "wf ovf:", bool(np.asarray(wovf)), flush=True)


if __name__ == "__main__":
    main(K=int(sys.argv[1]) if len(sys.argv) > 1 else 256)
