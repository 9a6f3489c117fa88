"""Bench the rayloop engine on the bunny diffuse/shadow batches (real TPU).

Compares against the r4 exact numbers: diffuse 1.46 MRays/s (packet),
shadow 18.8 (packet + 10 ms argsort). Sweeps f32 vs quantized tables and
a couple of (k, LQ) points.

Run: python benchmarks/rayloop_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tinybvh_tpu.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp


def main():
    from bench import _camera_rays
    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.core.rays import make_rays, Rays, RAY_MASK_ALL
    from tinybvh_tpu.core.vecmath import safe_rcp
    from tinybvh_tpu.io.loaders import load_bin
    from tinybvh_tpu.traverse.rayloop import (
        make_rayloop_tables, intersect_rayloop, is_occluded_rayloop)
    from tinybvh_tpu.traverse.packet2 import intersect_packets2

    tris = load_bin("/root/reference/testdata/bunny.bin")
    bvh = BVH(tris)
    jax.block_until_ready(bvh.bvh8.bounds)
    tb = make_rayloop_tables(bvh.bvh8, host=bvh._bvh8_host)
    tbq = make_rayloop_tables(bvh.bvh8, quantized=True, host=bvh._bvh8_host)
    jax.block_until_ready((tb.leaf_row, tbq.qbounds))

    o, d, center, extent = _camera_rays(np.asarray(bvh.aabb[0]),
                                        np.asarray(bvh.aabb[1]))
    rays = make_rays(o, d)
    R = d.shape[0]
    aux = bvh.packet_aux
    jax.block_until_ready(aux.gtab_pad)
    hits, _ = intersect_packets2(bvh.bvh8, aux, rays, max_leaves=512,
                                 t_max=jnp.asarray(1e30, jnp.float32),
                                 max_blocks=256)
    jax.block_until_ready(hits.t)
    tris_dev = bvh.tris

    @jax.jit
    def diffuse_rays(prim, t, key):
        ht = jnp.where(jnp.isfinite(t) & (t < 1e29), t, 1.0)
        p = rays.o + ht[:, None] * rays.d
        tri = tris_dev[jnp.maximum(prim, 0)]
        nrm = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        nrm = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
        nrm = jnp.where((jnp.sum(nrm * rays.d, axis=1) > 0)[:, None],
                        -nrm, nrm)
        dd = jax.random.normal(key, (R, 3), jnp.float32)
        dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
        dd = jnp.where((jnp.sum(dd * nrm, axis=1) < 0)[:, None], -dd, dd)
        mask = jnp.full(R, RAY_MASK_ALL, jnp.int32)
        return p + nrm * 1e-3, dd, safe_rcp(dd), mask

    do_, dd_, rd_, mk_ = diffuse_rays(hits.prim, hits.t, jax.random.PRNGKey(1))
    drays = Rays(o=do_, d=dd_, rd=rd_, mask=mk_)
    far = jnp.asarray(1e30, jnp.float32)
    jax.block_until_ready(drays.o)

    def timed(name, fn, n=6):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:7.1f} ms  {R/dt/1e6:6.2f} MRays/s"
              f"  (warm {warm:.0f}s)", flush=True)
        return out

    for label, t in (("f32  ", tb), ("quant", tbq)):
        for k, LQ in ((8, 16),):
            h, sovf = timed(
                f"diffuse rayloop {label} k={k:2d} LQ={LQ}",
                lambda t=t, k=k, LQ=LQ: intersect_rayloop(
                    t, drays, t_max=far, k=k, LQ=LQ))
            print(f"   hit_rate={float(jnp.mean((h.prim >= 0).astype(jnp.float32))):.4f}"
                  f" sovf={int(jnp.sum(sovf))}", flush=True)

    # shadow
    light = jnp.asarray((center + np.array([0, 2.0, 0]) * extent)
                        .astype(np.float32))
    ht = jnp.where(jnp.isfinite(hits.t) & (hits.t < 1e29), hits.t, 1.0)
    p = rays.o + ht[:, None] * rays.d
    sd = light[None, :] - p
    dist = jnp.linalg.norm(sd, axis=1, keepdims=True)
    sdn = sd / jnp.maximum(dist, 1e-20)
    srays = Rays(o=p + sdn * 1e-3, d=sdn, rd=safe_rcp(sdn),
                 mask=jnp.full(R, RAY_MASK_ALL, jnp.int32))
    tmax = dist[:, 0] * (1 - 1e-3)
    jax.block_until_ready((srays.o, tmax))
    for label, t in (("f32  ", tb), ("quant", tbq)):
        occ, sovf = timed(
            f"shadow  rayloop {label} k= 8 LQ=16",
            lambda t=t: is_occluded_rayloop(t, srays, tmax))
        print(f"   occ_rate={float(jnp.mean(occ.astype(jnp.float32))):.4f}"
              f" sovf={int(jnp.sum(sovf))}", flush=True)


if __name__ == "__main__":
    main()
