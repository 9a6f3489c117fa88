"""Exact-diffuse timing probe: what does an EXACT incoherent trace cost?

The bench's diffuse phase (bounce rays from primary hits) has the widest
frusta of any phase: the true survivor distribution is mean 616 segments
per sorted tile, p90 2178, max 5313 (overflow_probe). Budgets that cover
the max are big — but the fused MT kernel walks blocks NEAR-TO-FAR with
a t_far gate, so closest-hit work is bounded by the first hits, not the
list length; the question is what the cull + escalation actually cost.
This probe times the sorted diffuse trace at several (ml, retrace_ml)
points and prints MRays/s + residual overflow so bench.py's diffuse
phase can pick the fastest EXACT configuration.
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
from tinybvh_tpu.traverse.packet2 import (
    intersect_packets2, intersect_packets2_sorted)


def main():
    bunny, _ = _load_bunny()
    bvh = BVH(bunny)
    aux = bvh.packet_aux
    jax.block_until_ready(aux.gtab_pad)
    lo, hi = bvh.aabb
    o, d, center, extent = _camera_rays(np.asarray(lo), np.asarray(hi))
    rays = make_rays(o, d)
    far = jnp.asarray(1e30, jnp.float32)
    hits, _ = intersect_packets2(bvh.bvh8, aux, rays, max_leaves=512,
                                 t_max=far, max_blocks=64, retrace=False)
    jax.block_until_ready(hits.t)

    # bench's diffuse ray assembly (host twin)
    rng = np.random.default_rng(2)
    tris_np = np.asarray(bunny)
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
    mask = np.full(p.shape[0], RAY_MASK_ALL, np.int32)
    drays = Rays(o=jnp.asarray(do), d=jnp.asarray(dd),
                 rd=jnp.asarray(safe_rcp(dd)), mask=jnp.asarray(mask))
    lo_d, hi_d = jnp.asarray(lo), jnp.asarray(hi)
    R = p.shape[0]

    def run(ml, rml, mb, label):
        def f():
            return intersect_packets2_sorted(
                bvh.bvh8, aux, drays, lo_d, hi_d, max_leaves=ml,
                t_max_static=1e30, max_blocks=mb,
                retrace="packet" if rml else False, retrace_ml=rml,
                retrace_blocks=mb)
        t0 = time.time()
        h, ov = f()
        jax.block_until_ready(h.t)
        warm_s = time.time() - t0
        novf = int(jnp.sum(ov))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [f() for _ in range(4)]
            np.asarray(jnp.ravel(outs[-1][0].t)[:1])
            best = min(best, (time.perf_counter() - t0) / 4)
            time.sleep(1.0)
        print(f"{label}: warm={warm_s:.0f}s overflow_rays={novf} "
              f"mrays={R / best / 1e6:.2f}", flush=True)
        return h

    run(512, 0, 256, "ml=512 approx        ")
    run(2048, 0, 256, "ml=2048 approx       ")
    run(2048, 8192, 512, "ml=2048 r=8192 packet")
    run(8192, 0, 512, "ml=8192 approx       ")
    h = run(8192, 32768, 512, "ml=8192 r=32768 exact")
    # exactness spot check vs the wavefront on a subset
    from tinybvh_tpu.traverse.wavefront import intersect_wavefront

    sub = slice(0, 4096)
    wf, _ = intersect_wavefront(
        bvh.bvh8,
        Rays(o=drays.o[sub], d=drays.d[sub], rd=drays.rd[sub],
             mask=drays.mask[sub]), cap_factor=16)
    agree = float(np.mean(np.asarray(h.prim)[sub] == np.asarray(wf.prim)))
    print(f"prim agreement vs wavefront on 4096 rays: {agree:.4f}")


if __name__ == "__main__":
    main()
