"""Diagnose the inst512 oracle disagreement on the real TPU.

BENCH_r04 rehearsals report oracle_prim_agree = 0.60254 on the
512-instance section — EXACTLY the same value across three different
engine configurations (rounds 16/28, escalation budgets, wavefront
netting), while the small-scale CPU repro agrees 1.0 against both the
lockstep oracle and f64 brute force once candidate overflow is netted.
This probe rebuilds the bench scene and prints where the two engines
disagree (miss-vs-hit, instance mismatch, t mismatch) to localize
whether the bucketed trace or the lockstep oracle is wrong at scale.
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
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.tlas.instance import intersect_tlas8
from tinybvh_tpu.tlas.packet import (
    build_tlas_packet, intersect_tlas_packets2_bucketed)


def main():
    bunny, _ = _load_bunny()
    bvh_b = BVH(bunny)
    blas = bvh_b.bvh8
    ex = bunny.reshape(-1, 3).max(0) - bunny.reshape(-1, 3).min(0)
    mats = []
    for i in range(8):
        for j in range(8):
            for k in range(8):
                m = np.eye(4, dtype=np.float32)
                m[:3, 3] = ex * 1.15 * np.array([i, j, k], np.float32)
                mats.append(m)
    tp = build_tlas_packet([blas], np.stack(mats),
                           host8s=[bvh_b._bvh8_host])
    jax.block_until_ready(tp.tlas.bounds)
    n_segs = -(-int(blas.n_leaves) // 4)
    rml = 4 * (-(-n_segs // 8) * 8)
    wlo = np.asarray(bunny.reshape(-1, 3).min(0))
    whi = wlo + np.asarray(ex) * np.array([1.15 * 7 + 1] * 3)
    o, d, _, _ = _camera_rays(wlo, whi, W=512, H=512)
    rays = make_rays(o, d)
    far = jnp.asarray(1e30, jnp.float32)
    jax.block_until_ready(far)

    h, ovf = intersect_tlas_packets2_bucketed(
        tp, rays, t_max=far, rounds=28, max_leaves=1024, max_blocks=256,
        retrace="packet", retrace_ml=rml, retrace_blocks=256)
    jax.block_until_ready(h.t)
    print("bucketed overflow tiles:", int(jnp.sum(ovf)),
          "hit_rate:", round(float(jnp.mean((h.prim >= 0)
                                            .astype(jnp.float32))), 4),
          flush=True)

    sub = o.shape[0] // 2 - 1024
    rsub = make_rays(o[sub:sub + 2048], d[sub:sub + 2048])
    t0 = time.time()
    ho = intersect_tlas8(tp.tlas, rsub, 1e30)
    jax.block_until_ready(ho.t)
    print(f"oracle trace {time.time() - t0:.0f}s  hit_rate:",
          round(float(jnp.mean((ho.prim >= 0).astype(jnp.float32))), 4),
          flush=True)

    hp = np.asarray(h.prim[sub:sub + 2048])
    hi_ = np.asarray(h.inst[sub:sub + 2048])
    ht = np.asarray(h.t[sub:sub + 2048])
    op = np.asarray(ho.prim)
    oi = np.asarray(ho.inst)
    ot = np.asarray(ho.t)
    agree = hp == op
    print("prim agree:", round(float(agree.mean()), 5))
    bad = ~agree
    print("  bucketed miss / oracle hit:", int(((hp < 0) & (op >= 0)).sum()))
    print("  bucketed hit / oracle miss:", int(((hp >= 0) & (op < 0)).sum()))
    both = (hp >= 0) & (op >= 0) & bad
    print("  both hit, prim differs:", int(both.sum()),
          " of which inst differs:", int((both & (hi_ != oi)).sum()))
    tt = (hp >= 0) & (op >= 0)
    if tt.any():
        rel = np.abs(ht[tt] - ot[tt]) / np.maximum(np.abs(ot[tt]), 1e-9)
        print("  t rel diff (both-hit): median",
              float(np.median(rel)), "max", float(rel.max()))
    bidx = np.nonzero(bad)[0][:6]
    for b in bidx:
        print(f"  ray {sub + b}: bucketed {hi_[b]}/{hp[b]}/{ht[b]:.5f} "
              f"oracle {oi[b]}/{op[b]}/{ot[b]:.5f}")


if __name__ == "__main__":
    main()
