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

    # ---- attribute the >1%-t disagreements (the reference's gate) to an
    # engine via f64 brute force over all 512 instances ------------------
    s_ours = float(np.where(hp >= 0, ht, 0.0).sum())
    s_ref = float(np.where(op >= 0, ot, 0.0).sum())
    print("t checksum ratio (bucketed/oracle):",
          round(s_ours / max(s_ref, 1e-9), 5))
    t_bad = np.abs(ht - ot) > 0.01 * np.maximum(np.abs(ot), 1e-9)
    t_bad |= (hp >= 0) != (op >= 0)
    idx = np.nonzero(t_bad)[0][:24]
    print(f"rays past the 1% gate: {int(t_bad.sum())}/{t_bad.size}; "
          f"brute-forcing {len(idx)}", flush=True)
    tri = np.asarray(bunny, np.float64)
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0
    invs = np.asarray(tp.inst_inv, np.float64)
    buckets = {"oracle_wrong": 0, "bucketed_wrong": 0, "both_wrong": 0}
    for b in idx:
        oo = np.asarray(o[sub + b], np.float64)
        dd = np.asarray(d[sub + b], np.float64)
        t_true = np.inf
        for ii in range(invs.shape[0]):
            o2 = invs[ii, :3, :3] @ oo + invs[ii, :3, 3]
            d2 = invs[ii, :3, :3] @ dd
            h = np.cross(d2, e2)
            det = (e1 * h).sum(1)
            ok = np.abs(det) > 1e-30
            inv_d = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
            s = o2 - v0
            uu = (s * h).sum(1) * inv_d
            q = np.cross(s, e1)
            vv = (d2[None] * q).sum(1) * inv_d
            t = (e2 * q).sum(1) * inv_d
            hitm = ok & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (t > 1e-9)
            if hitm.any():
                t_true = min(t_true, float(t[hitm].min()))
        ok_b = (np.isfinite(t_true) and hp[b] >= 0
                and abs(ht[b] - t_true) <= 0.005 * t_true) or (
            not np.isfinite(t_true) and hp[b] < 0)
        ok_o = (np.isfinite(t_true) and op[b] >= 0
                and abs(ot[b] - t_true) <= 0.005 * t_true) or (
            not np.isfinite(t_true) and op[b] < 0)
        tag = ("both_wrong" if not ok_b and not ok_o
               else "oracle_wrong" if ok_b else "bucketed_wrong")
        buckets[tag] += 1
        print(f"  ray {sub + b}: true t {t_true:.5f}  bucketed "
              f"{ht[b]:.5f} ({'ok' if ok_b else 'WRONG'})  oracle "
              f"{ot[b]:.5f} ({'ok' if ok_o else 'WRONG'})", flush=True)
    print("attribution:", buckets)


if __name__ == "__main__":
    main()
