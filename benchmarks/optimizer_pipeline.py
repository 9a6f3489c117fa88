"""Three-stage offline BVH optimization pipeline — counterpart of the
reference's optimizer research harness (tiny_bvh_optimizer.cpp:47-149):

  stage 1 (sweep)    — build binned-SAH trees over a range of bin counts,
                       score each by *measured* RRS traversal cost, keep
                       the best (≙ the bin-count sweep, STAGE==1);
  stage 2 (optimize) — reinsertion-optimize the winner (Mcomb ranking,
                       builders/optimize.py) and VERIFY the optimized tree
                       by re-tracing the RRS against the original
                       tree's hit distances (≙ VERIFY_OPTIMIZED_BVH,
                       tiny_bvh_optimizer.cpp:330-339 — prints
                       "damaged BVH" on any mismatch);
  stage 3 (report)   — SAH / EPO / RRS-cost table before vs after, CSV
                       written next to the scene (≙ STAT_FILE /
                       RESULTS_FILE, tiny_bvh_optimizer.cpp:51-149).

Usage: python benchmarks/optimizer_pipeline.py [--scene PATH] [--cpu]
       [--bins 4,8,12,16,24,32] [--passes 6] [--out results.csv]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def trace_t(bvh, packed, leaf_max, o, d):
    """RRS hit distances for the damage check."""
    import jax.numpy as jnp  # noqa: F401

    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.traverse.stack import intersect_bvh2

    return np.asarray(intersect_bvh2(bvh, packed, make_rays(o, d),
                                     leaf_max=leaf_max).t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/reference/testdata/suzanne.bin")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bins", default="4,8,12,16,24,32")
    ap.add_argument("--passes", type=int, default=6)
    ap.add_argument("--out", default="/tmp/optimizer_results.csv")
    ap.add_argument("--skip-epo", action="store_true")
    ap.add_argument("--builder", default="binned", choices=["binned", "lbvh"],
                    help="lbvh: optimize the low-quality LBVH tree — the "
                    "tree class reinsertion exists for (the reference "
                    "optimizer targets bad trees, "
                    "tiny_bvh_optimizer.cpp:47-149)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from benchmarks.rrs import generate_rrs, rrs_cost
    from tinybvh_tpu.builders.binned import build_binned
    from tinybvh_tpu.builders.optimize import epo_cost, optimize_reinsertion
    from tinybvh_tpu.io.loaders import load_bin
    from tinybvh_tpu.layouts.bvh2 import sah_cost
    from tinybvh_tpu.traverse.stack import pack_tris

    tris = load_bin(args.scene)
    tris_j = jnp.asarray(tris)
    print(f"scene: {args.scene} ({tris.shape[0]:,} tris)")
    rows = []

    # ---- stage 1: bin-count sweep scored by RRS cost ---------------------
    best = None
    rrs = None
    if args.builder == "lbvh":
        # one Morton/radix tree, no sweep: THIS is the tree class the
        # optimizer exists for (fast build, poor SAH)
        print("\n[stage 1] LBVH build (no sweep)")
        from tinybvh_tpu.builders.lbvh import build_lbvh

        import jax

        t0 = time.perf_counter()
        bvh = jax.tree.map(np.asarray, build_lbvh(tris_j))
        dt = time.perf_counter() - t0
        lm = int(np.asarray(bvh.count).max())
        packed = pack_tris(bvh, tris_j)
        rrs = generate_rrs(tris, bvh, packed, lm)
        c0 = rrs_cost(bvh, packed, lm, *rrs)
        s = float(sah_cost(bvh))
        print(f"  lbvh      SAH {s:8.2f}  RRS cost {c0:8.2f}  "
              f"build {dt*1e3:7.1f} ms")
        rows.append(("lbvh", 0, s, c0, ""))
        bins = 0
    else:
        print("\n[stage 1] bin-count sweep")
        for bins in (int(b) for b in args.bins.split(",")):
            t0 = time.perf_counter()
            bvh = build_binned(tris, bins=bins, max_leaf=8)
            dt = time.perf_counter() - t0
            lm = int(np.asarray(bvh.count).max())
            packed = pack_tris(bvh, tris_j)
            if rrs is None:  # one RRS for the whole pipeline, like the ref
                rrs = generate_rrs(tris, bvh, packed, lm)
            c = rrs_cost(bvh, packed, lm, *rrs)
            s = float(sah_cost(bvh))
            print(f"  bins={bins:3d}  SAH {s:8.2f}  RRS cost {c:8.2f}  "
                  f"build {dt*1e3:7.1f} ms")
            rows.append(("sweep", bins, s, c, ""))
            if best is None or c < best[1]:
                best = (bins, c, bvh, packed, lm)

        bins, c0, bvh, packed, lm = best
        print(f"  -> winner: bins={bins} (RRS cost {c0:.2f})")

    # ---- stage 2: reinsertion optimization + damage verification ---------
    print(f"\n[stage 2] reinsertion ({args.passes} passes)")
    t_ref = trace_t(bvh, packed, lm, *rrs)
    t0 = time.perf_counter()
    opt = optimize_reinsertion(bvh, passes=args.passes, batch=64)
    dt = time.perf_counter() - t0
    lm2 = int(np.asarray(opt.count).max())
    packed2 = pack_tris(opt, tris_j)
    t_opt = trace_t(opt, packed2, lm2, *rrs)
    bad = ~np.isclose(t_opt, t_ref, rtol=1e-4, atol=1e-5)
    if bad.any():
        print(f"  DAMAGED BVH: {bad.sum()}/{bad.size} RRS distances differ")
    else:
        print(f"  verified: {t_ref.size:,} RRS distances identical "
              f"({dt:.1f} s)")

    # ---- stage 3: report -------------------------------------------------
    print("\n[stage 3] report")
    c1 = rrs_cost(opt, packed2, lm2, *rrs)
    s0, s1 = float(sah_cost(bvh)), float(sah_cost(opt))
    e0 = e1 = float("nan")
    if not args.skip_epo:
        e0 = float(epo_cost(bvh, tris))
        e1 = float(epo_cost(opt, tris))
    print(f"  {'':12s}{'SAH':>10s}{'EPO':>10s}{'RRS cost':>10s}")
    print(f"  {'before':12s}{s0:10.2f}{e0:10.2f}{c0:10.2f}")
    print(f"  {'after':12s}{s1:10.2f}{e1:10.2f}{c1:10.2f}")
    print(f"  gain: SAH {100*(1-s1/s0):+.1f}%  RRS {100*(1-c1/c0):+.1f}%")
    rows.append(("optimized", bins, s1, c1, "damaged" if bad.any() else "ok"))

    with open(args.out, "w") as f:
        f.write("stage,bins,sah,rrs_cost,verify\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")
    print(f"  wrote {args.out}")


if __name__ == "__main__":
    main()
