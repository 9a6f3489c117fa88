"""Speedtest harness — counterpart of tiny_bvh_speedtest.cpp.

Builds the scene with every builder, refits, then traces primary / shadow /
diffuse ray batches through every layout, printing the reference-style
metric table (build ms + Mtris/s, SAH cost, node counts, MRays/s) and
validating every layout's hits against the base BVH2 trace with the same
checksum tolerances as ValidateTraceResult (tiny_bvh_speedtest.cpp:338-381:
t within 1%, u/v within 5%, shadow-ray count within ±500).

Usage:
  python benchmarks/speedtest.py [--scene PATH.bin|PATH.obj] [--width 512]
  python benchmarks/speedtest.py --cpu      # force CPU backend
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/reference/testdata/bunny.bin")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-slow", action="store_true",
                    help="skip SBVH/double/optimizer stages")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="write an xprof/TensorBoard device trace of the "
                         "trace phase to DIR (jax.profiler; ~ the cl_event "
                         "timing of tiny_bvh_speedtest.cpp:1117-1131)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from tinybvh_tpu.builders.binned import build_binned
    from tinybvh_tpu.builders.lbvh import build_lbvh
    from tinybvh_tpu.builders.refit import refit, refit_plan
    from tinybvh_tpu.builders.sbvh import build_sbvh
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.io.loaders import load_bin, random_tris
    from tinybvh_tpu.layouts.bvh2 import node_counts, sah_cost
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2
    from tinybvh_tpu.render.camera import auto_camera, primary_rays
    from tinybvh_tpu.traverse.stack import (
        intersect_bvh2, is_occluded_bvh2, pack_tris,
    )
    from tinybvh_tpu.traverse.wavefront import (
        intersect_wavefront, is_occluded_wavefront,
    )
    from tinybvh_tpu.traverse.wide import intersect_bvh8, is_occluded_bvh8

    if args.scene.endswith(".obj"):
        from tinybvh_tpu.scene.mesh import load_obj

        tris = load_obj(args.scene).tris
    elif os.path.exists(args.scene):
        tris = load_bin(args.scene)
    else:
        tris = random_tris(100_000, seed=0)
    n = tris.shape[0]
    dev = jax.devices()[0]
    print(f"scene: {args.scene} ({n:,} tris), device: {dev}")
    print("=" * 72)

    # ---------------- builders ------------------------------------------
    print("BUILD PERFORMANCE")
    builders = [
        ("midpoint/median", lambda: build_binned(tris, strategy="median")),
        ("binned SAH", lambda: build_binned(tris, max_leaf=4)),
        ("LBVH (device)", lambda: jax.block_until_ready(build_lbvh(tris))),
    ]
    if not args.skip_slow:
        builders.append(("SBVH (HQ)", lambda: build_sbvh(tris, max_leaf=4)))
    built = {}
    for name, fn in builders:
        t0 = time.perf_counter()
        bvh = fn()
        dt = time.perf_counter() - t0
        s = float(sah_cost(bvh))
        tot, leaves, prims = (int(x) for x in node_counts(bvh))
        built[name] = bvh
        print(f"  {name:18s} {dt*1e3:9.1f} ms  {n/dt/1e6:7.2f} Mtris/s  "
              f"SAH {s:8.2f}  nodes {tot:7d}  prims {prims}")

    base = built["binned SAH"]
    packed = pack_tris(base, jnp.asarray(tris))
    leaf_max = int(np.asarray(base.count).max())
    # the wide layout + packet tables ride api.BVH's all-host build path
    # (native C binned SAH -> numpy collapse/aux -> one H2D upload);
    # collapse_bvh2 straight off the device `base` would read every
    # node array back through the tunnel (D2H costs minutes per MB)
    from tinybvh_tpu.api import BVH as _ApiBVH

    _api = _ApiBVH(np.asarray(tris, np.float32))
    bvh8 = _api.bvh8 if _api.bvh8 is not None else collapse_bvh2(base, tris)

    # ---------------- refit ---------------------------------------------
    plan = refit_plan(base)
    rb = refit(base, packed, plan, leaf_max=leaf_max)
    jax.block_until_ready(rb.node_min)
    t0 = time.perf_counter()
    rb = refit(base, packed, plan, leaf_max=leaf_max)
    jax.block_until_ready(rb.node_min)
    dt = time.perf_counter() - t0
    print(f"\nREFIT: {dt*1e3:.1f} ms  ({n/dt/1e6:.1f} Mtris/s)")

    # ---------------- ray batches ---------------------------------------
    lo = np.asarray(base.node_min[0])
    hi = np.asarray(base.node_max[0])
    eye, fwd, right, up = auto_camera(lo, hi)
    W = H = args.width
    prim_rays = primary_rays(eye, fwd, right, up, W, H)
    R = W * H

    # reference trace (base BVH2) for validation
    ref = intersect_bvh2(base, packed, prim_rays, leaf_max=leaf_max)
    ref_t = np.asarray(ref.t)
    ref_hit = np.asarray(ref.prim) >= 0
    hitsum = ref_hit.sum()
    print(f"\nTRACE ({R:,} primary rays, hit rate "
          f"{ref_hit.mean():.3f}) — validated vs BVH2 reference")

    # shadow batch: from hit points toward a top light
    center = (lo + hi) / 2
    ext = float((hi - lo).max())
    p = np.asarray(prim_rays.o) + np.where(
        ref_hit, ref_t, 1.0)[:, None] * np.asarray(prim_rays.d)
    light = center + np.array([0.3, 1.0, 0.2]) * ext
    sd = light[None] - p
    sn = np.linalg.norm(sd, axis=1, keepdims=True)
    shadow_rays = make_rays((p + sd / sn * 1e-3).astype(np.float32),
                            (sd / sn).astype(np.float32))
    shadow_tmax = float(np.median(sn))

    # diffuse batch: random hemisphere directions from hit points
    rng = np.random.default_rng(7)
    dd = rng.normal(size=(R, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    diffuse_rays = make_rays((p + dd * 1e-3).astype(np.float32), dd)

    def validate(hits, name):
        t = np.asarray(hits.t)
        hit = np.asarray(hits.prim) >= 0
        if (hit != ref_hit).mean() > 0.005:
            return f"INVALID (hit mask differs {((hit != ref_hit).mean()):.3%})"
        both = hit & ref_hit
        if both.any():
            err = np.abs(t[both] - ref_t[both]) / np.maximum(ref_t[both], 1e-6)
            if np.median(err) > 0.01:
                return f"INVALID (median t err {np.median(err):.3%})"
        return "ok"

    def bench(name, closest, occluded):
        h = closest(prim_rays)
        np.asarray(h.t)
        t0 = time.perf_counter()
        h = closest(prim_rays)
        np.asarray(h.t)
        dt_p = time.perf_counter() - t0
        v = validate(h, name)

        h2 = closest(diffuse_rays)
        np.asarray(h2.t)
        t0 = time.perf_counter()
        h2 = closest(diffuse_rays)
        np.asarray(h2.t)
        dt_d = time.perf_counter() - t0

        o = occluded(shadow_rays)
        np.asarray(o)
        t0 = time.perf_counter()
        o = occluded(shadow_rays)
        occ_n = int(np.asarray(o).sum())
        dt_s = time.perf_counter() - t0
        print(f"  {name:22s} primary {R/dt_p/1e6:8.3f}  diffuse "
              f"{R/dt_d/1e6:8.3f}  shadow {R/dt_s/1e6:8.3f} MRays/s  "
              f"[{v}, occ {occ_n}]")

    import contextlib
    prof = (jax.profiler.trace(args.profile) if args.profile
            else contextlib.nullcontext())
    if args.profile:
        print(f"(profiling trace phase to {args.profile})")
    prof.__enter__()
    bench("BVH2 (lockstep)",
          lambda r: intersect_bvh2(base, packed, r, leaf_max=leaf_max),
          lambda r: is_occluded_bvh2(base, packed, r, shadow_tmax,
                                     leaf_max=leaf_max))
    bench("BVH8 (lockstep)",
          lambda r: intersect_bvh8(bvh8, r),
          lambda r: is_occluded_bvh8(bvh8, r, shadow_tmax))
    # cap_factor 8: heavily-overlapped scenes overflow a 3x frontier and
    # the harness would report a silently-truncated (invalid) trace
    bench("BVH8 (wavefront)",
          lambda r: intersect_wavefront(bvh8, r, cap_factor=8)[0],
          lambda r: is_occluded_wavefront(bvh8, r, shadow_tmax))
    # quantized CWBVH-style layout through the same wavefront engine
    # (≙ the BVH8_CWBVH row of tiny_bvh_speedtest.cpp:1000-1080)
    from tinybvh_tpu.layouts.cwbvh import quantize_bvh8

    bvh8q = quantize_bvh8(bvh8)
    bench("BVH8Q (wavefront)",
          lambda r: intersect_wavefront(bvh8q, r, cap_factor=8)[0],
          lambda r: is_occluded_wavefront(bvh8q, r, shadow_tmax))
    if jax.default_backend() != "cpu":
        # packet2: scanline strips of 256 rays are valid "tiles" (any
        # shared-origin coherent bundle works); compiled kernels only —
        # interpret mode would take minutes on this batch
        from tinybvh_tpu.traverse.packet2 import (
            build_packet_aux, intersect_packets2,
        )

        aux = (_api.packet_aux if _api.bvh8 is not None
               else build_packet_aux(bvh8))
        bench("BVH8 (packet2)",
              lambda r: intersect_packets2(bvh8, aux, r, max_leaves=256)[0],
              lambda r: is_occluded_wavefront(bvh8, r, shadow_tmax))

    prof.__exit__(None, None, None)

    if not args.skip_slow:
        print("\nOPTIMIZER")
        from tinybvh_tpu.builders.optimize import optimize_reinsertion
        from tinybvh_tpu.layouts.mbvh import collapse_bvh2

        t0 = time.perf_counter()
        opt = optimize_reinsertion(built["midpoint/median"], passes=4,
                                   batch=64)
        print(f"  reinsertion: median tree SAH "
              f"{float(sah_cost(built['midpoint/median'])):.2f} → "
              f"{float(sah_cost(opt)):.2f} "
              f"({time.perf_counter()-t0:.1f} s)")
        # ≙ tiny_bvh_speedtest's "BVH8_CPU optimized" row: optimize the
        # binned-SAH tree, re-collapse, and trace the same batch
        t0 = time.perf_counter()
        opt_sah = optimize_reinsertion(base, passes=4, batch=64)
        sah_before = float(sah_cost(base))
        sah_after = float(sah_cost(opt_sah))
        print(f"  reinsertion: SAH tree {sah_before:.2f} → {sah_after:.2f} "
              f"({time.perf_counter()-t0:.1f} s)")
        bvh8_opt = collapse_bvh2(opt_sah, jnp.asarray(tris))
        bench("BVH8 optimized",
              lambda r: intersect_bvh8(bvh8_opt, r),
              lambda r: is_occluded_bvh8(bvh8_opt, r, shadow_tmax))


if __name__ == "__main__":
    main()
