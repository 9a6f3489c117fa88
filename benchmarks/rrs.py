"""Representative Ray Set (RRS) generation + trace-cost evaluation.

Counterpart of the optimizer harness's RRS machinery
(tiny_bvh_optimizer.cpp:203-327): sample camera viewpoints on the scene's
bounding sphere, trace low-res primary rays, spawn one diffuse bounce ray
per hit, and use the pooled set to score BVHs by *measured* traversal cost
(the cost counters the traversal returns, ≙ the RRS cost kernel
traverse_bvh2.cl:7-77) rather than by SAH alone.

Usage: python benchmarks/rrs.py [--scene PATH]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def generate_rrs(tris, bvh, packed, leaf_max, n_views: int = 4, res: int = 64,
                 seed: int = 0):
    """Returns (origins, directions) pooled over views: primary + bounce."""
    import jax.numpy as jnp

    from tinybvh_tpu.core.intersect import tri_edges
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.render.camera import look_at, primary_rays
    from tinybvh_tpu.traverse.stack import intersect_bvh2

    rng = np.random.default_rng(seed)
    lo = np.asarray(bvh.node_min[0])
    hi = np.asarray(bvh.node_max[0])
    center = (lo + hi) / 2
    ext = float(np.max(hi - lo))
    os_, ds_ = [], []
    for v in range(n_views):
        u = rng.normal(size=3)
        u /= np.linalg.norm(u)
        eye, fwd, right, up = look_at(center + u * ext * 1.3, center)
        rays = primary_rays(eye, fwd, right, up, res, res)
        hits = intersect_bvh2(bvh, packed, rays, leaf_max=leaf_max)
        os_.append(np.asarray(rays.o))
        ds_.append(np.asarray(rays.d))
        # diffuse bounce rays from the hit points
        hit = np.asarray(hits.prim) >= 0
        if hit.any():
            p = np.asarray(rays.o) + np.asarray(hits.t)[:, None] * np.asarray(rays.d)
            prim = np.maximum(np.asarray(hits.prim), 0)
            v0, e1, e2 = tri_edges(jnp.asarray(tris)[prim])
            n = np.array(jnp.cross(e1, e2))
            n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
            d2 = rng.normal(size=p.shape).astype(np.float32)
            d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
            flip = (d2 * n).sum(axis=1) < 0
            d2[flip] = -d2[flip]
            os_.append((p + n * 1e-3)[hit])
            ds_.append(d2[hit])
    return (np.concatenate(os_).astype(np.float32),
            np.concatenate(ds_).astype(np.float32))


def rrs_cost(bvh, packed, leaf_max, o, d) -> float:
    """Mean measured traversal cost over the RRS (c_trav + c_int units)."""
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.traverse.stack import intersect_bvh2

    rays = make_rays(o, d)
    _, cost = intersect_bvh2(bvh, packed, rays, leaf_max=leaf_max,
                             with_cost=True)
    return float(np.asarray(cost).mean())


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/reference/testdata/suzanne.bin")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tinybvh_tpu.builders.binned import build_binned
    from tinybvh_tpu.builders.optimize import optimize_reinsertion
    from tinybvh_tpu.io.loaders import load_bin
    from tinybvh_tpu.layouts.bvh2 import sah_cost
    from tinybvh_tpu.traverse.stack import pack_tris

    tris = load_bin(args.scene)
    results = {}
    for name, builder in (
        ("median", lambda: build_binned(tris, strategy="median")),
        ("binned", lambda: build_binned(tris, max_leaf=8)),
    ):
        bvh = builder()
        lm = int(np.asarray(bvh.count).max())
        packed = pack_tris(bvh, jnp.asarray(tris))
        o, d = generate_rrs(tris, bvh, packed, lm)
        c = rrs_cost(bvh, packed, lm, o, d)
        results[name] = (float(sah_cost(bvh)), c)
        print(f"{name:8s} SAH {results[name][0]:8.2f}  RRS cost {c:8.2f} "
              f"({len(o):,} rays)")
    # optimizer effect on the median tree, scored by RRS
    bvh = build_binned(tris, strategy="median")
    opt = optimize_reinsertion(bvh, passes=8, batch=128)
    lm = int(np.asarray(opt.count).max())
    packed = pack_tris(opt, jnp.asarray(tris))
    o, d = generate_rrs(tris, opt, packed, lm)
    print(f"optimized-median SAH {float(sah_cost(opt)):8.2f}  "
          f"RRS cost {rrs_cost(opt, packed, lm, o, d):8.2f}")


if __name__ == "__main__":
    main()
