"""Probe: existing lockstep wide-BVH8 engine on the bench's diffuse batch.

The r4 bench traced diffuse through the packet engine (1.46 MRays/s exact;
frusta over-cover incoherent bundles by design). This measures what the
per-ray lockstep engine (traverse/wide.py) does on the SAME 409k-ray
incoherent batch — the decision input for the round-5 per-ray engine:
if plain-XLA lockstep is already in the >3 MRays/s class, the new
incoherent engine is an optimized lockstep (deferred leaf resolve, thin
stacks) rather than a from-scratch Pallas kernel.

Run on the real TPU: python benchmarks/rayloop_probe.py [n_rays]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.core.rays import make_rays, Rays, RAY_MASK_ALL
    from tinybvh_tpu.core.vecmath import safe_rcp
    from tinybvh_tpu.io.loaders import load_bin
    from tinybvh_tpu.traverse.wide import intersect_bvh8, is_occluded_bvh8

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    tris = load_bin("/root/reference/testdata/bunny.bin")
    print(f"bunny: {tris.shape[0]} tris", flush=True)
    t0 = time.perf_counter()
    bvh = BVH(tris)
    jax.block_until_ready(bvh.bvh8.bounds)
    print(f"BVH(): {time.perf_counter()-t0:.2f}s  "
          f"nodes={bvh.bvh8.n_nodes} leaves={bvh.bvh8.n_leaves}", flush=True)

    lo, hi = np.asarray(bvh.aabb[0]), np.asarray(bvh.aabb[1])
    center = (lo + hi) / 2
    extent = float(np.max(hi - lo))
    eye = center + np.array([0, 0.22, 0.9]) * extent * 2.2
    xs = (np.arange(side) + 0.5) / side * 2 - 1
    gx, gy = np.meshgrid(xs, xs)
    fwd = center - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    d = (fwd[None, :] + 0.6 * gx.reshape(-1, 1) * right[None, :]
         + 0.6 * gy.reshape(-1, 1) * up[None, :]).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(eye, d.shape).astype(np.float32)
    rays = make_rays(o, d)
    R = d.shape[0]
    print(f"{R} primary rays", flush=True)

    hits = intersect_bvh8(bvh.bvh8, rays)
    jax.block_until_ready(hits.t)
    hr = float(jnp.mean((hits.prim >= 0).astype(jnp.float32)))
    print(f"primary hit_rate={hr:.3f}", flush=True)

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
    jax.block_until_ready(drays.o)

    def timed(name, fn, n=4):
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:.1f} ms  {R/dt/1e6:.2f} MRays/s", flush=True)
        return out

    t0 = time.perf_counter()
    dh = intersect_bvh8(bvh.bvh8, drays)
    jax.block_until_ready(dh.t)
    print(f"diffuse lockstep compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    print(f"diffuse hit_rate={float(jnp.mean((dh.prim >= 0).astype(jnp.float32))):.3f}",
          flush=True)
    timed("diffuse lockstep (wide.py)", lambda: intersect_bvh8(bvh.bvh8, drays))

    # shadow: any-hit toward the bench's point light
    light = jnp.asarray((center + np.array([0, 2.0, 0]) * extent)
                        .astype(np.float32))
    ht = jnp.where(jnp.isfinite(hits.t) & (hits.t < 1e29), hits.t, 1.0)
    p = rays.o + ht[:, None] * rays.d
    sd = light[None, :] - p
    dist = jnp.linalg.norm(sd, axis=1, keepdims=True)
    sdn = sd / jnp.maximum(dist, 1e-20)
    srays = Rays(o=p + sdn * 1e-3, d=sdn, rd=safe_rcp(sdn),
                 mask=jnp.full(R, RAY_MASK_ALL, jnp.int32))
    tmax = (dist[:, 0] * (1 - 1e-3))
    jax.block_until_ready(srays.o)
    t0 = time.perf_counter()
    occ = is_occluded_bvh8(bvh.bvh8, srays, tmax)
    jax.block_until_ready(occ)
    print(f"shadow lockstep compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    timed("shadow lockstep (wide.py)",
          lambda: is_occluded_bvh8(bvh.bvh8, srays, tmax))


if __name__ == "__main__":
    main()
