"""Minimal bench-protocol bunny-primary measurement (ONE compile).

Same measurement protocol as bench.py's bunny primary phase (amortized
over 8 queued dispatches with a 1-element sliced readback barrier) so
kernel changes can be A/B'd on the real TPU quickly. Kernel parameters
(max_leaves / max_blocks / retrace) are set below and may deliberately
explore configurations ahead of bench.py's — check both before
comparing numbers across scripts.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/primary_quick.py
"""

import time

import numpy as np


def main():
    from tinybvh_tpu.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.io.loaders import load_bin
    from tinybvh_tpu.traverse.packet2 import intersect_packets2

    tris = load_bin("/root/reference/testdata/bunny.bin")
    bvh = BVH(tris)
    aux = bvh.packet_aux
    jax.block_until_ready(aux.gtab_pad)

    lo, hi = bvh.aabb
    lo, hi = np.asarray(lo), np.asarray(hi)
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
    gx, gy = np.meshgrid(xs, xs)
    d = (fwd[None, None] + 0.9 * gx[..., None] * right[None, None]
         + 0.9 * gy[..., None] * up[None, None])
    d /= np.linalg.norm(d, axis=2, keepdims=True)
    d = d.reshape(H // 16, 16, W // 16, 16, 3).transpose(0, 2, 1, 3, 4)
    d = d.reshape(-1, 3).astype(np.float32)
    o = np.broadcast_to(eye.astype(np.float32), d.shape)
    rays = make_rays(o, d)
    R = d.shape[0]
    far_dev = jnp.asarray(1e30, jnp.float32)
    jax.block_until_ready(far_dev)

    def primary():
        # segment-granularity budgets: 768 leaves = 192 segment keys
        # (bunny camera max 160), worklist depth 32 (max 27 seg-blocks)
        return intersect_packets2(bvh.bvh8, aux, rays, max_leaves=768,
                                  t_max=far_dev, max_blocks=32,
                                  retrace=False)

    t0 = time.time()
    hits, ovf = primary()
    jax.block_until_ready(hits.t)
    print(f"compile+run {time.time() - t0:.0f}s  "
          f"hit_rate {float(jnp.mean((hits.prim >= 0).astype(jnp.float32))):.4f}  "
          f"overflow_tiles {int(jnp.sum(ovf))}", flush=True)

    def barrier(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.ravel(leaf)[:1])

    barrier(primary())
    t0 = time.perf_counter()
    outs = [primary() for _ in range(8)]
    barrier(outs[-1])
    dt = (time.perf_counter() - t0) / 8
    print(f"primary device: {dt*1e3:.2f} ms/call = {R/dt/1e6:.2f} MRays/s",
          flush=True)


if __name__ == "__main__":
    main()
