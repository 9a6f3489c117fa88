"""Transfer + build-path probe for the tunnel TPU backend.

Measures (1) H2D device_put throughput vs size, (2) BVH() construction
wall time on bunny/grid4 after the D2H-readback fixes (api.py builds from
host copies and gathers packed/leaf tris on device), (3) one amortized
packet2 primary-ray timing on bunny with the sliced-barrier _amortized.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python benchmarks/tunnel_probe.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0], flush=True)

    # --- H2D throughput curve -------------------------------------------
    for mb in (1, 4, 16):
        a = np.random.rand(mb * 262144).astype(np.float32)
        t0 = time.perf_counter()
        d = jax.device_put(a)
        jax.block_until_ready(d)
        dt = time.perf_counter() - t0
        print(f"H2D {mb:3d}MB: {dt:7.2f}s  {mb / dt:8.2f} MB/s", flush=True)
        del d

    # --- D2H 1MB (for the record) ---------------------------------------
    d = jax.device_put(np.random.rand(262144).astype(np.float32))
    jax.block_until_ready(d)
    t0 = time.perf_counter()
    np.asarray(d)
    print(f"D2H   1MB: {time.perf_counter() - t0:7.2f}s", flush=True)

    # --- BVH() construction ---------------------------------------------
    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.io.loaders import load_bin

    bunny = load_bin("/root/reference/testdata/bunny.bin")
    ex = bunny.reshape(-1, 3).max(0) - bunny.reshape(-1, 3).min(0)
    grid4 = np.concatenate(
        [bunny + np.array([ex[0] * 1.1 * i, ex[1] * 1.1 * j, 0], np.float32)
         for i in range(2) for j in range(2)])

    for name, tris in (("bunny", bunny), ("grid4", grid4)):
        t0 = time.perf_counter()
        bvh = BVH(tris)
        jax.block_until_ready(bvh.bvh8.bounds)
        t1 = time.perf_counter()
        aux = bvh.packet_aux
        jax.block_until_ready(aux.gtab_pad)
        t2 = time.perf_counter()
        print(f"{name}: BVH() {t1 - t0:6.2f}s  packet_aux {t2 - t1:6.2f}s",
              flush=True)
        if name == "bunny":
            bvh_bunny, aux_bunny = bvh, aux

    # --- amortized bunny primary (sliced barrier) ------------------------
    import bench
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.traverse.packet2 import intersect_packets2

    lo, hi = bvh_bunny.aabb
    o, d_, _, _ = bench._camera_rays(np.asarray(lo), np.asarray(hi))
    rays = make_rays(o, d_)
    far_dev = jnp.asarray(1e30, jnp.float32)
    jax.block_until_ready(far_dev)

    def primary():
        return intersect_packets2(bvh_bunny.bvh8, aux_bunny, rays,
                                  max_leaves=512, t_max=far_dev,
                                  max_blocks=256, retrace=False)

    t0 = time.perf_counter()
    h, ovf = primary()
    jax.block_until_ready(h.t)
    print(f"primary compile+run: {time.perf_counter() - t0:.1f}s "
          f"ovf={int(np.asarray(ovf).sum())}", flush=True)

    # --- per-stage: cull alone (rest = MT + XLA glue) --------------------
    from tinybvh_tpu.traverse.packet2 import cull_tiles
    from tinybvh_tpu.traverse.packet import _tile_planes

    T = o.shape[0] // 256
    o_t = jnp.asarray(o).reshape(T, 256, 3)
    d_t = jnp.asarray(d_).reshape(T, 256, 3)
    olo = o_t.min(axis=1)
    ohi = o_t.max(axis=1)
    planes = _tile_planes(o_t[:, 0], d_t)
    posn = jnp.maximum(planes, 0.0)
    negn = jnp.minimum(planes, 0.0)
    thresh = (jnp.einsum("tpk,tk->tp", posn, olo)
              + jnp.einsum("tpk,tk->tp", negn, ohi))
    jax.block_until_ready((posn, negn, thresh, olo, ohi))

    def cull_only():
        return cull_tiles(aux_bunny, posn, negn, thresh, olo, ohi,
                          k_cap=512, max_blocks=256)

    t0 = time.perf_counter()
    keys, counts = cull_only()
    cnp = np.asarray(counts)
    print(f"cull compile: {time.perf_counter() - t0:.1f}s  "
          f"survivors mean={cnp.mean():.0f} p90={np.percentile(cnp, 90):.0f} "
          f"max={cnp.max()}", flush=True)
    dt = bench._amortized(cull_only)
    print(f"cull amortized: {dt * 1e3:.2f} ms", flush=True)

    dt = bench._amortized(primary)
    print(f"bunny primary amortized: {dt * 1e3:.2f} ms  "
          f"{o.shape[0] / dt / 1e6:.2f} MRays/s", flush=True)


if __name__ == "__main__":
    main()
