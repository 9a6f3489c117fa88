"""TPU smoke test for the compiled Mosaic kernels (<5 min standalone).

All pytest coverage of the Pallas kernels runs `interpret=True` on CPU;
only the full bench exercises real Mosaic lowering. This script is the
small, fast canary in between: ONE compiled packet2 trace (cull + fused
MT) of 64 tiles against a small scene, asserted against the brute-force
oracle — so a kernel-lowering regression is distinguishable from a
bench-budget timeout.  ≙ the role of tiny_bvh_minimal as the reference's
only registered ctest (CMakeLists.txt:150).

Run on the TPU machine (axon is the default backend):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_smoke.py
Prints `SMOKE PASS ...` and exits 0, or raises.
"""

import sys
import time

import numpy as np


def main():
    t_start = time.time()
    import jax

    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.core.intersect import brute_force_closest
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.io.loaders import sphere_tris
    from tinybvh_tpu.traverse.packet2 import intersect_packets2

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    tris = sphere_tris(12, 24)  # 552 tris
    bvh = BVH(tris)

    # 64 tiles of 16x16 camera rays = 16,384 rays
    W = 128
    xs = ((np.arange(W) + 0.5) / W * 2 - 1).astype(np.float32)
    gx, gy = np.meshgrid(xs, xs)
    o = np.stack([gx * 1.4, gy * 1.4, np.full_like(gx, -4.0)], -1)
    d = np.tile(np.array([[0, 0, 1]], np.float32), (W * W, 1))
    o = (o.reshape(W // 16, 16, W // 16, 16, 3).transpose(0, 2, 1, 3, 4)
         .reshape(-1, 3))
    rays = make_rays(o, d)

    t0 = time.time()
    hits, ovf = intersect_packets2(bvh.bvh8, bvh.packet_aux, rays,
                                   max_leaves=256)
    jax.block_until_ready(hits.t)
    compile_s = time.time() - t0
    print(f"packet2 compile+run: {compile_s:.1f}s", flush=True)

    ref = brute_force_closest(rays, tris)
    t_ref = np.asarray(ref.t)
    t_got = np.asarray(hits.t)
    hit_ref = np.asarray(ref.prim) >= 0
    hit_got = np.asarray(hits.prim) >= 0
    n_ovf = int(np.asarray(ovf).sum())

    mism = int(np.sum(hit_ref != hit_got))
    assert mism <= 2, f"hit-mask mismatches: {mism}"
    both = hit_ref & hit_got
    if both.any():
        err = np.max(np.abs(t_ref[both] - t_got[both])
                     / np.maximum(t_ref[both], 1e-6))
        assert err < 1e-3, f"t rel err {err}"
    hr = float(hit_got.mean())
    assert 0.2 < hr < 0.8, f"implausible hit rate {hr}"
    print(f"SMOKE PASS hit_rate={hr:.3f} overflow_tiles={n_ovf} "
          f"total={time.time() - t_start:.0f}s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
