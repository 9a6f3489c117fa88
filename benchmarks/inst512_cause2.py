"""inst512 loss localization, part 2.

Part 1 showed: candidate overflow = 0 at rounds=28 (the wavefront never
fires); the per-round LEAF-budget overflow (739 tiles at ml=1024) is
resolved by the in-round "packet" escalation — and the result STILL
misses hits. Either the escalation pass loses them, or the round
structure (per-ray t_best carry) does. Decide by tracing with a budget
covering the whole BLAS (no overflow, no escalation at all).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinybvh_tpu.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from bench import _camera_rays, _load_bunny
from tinybvh_tpu.api import BVH
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.tlas.packet import (
    build_tlas_packet, intersect_tlas_packets2_bucketed)

BAD = [130059, 130074, 130090, 130105, 130119, 130120, 130135, 130148,
       131311, 131339, 131355, 131370, 131386]
TRUE_T = {130059: 157.64810, 130074: 157.32053, 130090: 157.76155,
          130105: 157.57443, 130119: 157.04421, 130120: 157.57051,
          130135: 157.77347, 130148: 157.26257, 131311: 142.46458,
          131339: 139.57694, 131355: 139.33535, 131370: 139.45596,
          131386: 139.31527}


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
    full_ml = 4 * (-(-n_segs // 8) * 8)
    wlo = np.asarray(bunny.reshape(-1, 3).min(0))
    whi = wlo + np.asarray(ex) * np.array([1.15 * 7 + 1] * 3)
    o, d, _, _ = _camera_rays(wlo, whi, W=512, H=512)
    rays = make_rays(o, d)
    far = jnp.asarray(1e30, jnp.float32)

    def report(tag, h, ovf):
        jax.block_until_ready(h.t)
        t_np = np.asarray(h.t)
        p_np = np.asarray(h.prim)
        ok = sum(1 for b in BAD
                 if p_np[b] >= 0 and abs(t_np[b] - TRUE_T[b])
                 <= 0.005 * TRUE_T[b])
        print(f"{tag}: ovf tiles {int(jnp.sum(ovf))}  bad-rays recovered "
              f"{ok}/{len(BAD)}", flush=True)
        for b in BAD[:3]:
            print(f"    ray {b}: prim {p_np[b]} t {t_np[b]:.5f} "
                  f"(true {TRUE_T[b]:.5f})")

    # A: full budget, no escalation possible
    h, ovf = intersect_tlas_packets2_bucketed(
        tp, rays, t_max=far, rounds=28, max_leaves=full_ml,
        max_blocks=256, retrace=False)
    report("A full-ml      rounds=28", h, ovf)

    # B: bench config (escalation active) for reference
    h, ovf = intersect_tlas_packets2_bucketed(
        tp, rays, t_max=far, rounds=28, max_leaves=1024, max_blocks=256,
        retrace="packet", retrace_ml=full_ml, retrace_blocks=256)
    report("B bench cfg    rounds=28", h, ovf)

    # C: full budget with more rounds (is 28 the binding constraint?)
    h, ovf = intersect_tlas_packets2_bucketed(
        tp, rays, t_max=far, rounds=48, max_leaves=full_ml,
        max_blocks=256, retrace=False)
    report("C full-ml      rounds=48", h, ovf)


if __name__ == "__main__":
    main()
