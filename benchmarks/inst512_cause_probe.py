"""Which stage of the bucketed TLAS engine loses the inst512 hits?

r5 attribution probe: 75/2048 rays fail the 1% gate, all on the bucketed
side (missing or farther hits, one phantom). Candidates: (a) the final
wavefront retrace replacing whole tiles with silently-wrong results,
(b) candidate-list truncation not flagged, (c) the per-round packet pass
itself. This probe re-traces with retrace=False, logs cand/need_wf per
bad tile, and re-traces the bad rays alone per-instance to find the
true-nearest instance's fate.
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
       130176, 131311, 131339, 131355, 131370, 131386]


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

    # no-retrace trace: if the bad rays are ALREADY wrong here, the packet
    # rounds lose them; if correct here, the retrace overwrote them
    h0, ovf0 = intersect_tlas_packets2_bucketed(
        tp, rays, t_max=far, rounds=28, max_leaves=1024, max_blocks=256,
        retrace=False, retrace_ml=rml, retrace_blocks=256)
    jax.block_until_ready(h0.t)
    print("no-retrace overflow tiles:", int(jnp.sum(ovf0)), flush=True)
    t0_np = np.asarray(h0.t)
    p0_np = np.asarray(h0.prim)
    ovf_np = np.asarray(ovf0)
    for b in BAD:
        tile = b // 256
        print(f"  ray {b} (tile {tile}, ovf={bool(ovf_np[tile])}): "
              f"no-retrace prim {p0_np[b]} t {t0_np[b]:.5f}")

    # per-instance truth for 3 bad rays: trace each bad ray against every
    # instance with the SINGLE-instance packet engine (exact w/ the same
    # MT) to find the nearest instance and its t
    from tinybvh_tpu.core.rays import Rays
    from tinybvh_tpu.core.vecmath import safe_rcp
    from tinybvh_tpu.core.intersect import brute_force_closest

    tris_dev = jnp.asarray(bunny)
    for b in BAD[:4]:
        oo = np.asarray(o[b], np.float64)
        dd = np.asarray(d[b], np.float64)
        best = (np.inf, -1)
        invs = np.asarray(tp.inst_inv, np.float64)
        for ii in range(512):
            o2 = invs[ii, :3, :3] @ oo + invs[ii, :3, 3]
            d2 = invs[ii, :3, :3] @ dd
            r1 = make_rays(np.asarray(o2, np.float32)[None],
                           np.asarray(d2, np.float32)[None])
            h = brute_force_closest(tris_dev, r1)
            t = float(h.t[0])
            if int(h.prim[0]) >= 0 and t < best[0]:
                best = (t, ii)
        print(f"  ray {b}: true nearest inst {best[1]} t {best[0]:.5f}",
              flush=True)


if __name__ == "__main__":
    main()
