"""A/B sweep of packet2 kernel knobs on the bench's bunny primary phase.

Sweeps the two fixed-cost amortizers of the fused MT kernel —
tri_blk (MT super-block rows: fewer, bigger blocks = fewer drain/issue/
gate/epilogue iterations) and tiles_per_step (tiles walked per grid
step: amortizes the ~6 us fixed Pallas step cost) — plus the primary
budget pair, under the exact bench measurement protocol (amortized
8-dispatch windows, best of 3). All configurations assert overflow == 0
so every number is an exact trace.

    python benchmarks/primary_ab.py
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
from tinybvh_tpu.traverse.packet2 import intersect_packets2


def main():
    bunny, _ = _load_bunny()
    bvh = BVH(bunny)
    aux = bvh.packet_aux
    jax.block_until_ready(aux.gtab_pad)
    lo, hi = bvh.aabb
    o, d, _, _ = _camera_rays(np.asarray(lo), np.asarray(hi))
    rays = make_rays(o, d)
    R = d.shape[0]
    far = jnp.asarray(1e30, jnp.float32)
    jax.block_until_ready(far)

    def barrier(out):
        np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])

    def run(ml, mb, tb, tps, label):
        def f():
            return intersect_packets2(
                bvh.bvh8, aux, rays, max_leaves=ml, t_max=far,
                max_blocks=mb, retrace=False, tri_blk=tb,
                tiles_per_step=tps)
        t0 = time.time()
        hits, ovf = f()
        jax.block_until_ready(hits.t)
        novf = int(jnp.sum(ovf))
        warm = time.time() - t0
        best = 1e30
        for _ in range(3):
            barrier(f())
            t0 = time.perf_counter()
            outs = [f() for _ in range(8)]
            barrier(outs[-1])
            best = min(best, (time.perf_counter() - t0) / 8)
            time.sleep(1.5)
        print(f"{label}: {best*1e3:6.2f} ms = {R/best/1e6:6.2f} MRays/s  "
              f"(overflow={novf}, warm={warm:.0f}s)", flush=True)

    run(512, 64, 256, 8, "ml=512 mb=64  tb=256 tps=8  (bench)")
    run(512, 64, 512, 8, "ml=512 mb=64  tb=512 tps=8         ")
    run(512, 64, 256, 16, "ml=512 mb=64  tb=256 tps=16        ")
    run(512, 64, 512, 16, "ml=512 mb=64  tb=512 tps=16        ")
    run(512, 32, 256, 8, "ml=512 mb=32  tb=256 tps=8         ")
    run(512, 64, 128, 8, "ml=512 mb=64  tb=128 tps=8         ")


if __name__ == "__main__":
    main()
