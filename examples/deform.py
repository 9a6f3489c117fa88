"""Deforming-mesh demo — the per-frame rigid-update path.

Counterpart of the reference's animated rigid meshes (Scene::Node
geomChanged -> BLAS refit, tiny_scene.h:1996-2119 with MBVH<8>::Refit,
tiny_bvh.h:4925-4961): build once, then every frame deform the
vertices, refit the 8-wide layout DIRECTLY on device (topology kept,
one jitted dispatch) and rebuild the packet tables, then re-trace.
On the bench TPU the whole update measures ~13 ms on the 69k-tri bunny
(bench.py `refit_frame_s`); this demo runs anywhere (CPU included).

Run: python examples/deform.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.builders.refit import bvh8_refit_plan, refit_bvh8
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.io.loaders import sphere_tris
from tinybvh_tpu.layouts.mbvh import collapse_bvh2
from tinybvh_tpu.traverse.wide import intersect_bvh8


def main():
    import jax
    import jax.numpy as jnp

    tris = sphere_tris(24, 48)
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    plan = bvh8_refit_plan(np.asarray(bvh8.child))  # once per topology

    W = 64
    xs = (np.arange(W) + 0.5) / W * 2 - 1
    gx, gy = np.meshgrid(xs, xs)
    o = np.stack([gx * 2.2, gy * 2.2, np.full_like(gx, -5.0)],
                 -1).reshape(-1, 3).astype(np.float32)
    rays = make_rays(o, np.tile(np.array([[0, 0, 1]], np.float32),
                                (W * W, 1)))

    @jax.jit
    def deform(tris, t):
        # breathing sphere: radial sin ripple
        c = jnp.mean(tris, axis=(0, 1))
        r = tris - c
        bump = 1.0 + 0.25 * jnp.sin(4.0 * r[..., 1:2] * 3.14159 + t)
        return c + r * bump

    tris_dev = jnp.asarray(tris)
    for frame in range(4):
        t0 = time.perf_counter()
        moved = deform(tris_dev, jnp.float32(frame * 0.7))
        b8 = refit_bvh8(bvh8, moved, plan)     # topology unchanged
        hits = intersect_bvh8(b8, rays)
        jax.block_until_ready(hits.t)
        dt = time.perf_counter() - t0
        img = (np.asarray(hits.prim) >= 0).reshape(W, W)
        rowset = ["".join("#" if v else "." for v in row[::4])
                  for row in img[:: W // 12]]
        print(f"frame {frame}: update+trace {dt * 1e3:6.1f} ms  "
              f"hit_rate {img.mean():.3f}")
        if frame == 3:
            print("\n".join(rowset))


if __name__ == "__main__":
    main()
