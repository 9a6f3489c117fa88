"""Animated TLAS demo — counterpart of tiny_bvh_anim.cpp: a grid of
instances over one BLAS, re-posed and re-traced every frame.

Run: python examples/anim.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import tinybvh_tpu as tb
from tinybvh_tpu.io.loaders import load_bin, sphere_tris
from tinybvh_tpu.render.camera import auto_camera, primary_rays


def rot_y(a):
    c, s = np.cos(a), np.sin(a)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    return m


def main():
    try:
        tris = load_bin("/root/reference/testdata/suzanne.bin")
    except OSError:
        tris = sphere_tris(16, 32)
    blas = tb.BVH(tris)
    lo, hi = blas.aabb
    ext = float((hi - lo).max())

    for frame in range(3):
        t = frame * 0.3
        mats = []
        for i in range(8):  # 2x2x2 grid, rotating
            m = rot_y(t + i)
            m[:3, 3] = [2.2 * ext * (i & 1), 2.2 * ext * ((i >> 1) & 1),
                        2.2 * ext * (i >> 2)]
            mats.append(m)
        t0 = time.perf_counter()
        tlas = tb.TLAS([blas], np.stack(mats))
        glo = lo + np.array([0, 0, 0])
        ghi = hi + np.array([2.2 * ext] * 3)
        eye, fwd, right, up = auto_camera(glo, ghi)
        rays = primary_rays(eye, fwd, right, up, 160, 100)
        hits = tlas.intersect(rays)
        hr = float(np.mean(np.asarray(hits.prim) >= 0))
        insts = len(np.unique(np.asarray(hits.inst)[np.asarray(hits.inst) >= 0]))
        print(f"frame {frame}: rebuild+trace {time.perf_counter()-t0:.2f}s, "
              f"hit rate {hr:.3f}, {insts} instances visible")


if __name__ == "__main__":
    main()
