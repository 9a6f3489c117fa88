"""Minimal smoke demo — counterpart of tiny_bvh_minimal.cpp: build a BVH
over a procedural triangle soup and fire one ray.

Run: python examples/minimal.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import tinybvh_tpu as tb
from tinybvh_tpu.io.loaders import random_tris


def main():
    tris = random_tris(8192, seed=42)
    bvh = tb.BVH(tris)
    print(f"built BVH over {tris.shape[0]} tris: "
          f"{bvh.node_count()} nodes, SAH {bvh.sah_cost():.2f}")
    hit = bvh.intersect_one([5.0, 5.0, -5.0], [0.0, 0.0, 1.0])
    print(f"ray (5,5,-5)→+z: t={hit['t']:.4f} prim={hit['prim']} "
          f"u={hit['u']:.3f} v={hit['v']:.3f}")


if __name__ == "__main__":
    main()
