"""Terminal ASCII renderer — counterpart of tiny_bvh_renderer.cpp: shade a
scene with simple N·L and print it as characters.

Run: python examples/renderer.py [scene.bin|scene.obj]  (default: bunny)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import tinybvh_tpu as tb
from tinybvh_tpu.core.intersect import tri_edges
from tinybvh_tpu.io.loaders import load_bin
from tinybvh_tpu.render.camera import auto_camera, primary_rays


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/testdata/bunny.bin"
    if path.endswith(".obj"):
        from tinybvh_tpu.scene.mesh import load_obj

        tris = load_obj(path).tris
    else:
        tris = load_bin(path)
    bvh = tb.BVH(tris)
    lo, hi = bvh.aabb
    eye, fwd, right, up = auto_camera(lo, hi)
    W, H = 96, 40
    rays = primary_rays(eye, fwd, right, up, W, H)
    hits = bvh.intersect(rays)
    import jax.numpy as jnp

    prim = jnp.maximum(hits.prim, 0)
    v0, e1, e2 = tri_edges(jnp.asarray(tris)[prim])
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    light = jnp.asarray(np.array([0.5, 0.7, 0.5]) / np.linalg.norm([0.5, 0.7, 0.5]))
    shade = jnp.abs(n @ light)
    img = np.where(np.asarray(hits.prim) >= 0, np.asarray(shade), 0.0)
    img = img.reshape(H, W)
    chars = " .:-=+*#%@"
    for row in img[::-1]:
        print("".join(chars[int(v * 9.99)] for v in row))


if __name__ == "__main__":
    main()
