"""Foliage rendering with opacity micromaps — counterpart of
tiny_bvh_foliage.cpp (:197-212): leaves are alpha-cutout quads, so the BVH
stores simple quads while the micromap bits (baked from the alpha texture
over each triangle's UVs, ≙ tiny_scene.h:1682-1750) punch the holes at
traversal time. Shadows from a point light go through the transparent
cells; opaque cells occlude.

Renders a small "bush" of randomly-oriented alpha-leaf quads over a floor,
lit by a point light, to a PPM. Run: python examples/foliage.py [out.ppm]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.layouts.mbvh import collapse_bvh2
from tinybvh_tpu.ops.omap import bake_omap_texture, leaf_align
from tinybvh_tpu.render.camera import look_at, primary_rays
from tinybvh_tpu.traverse.wavefront import (
    intersect_wavefront, is_occluded_wavefront,
)


def leaf_texture(n=32):
    """Procedural leaf alpha: an ellipse with a notch."""
    y, x = np.mgrid[0:n, 0:n] / (n - 1) - 0.5
    a = (x * x / 0.22 + y * y / 0.12) < 1.0
    a &= ~((np.abs(y) < 0.02) & (x > 0.1))   # midrib notch
    return a.astype(np.float32)


def build_bush(rng, n_leaves=60):
    """Random leaf quads in a sphere + a floor; returns tris, uvs, omap S."""
    tris, uvs = [], []
    for _ in range(n_leaves):
        c = rng.normal(size=3) * np.array([1.0, 0.6, 1.0])
        c[1] = abs(c[1]) + 0.8
        u = rng.normal(size=3)
        u /= np.linalg.norm(u)
        v = np.cross(u, rng.normal(size=3))
        v /= np.linalg.norm(v)
        s = 0.7
        p00, p10, p01, p11 = (c - u * s - v * s, c + u * s - v * s,
                              c - u * s + v * s, c + u * s + v * s)
        tris.append([p00, p10, p01])
        tris.append([p11, p01, p10])
        uvs.append([[0, 0], [1, 0], [0, 1]])
        uvs.append([[1, 1], [0, 1], [1, 0]])
    floor = [[[-6, 0, -6], [6, 0, -6], [-6, 0, 6]],
             [[6, 0, 6], [-6, 0, 6], [6, 0, -6]]]
    tris.extend(floor)
    uvs.extend([[[0, 0], [1, 0], [0, 1]], [[1, 1], [0, 1], [1, 0]]])
    return (np.asarray(tris, np.float32), np.asarray(uvs, np.float32))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/foliage.ppm"
    rng = np.random.default_rng(7)
    tris, uvs = build_bush(rng)
    n = tris.shape[0]
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)

    # bake omaps: leaves get the alpha texture, the floor is opaque
    om = np.asarray(bake_omap_texture(uvs[:-2], leaf_texture(), S=8))
    om = np.concatenate([om, np.ones((2, 8, 8), bool)])
    om_leaf = leaf_align(jnp.asarray(om), bvh8)

    W = H = 256
    eye, fwd, right, up = look_at(np.array([4.5, 3.0, 4.5]),
                                  np.array([0.0, 1.0, 0.0]))
    rays = primary_rays(eye, fwd, right, up, W, H)
    hits, _ = intersect_wavefront(bvh8, rays, omap=om_leaf)
    hit = np.asarray(hits.prim) >= 0
    p = np.asarray(rays.o) + np.asarray(hits.t)[:, None] * np.asarray(rays.d)

    light = np.array([3.0, 6.0, 1.0], np.float32)
    seg = light[None, :] - p
    occ = np.asarray(is_occluded_wavefront(
        bvh8, make_rays((p + seg * 1e-3).astype(np.float32),
                        seg.astype(np.float32)), 1.0 - 1e-3, omap=om_leaf))

    prim = np.maximum(np.asarray(hits.prim), 0)
    green = prim < n - 2
    base = np.where(green[:, None], np.array([[0.15, 0.45, 0.12]]),
                    np.array([[0.4, 0.35, 0.3]]))
    shade = np.where(occ, 0.25, 1.0)[:, None]
    img = (base * shade).reshape(H, W, 3)
    img[~hit.reshape(H, W)] = [0.5, 0.65, 0.9]
    img = np.clip(img, 0, 1) ** (1 / 2.2)
    with open(out, "wb") as f:
        f.write(f"P6 {W} {H} 255\n".encode())
        f.write((img * 255).astype(np.uint8).tobytes())
    frac = float(occ[hit & ~green].mean()) if (hit & ~green).any() else 0.0
    print(f"wrote {out}; floor-in-shadow fraction {frac:.2f} "
          "(perforated by leaf alpha)")


if __name__ == "__main__":
    main()
