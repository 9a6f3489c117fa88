"""Whitted-style renderer — counterpart of the reference's full renderer
(tmpl8/gltfdemo.cpp + raytracer.cl): deterministic primary rays, direct
lighting from a point light with hard shadows, perfect-mirror reflections
(fixed recursion depth as a jit loop), sky on miss. No Monte Carlo — one
ray tree per pixel, like classic Whitted 1980.

Run: python examples/whitted.py [scene.bin] [out.ppm]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import tinybvh_tpu as tb
from tinybvh_tpu.core.intersect import tri_edges
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.render.camera import auto_camera, primary_rays
from tinybvh_tpu.traverse.wavefront import (
    intersect_wavefront, is_occluded_wavefront,
)


def whitted(bvh8, tris, albedo, specular, light_pos, light_intensity,
            rays, depth=3, sky=(0.5, 0.7, 1.0)):
    """(R, 3) radiance for one ray tree per input ray."""
    R = rays.o.shape[0]
    tris = jnp.asarray(tris)
    albedo = jnp.asarray(albedo, jnp.float32)
    specular = jnp.asarray(specular, jnp.float32)
    light_pos = jnp.asarray(light_pos, jnp.float32)
    sky = jnp.asarray(sky, jnp.float32)

    color = jnp.zeros((R, 3), jnp.float32)
    atten = jnp.ones((R, 3), jnp.float32)   # product of mirror albedos
    alive = jnp.ones(R, bool)
    o, d = rays.o, rays.d

    for _ in range(depth):
        cur = make_rays(o, d)
        hits, _ = intersect_wavefront(bvh8, cur)
        hit_ok = alive & (hits.prim >= 0)
        color = color + jnp.where((alive & ~hit_ok)[:, None],
                                  atten * sky, 0.0)
        prim = jnp.maximum(hits.prim, 0)
        v0, e1, e2 = tri_edges(tris[prim])
        n = jnp.cross(e1, e2)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                            1e-20)
        n = jnp.where(jnp.sum(n * d, axis=-1, keepdims=True) > 0, -n, n)
        p = o + hits.t[:, None] * d

        # direct: point light + hard shadow (≙ raytracer.cl's shading)
        wl = light_pos[None, :] - p
        dist2 = jnp.maximum(jnp.sum(wl * wl, axis=-1), 1e-9)
        wi = wl / jnp.sqrt(dist2)[:, None]
        cos_s = jnp.maximum(jnp.sum(n * wi, axis=-1), 0.0)
        occ = is_occluded_wavefront(
            bvh8, make_rays(p + n * 1e-4, wl), 1.0 - 1e-3)
        li = light_intensity / dist2
        is_mirror = specular[prim] > 0.5
        diffuse = (albedo[prim] / jnp.pi
                   * (li * cos_s * (~occ))[:, None])
        color = color + jnp.where((hit_ok & ~is_mirror)[:, None],
                                  atten * diffuse, 0.0)

        # recurse into mirrors only
        alive = hit_ok & is_mirror
        atten = jnp.where(alive[:, None], atten * albedo[prim], atten)
        d = d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                            1e-20)
        o = p + n * 1e-4
    return color


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/testdata/bunny.bin"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/whitted.ppm"
    from tinybvh_tpu.io.loaders import load_bin

    tris = load_bin(path)
    n = tris.shape[0]
    # floor quad under the scene acts as a mirror
    lo = tris.reshape(-1, 3).min(0)
    hi = tris.reshape(-1, 3).max(0)
    c = (lo + hi) / 2
    s = float((hi - lo).max()) * 2
    floor = np.array([
        [[c[0]-s, lo[1], c[2]-s], [c[0]+s, lo[1], c[2]-s],
         [c[0]-s, lo[1], c[2]+s]],
        [[c[0]+s, lo[1], c[2]+s], [c[0]-s, lo[1], c[2]+s],
         [c[0]+s, lo[1], c[2]-s]],
    ], np.float32)
    world = np.concatenate([tris, floor])
    albedo = np.full((n + 2, 3), 0.7, np.float32)
    albedo[n:] = 0.9
    specular = np.zeros(n + 2, np.float32)
    specular[n:] = 1.0   # mirror floor

    bvh = tb.BVH(world)
    lo2, hi2 = bvh.aabb
    eye, fwd, right, up = auto_camera(np.asarray(lo2), np.asarray(hi2))
    W = H = 256
    rays = primary_rays(eye, fwd, right, up, W, H)
    light = c + np.array([0.0, 1.5, 0.5]) * s
    img = whitted(bvh.bvh8, world, albedo, specular, light,
                  light_intensity=float(s) ** 2 * 2.0, rays=rays)
    img = np.asarray(img).reshape(H, W, 3)
    img = np.clip(img, 0, 1) ** (1 / 2.2)
    with open(out, "wb") as f:
        f.write(f"P6 {W} {H} 255\n".encode())
        f.write((img * 255).astype(np.uint8).tobytes())
    print(f"wrote {out}; mean luma {img.mean():.3f}")


if __name__ == "__main__":
    main()
