"""Wavefront path tracer — the jitted counterpart of wavefront.cl.

The reference's GPU path tracer (wavefront.cl:1-287) runs persistent-thread
kernels (Generate → Extend → Shade → Connect → Finalize) coordinating
through global atomic counters. The TPU formulation keeps the same logical
stages but as one jit-compiled bounce loop over dense ray batches: "queues"
are alive-masks (ray compaction is a planned optimization), atomics are
gone, and the RNG is jax.random (threefry) instead of xor32.

Shading model (parity with wavefront.cl's Shade kernel):
  * Lambertian BRDF with per-triangle albedo
  * emissive triangles as lights
  * next-event estimation toward one sampled light triangle per bounce
    (solid-angle PDF as in wavefront.cl:200-240); emission is counted
    directly only on camera/first vertices so NEE never double-counts
  * cosine-weighted bounce sampling
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tinybvh_tpu.core.intersect import tri_edges
from tinybvh_tpu.core.rays import Rays, make_rays
from tinybvh_tpu.core.rng import cosine_hemisphere
from tinybvh_tpu.core.vecmath import BVH_FAR, normalize
from tinybvh_tpu.traverse.wavefront import (
    intersect_wavefront, is_occluded_wavefront,
)


def make_scene_arrays(tris, albedo=None, emissive=None, uvs=None,
                      tex_id=None, textures=None, sky=None):
    """Build shading arrays: per-triangle albedo (N, 3) and emission (N, 3).

    Light triangles = any with emission > 0 (≙ tiny_scene's TriLight
    extraction, tiny_scene.h:2145-2203). Optional texture mapping
    (≙ raytracer.cl's material shading): `uvs` (N, 3, 2) per-vertex UVs,
    `tex_id` (N,) int texture index per triangle (-1 = untextured),
    `textures` a list of (H, W, 3) images packed into one atlas. Optional
    `sky` (H, W, 3) equirect environment sampled on ray miss (≙ SkyDome).
    """
    n = tris.shape[0]
    if albedo is None:
        albedo = jnp.full((n, 3), 0.7, jnp.float32)
    else:
        albedo = jnp.asarray(albedo, jnp.float32)
    if emissive is None:
        emissive = jnp.zeros((n, 3), jnp.float32)
    else:
        emissive = jnp.asarray(emissive, jnp.float32)
    is_light = np.asarray(emissive).sum(axis=1) > 0
    light_ids = np.nonzero(is_light)[0].astype(np.int32)
    if light_ids.size == 0:
        light_ids = np.array([0], np.int32)  # dummy; emission 0 → no effect
    scene = dict(
        tris=jnp.asarray(tris, jnp.float32),
        albedo=albedo,
        emissive=emissive,
        light_ids=jnp.asarray(light_ids),
    )
    if textures is not None:
        from tinybvh_tpu.render.textures import build_atlas

        assert uvs is not None and tex_id is not None, (
            "textured scenes need per-triangle uvs and tex_id")
        scene["tex"] = build_atlas(textures)
        scene["uvs"] = jnp.asarray(uvs, jnp.float32)
        scene["tex_id"] = jnp.asarray(tex_id, jnp.int32)
    if sky is not None:
        scene["sky"] = jnp.asarray(sky, jnp.float32)
    return scene


def add_vertex_normals(scene, normals):
    """Attach (N, 3, 3) per-vertex shading normals (≙ FatTri's vN0-2,
    tiny_scene.h:319-348): hits then use the barycentric interpolation
    instead of the flat geometric normal."""
    scene["normals"] = jnp.asarray(normals, jnp.float32)
    return scene


def _tri_geom(tris, prim):
    t = tris[jnp.maximum(prim, 0)]
    v0, e1, e2 = tri_edges(t)
    n = jnp.cross(e1, e2)
    area = 0.5 * jnp.linalg.norm(n, axis=-1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return v0, e1, e2, n, area


@partial(jax.jit, static_argnames=("bounces",))
def trace_paths(bvh8, scene, rays: Rays, key, bounces: int = 3):
    """Trace one sample per ray through `bounces` bounces; returns (R, 3)
    radiance. Fully jitted; call repeatedly with fresh keys to accumulate."""
    R = rays.o.shape[0]
    tris = scene["tris"]
    albedo = scene["albedo"]
    emissive = scene["emissive"]
    light_ids = scene["light_ids"]
    n_lights = light_ids.shape[0]

    radiance = jnp.zeros((R, 3), jnp.float32)
    throughput = jnp.ones((R, 3), jnp.float32)
    alive = jnp.ones(R, bool)
    o, d = rays.o, rays.d
    rd = rays.rd
    last_spec = jnp.ones(R, bool)  # first hit: count emission fully

    for bounce in range(bounces):
        key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
        cur = Rays(o=o, d=d, rd=rd, mask=rays.mask)
        hits, _ = intersect_wavefront(bvh8, cur)
        hit_ok = alive & (hits.prim >= 0)

        # environment on miss (≙ raytracer.cl skydome lookup)
        if "sky" in scene:
            from tinybvh_tpu.render.textures import sample_sky

            env = sample_sky(scene["sky"], d)
            radiance = radiance + jnp.where(
                (alive & ~(hits.prim >= 0))[:, None], throughput * env, 0.0
            )

        prim = jnp.maximum(hits.prim, 0)
        v0, e1, e2, n, _ = _tri_geom(tris, prim)
        if "normals" in scene:
            # smooth shading: barycentric-interpolated vertex normals
            vn = scene["normals"][prim]  # (R, 3, 3)
            w0 = (1.0 - hits.u - hits.v)[:, None]
            n = normalize(w0 * vn[:, 0] + hits.u[:, None] * vn[:, 1]
                          + hits.v[:, None] * vn[:, 2])
        # face-forward normal
        n = jnp.where(
            (jnp.sum(n * d, axis=-1) > 0)[:, None], -n, n
        )
        p = o + hits.t[:, None] * d

        # direct emission (MIS-weighted: only on first/specular vertices to
        # avoid double counting with NEE — wavefront.cl:186-199)
        emit = emissive[prim]
        radiance = radiance + jnp.where(
            (hit_ok & last_spec)[:, None], throughput * emit, 0.0
        )

        mat_albedo = albedo[prim]
        if "tex" in scene:
            from tinybvh_tpu.render.textures import sample_atlas

            tuv = scene["uvs"][prim]  # (R, 3, 2)
            w0 = (1.0 - hits.u - hits.v)[:, None]
            uv = (w0 * tuv[:, 0] + hits.u[:, None] * tuv[:, 1]
                  + hits.v[:, None] * tuv[:, 2])
            mat_albedo = mat_albedo * sample_atlas(
                scene["tex"], scene["tex_id"][prim], uv)

        # --- next-event estimation (Connect, wavefront.cl:200-240) -------
        li = light_ids[jax.random.randint(k1, (R,), 0, n_lights)]
        lv0, le1, le2, ln, larea = _tri_geom(tris, li)
        r1 = jax.random.uniform(k2, (R,))
        r2 = jax.random.uniform(k3, (R,))
        su = jnp.sqrt(r1)
        # uniform triangle sample: barycentrics (1-√r1, r2·√r1)
        lp = lv0 + (1 - su)[:, None] * le1 + (r2 * su)[:, None] * le2
        wi = lp - p
        dist2 = jnp.sum(wi * wi, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        wi = wi / dist[:, None]
        cos_s = jnp.sum(n * wi, axis=-1)
        cos_l = jnp.sum(ln * -wi, axis=-1)
        cos_l = jnp.abs(cos_l)
        l_emit = emissive[li]
        nee_valid = hit_ok & (cos_s > 0) & (
            jnp.sum(l_emit, axis=-1) > 0
        )
        srays = make_rays(p + n * 1e-4, wi * dist[:, None])
        occluded = is_occluded_wavefront(bvh8, srays, 1.0 - 1e-3)
        # pdf of sampling that point on that light (area measure → solid angle)
        pdf = dist2 / jnp.maximum(cos_l * larea * n_lights, 1e-9)
        contrib = (
            throughput
            * mat_albedo / jnp.pi
            * l_emit
            * (cos_s / jnp.maximum(pdf, 1e-9))[:, None]
        )
        radiance = radiance + jnp.where(
            (nee_valid & ~occluded)[:, None], contrib, 0.0
        )

        # --- bounce (cosine-weighted) ------------------------------------
        r3 = jax.random.uniform(k4, (R,))
        r4 = jax.random.uniform(k5, (R,))
        nd = cosine_hemisphere(n, r3, r4)
        # cosine-weighted pdf cancels cos/π: throughput *= albedo
        throughput = throughput * mat_albedo
        alive = hit_ok & (jnp.max(throughput, axis=-1) > 1e-3)
        o = p + n * 1e-4
        d = normalize(nd)
        from tinybvh_tpu.core.vecmath import safe_rcp

        rd = safe_rcp(d)
        last_spec = jnp.zeros(R, bool)  # NEE now handles direct light

    return radiance


def render(bvh8, scene, eye, fwd, right, up, width, height, spp=4,
           bounces=3, seed=0):
    """Accumulate spp samples; returns (H, W, 3) float image."""
    from tinybvh_tpu.render.camera import primary_rays

    key = jax.random.PRNGKey(seed)
    acc = jnp.zeros((width * height, 3), jnp.float32)
    for s in range(spp):
        key, kj, kt = jax.random.split(key, 3)
        jit_ = jax.random.uniform(kj, (height, width, 2))
        rays = primary_rays(eye, fwd, right, up, width, height, jitter=jit_)
        acc = acc + trace_paths(bvh8, scene, rays, kt, bounces=bounces)
    img = (acc / spp).reshape(height, width, 3)
    return img
