"""Wavefront path tracer over an instanced TLAS scene.

Counterpart of the reference's TLAS wavefront tracer (tiny_bvh_gpu2.cpp +
wavefront2.cl): the same Generate → Extend → Shade → Connect loop as
render/pathtracer.py, but rays traverse a TLAS8 (two-level wavefront) and
shading data is per-instance:

  * inst_albedo / inst_emissive: (I, 3) per-instance colors (≙ the
    per-instance materials of wavefront2.cl's Instance struct);
  * lights: explicit world-space emissive triangles for NEE (lights must
    also exist as TLAS geometry to be directly visible);
  * normals: BLAS-space geometric normals from the winning leaf triangle,
    mapped to world space via the inverse-transpose of the instance
    transform.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tinybvh_tpu.core.intersect import tri_edges
from tinybvh_tpu.core.rays import Rays, make_rays
from tinybvh_tpu.core.rng import cosine_hemisphere
from tinybvh_tpu.core.vecmath import normalize, safe_rcp
from tinybvh_tpu.tlas.instance import TLAS8, intersect_tlas_wavefront


@partial(jax.jit, static_argnames=("bounces", "cap_factor"))
def trace_paths_tlas(tlas: TLAS8, inst_albedo, inst_emissive, light_tris,
                     light_emission, rays: Rays, key, bounces: int = 3,
                     cap_factor: int = 4, leaf_uvs=None, leaf_tex=None,
                     tex=None):
    """One sample per ray over an instanced scene → (R, 3) radiance.

    Optional texture mapping (≙ the textured materials of the reference's
    full GPU renderer, raytracer.cl): leaf_uvs (L, 4, 3, 2) and leaf_tex
    (L, 4) are merged leaf-aligned tables (tlas.merge_leaf_attrs over
    per-BLAS per-triangle UVs / texture ids); tex is a
    render.textures.build_atlas dict. The sampled color multiplies the
    instance albedo at the hit's interpolated UV."""
    R = rays.o.shape[0]
    n_lights = light_tris.shape[0]
    lv0, le1, le2 = tri_edges(light_tris)
    lnv = jnp.cross(le1, le2)
    larea = 0.5 * jnp.linalg.norm(lnv, axis=-1)
    lnv = normalize(lnv)

    radiance = jnp.zeros((R, 3), jnp.float32)
    throughput = jnp.ones((R, 3), jnp.float32)
    alive = jnp.ones(R, bool)
    o, d, rd = rays.o, rays.d, rays.rd
    count_emission = jnp.ones(R, bool)  # only on camera vertices

    for _b in range(bounces):
        key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
        cur = Rays(o=o, d=d, rd=rd, mask=rays.mask)
        hits, win, _ = intersect_tlas_wavefront(
            tlas, cur, cap_factor=cap_factor, return_winner=True)
        hit_ok = alive & (hits.prim >= 0)
        inst = jnp.maximum(hits.inst, 0)

        # world-space geometric normal of the winning triangle
        wl = jnp.where(win >= 0, win >> 2, 0)
        wk = jnp.where(win >= 0, win & 3, 0)
        tri = tlas.leaf_tris[wl, wk]  # BLAS space
        _, te1, te2 = tri_edges(tri)
        n_l = jnp.cross(te1, te2)
        inv = tlas.inst_inv[jnp.clip(inst, 0, tlas.inst_inv.shape[0] - 1)]
        n = normalize(jnp.einsum("rji,rj->ri", inv[:, :3, :3], n_l))
        n = jnp.where((jnp.sum(n * d, axis=-1) > 0)[:, None], -n, n)
        p = o + hits.t[:, None] * d

        emit = inst_emissive[inst]
        radiance = radiance + jnp.where(
            (hit_ok & count_emission)[:, None], throughput * emit, 0.0)

        mat_albedo = inst_albedo[inst]
        if leaf_uvs is not None:
            from tinybvh_tpu.render.textures import sample_atlas

            tuv = leaf_uvs[wl, wk]  # (R, 3, 2)
            w0 = (1.0 - hits.u - hits.v)[:, None]
            uv = (w0 * tuv[:, 0] + hits.u[:, None] * tuv[:, 1]
                  + hits.v[:, None] * tuv[:, 2])
            mat_albedo = mat_albedo * sample_atlas(tex, leaf_tex[wl, wk], uv)

        # --- NEE toward a sampled world-space light -----------------------
        li = jax.random.randint(k1, (R,), 0, n_lights)
        r1 = jax.random.uniform(k2, (R,))
        r2 = jax.random.uniform(k3, (R,))
        su = jnp.sqrt(r1)
        lp = lv0[li] + (1 - su)[:, None] * le1[li] + (r2 * su)[:, None] * le2[li]
        wi = lp - p
        dist2 = jnp.sum(wi * wi, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        wi = wi / dist[:, None]
        cos_s = jnp.sum(n * wi, axis=-1)
        cos_l = jnp.abs(jnp.sum(lnv[li] * -wi, axis=-1))
        nee_valid = hit_ok & (cos_s > 0)
        srays = make_rays(p + n * 1e-4, wi * dist[:, None])
        _, occ, _ = intersect_tlas_wavefront(
            tlas, srays, 1.0 - 1e-3, cap_factor=cap_factor, any_hit=True)
        pdf = dist2 / jnp.maximum(cos_l * larea[li] * n_lights, 1e-9)
        contrib = (throughput * mat_albedo / jnp.pi * light_emission[li]
                   * (cos_s / jnp.maximum(pdf, 1e-9))[:, None])
        radiance = radiance + jnp.where(
            (nee_valid & ~occ)[:, None], contrib, 0.0)

        # --- cosine-weighted bounce ---------------------------------------
        r3 = jax.random.uniform(k4, (R,))
        r4 = jax.random.uniform(k5, (R,))
        nd = cosine_hemisphere(n, r3, r4)
        throughput = throughput * mat_albedo
        alive = hit_ok & (jnp.max(throughput, axis=-1) > 1e-3)
        o = p + n * 1e-4
        d = normalize(nd)
        rd = safe_rcp(d)
        count_emission = jnp.zeros(R, bool)

    return radiance
