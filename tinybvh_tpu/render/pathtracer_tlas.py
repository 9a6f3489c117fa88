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
                     tex=None, inst_specular=None, analytic=None,
                     tpacket=None):
    """One sample per ray over an instanced scene → ((R, 3) radiance,
    overflow flag). The flag ORs every traversal's frontier overflow —
    True means truncated paths; retry with a larger cap_factor.

    NEE + MIS weighting and mirror materials mirror render/pathtracer.py
    (≙ wavefront2.cl's Shade/Connect). inst_specular: optional (I,) floats,
    instances with specular > 0.5 shade as perfect mirrors.

    tpacket: optional tlas.packet.TLASPacket — routes every traversal
    through the per-instance packet2 engine (shared-origin primaries
    direct, bounces/shadow segments via the coherence sort), each with
    exact in-call wavefront retrace; requires R %% 256 == 0. The TLAS
    twin of trace_paths' aux routing (≙ wavefront2.cl tracing each
    instance's BLAS with the fast CWBVH kernel).

    Optional texture mapping (≙ the textured materials of the reference's
    full GPU renderer, raytracer.cl): leaf_uvs (L, 4, 3, 2) and leaf_tex
    (L, 4) are merged leaf-aligned tables (tlas.merge_leaf_attrs over
    per-BLAS per-triangle UVs / texture ids); tex is a
    render.textures.build_atlas dict. The sampled color multiplies the
    instance albedo at the hit's interpolated UV."""
    R = rays.o.shape[0]
    # textured shading needs the merged-leaf winner index (leaf_uvs rows),
    # which only the wavefront returns — packets route the untextured path
    use_packets = (tpacket is not None and R % 256 == 0
                   and leaf_uvs is None)
    if use_packets:
        from tinybvh_tpu.tlas.packet import (
            intersect_tlas_packets2, intersect_tlas_packets2_sorted,
            scene_bounds,
        )

        interp = jax.default_backend() != "tpu"
        slo, shi = scene_bounds(tpacket)

        def extend_p(cur, bounce):
            if bounce == 0:
                h, ov = intersect_tlas_packets2(tpacket, cur,
                                                interpret=interp)
                return h, jnp.any(ov)
            h, ov = intersect_tlas_packets2_sorted(
                tpacket, cur, slo, shi, interpret=interp)
            return h, ov.any()

        def occl_seg(oo, seg):
            h, ov = intersect_tlas_packets2_sorted(
                tpacket, make_rays(oo, seg), slo, shi, interpret=interp,
                any_hit=True, t_max_static=1.0 - 1e-3)
            return (h.prim >= 0) & (h.t < 1.0 - 1e-3), ov.any()
    n_lights = light_tris.shape[0]
    lv0, le1, le2 = tri_edges(light_tris)
    lnv = jnp.cross(le1, le2)
    larea = 0.5 * jnp.linalg.norm(lnv, axis=-1)
    lnv = normalize(lnv)

    radiance = jnp.zeros((R, 3), jnp.float32)
    throughput = jnp.ones((R, 3), jnp.float32)
    alive = jnp.ones(R, bool)
    o, d, rd = rays.o, rays.d, rays.rd
    last_spec = jnp.ones(R, bool)  # camera/mirror vertices: weight 1
    prev_pdf = jnp.ones(R, jnp.float32)
    any_overflow = jnp.zeros((), bool)

    for _b in range(bounces):
        key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
        cur = Rays(o=o, d=d, rd=rd, mask=rays.mask)
        if use_packets:
            hits, ovf = extend_p(cur, _b)
            inst = jnp.maximum(hits.inst, 0)
            tri = tpacket.prim_tris[
                tpacket.prim_off[inst] + jnp.maximum(hits.prim, 0)]
            wl = jnp.zeros(R, jnp.int32)  # leaf_uvs path needs win (below)
            wk = jnp.zeros(R, jnp.int32)
        else:
            hits, win, ovf = intersect_tlas_wavefront(
                tlas, cur, cap_factor=cap_factor, return_winner=True)
            inst = jnp.maximum(hits.inst, 0)
            wl = jnp.where(win >= 0, win >> 2, 0)
            wk = jnp.where(win >= 0, win & 3, 0)
            tri = tlas.leaf_tris[wl, wk]  # BLAS space
        any_overflow = any_overflow | ovf
        hit_ok = alive & (hits.prim >= 0)
        _, te1, te2 = tri_edges(tri)
        n_l = jnp.cross(te1, te2)
        inv = tlas.inst_inv[jnp.clip(inst, 0, tlas.inst_inv.shape[0] - 1)]
        # inv^T n in exact f32 (sum over j of inv[j,i]*n[j])
        n_w = (inv[:, :3, :3] * n_l[:, :, None]).sum(1)
        n = normalize(n_w)
        n = jnp.where((jnp.sum(n * d, axis=-1) > 0)[:, None], -n, n)
        p = o + hits.t[:, None] * d

        # --- direct emission with MIS weight ------------------------------
        # world-space area of the hit triangle from the inverse transform:
        # |cross(M e1, M e2)| = |inv3^T (e1 x e2)| / |det(inv3)|
        emit = inst_emissive[inst]
        is_emitter = jnp.sum(emit, axis=-1) > 0
        i3 = inv[:, :3, :3]
        det_inv = (
            i3[:, 0, 0] * (i3[:, 1, 1] * i3[:, 2, 2] - i3[:, 1, 2] * i3[:, 2, 1])
            - i3[:, 0, 1] * (i3[:, 1, 0] * i3[:, 2, 2] - i3[:, 1, 2] * i3[:, 2, 0])
            + i3[:, 0, 2] * (i3[:, 1, 0] * i3[:, 2, 1] - i3[:, 1, 1] * i3[:, 2, 0])
        )
        harea = 0.5 * jnp.linalg.norm(n_w, axis=-1) / jnp.maximum(
            jnp.abs(det_inv), 1e-12)
        cos_lh = jnp.abs(jnp.sum(n * d, axis=-1))
        pl_hit = hits.t * hits.t / jnp.maximum(
            cos_lh * harea * n_lights, 1e-9)
        w_emit = jnp.where(
            last_spec, 1.0, prev_pdf / jnp.maximum(prev_pdf + pl_hit, 1e-9))
        radiance = radiance + jnp.where(
            (hit_ok & is_emitter)[:, None],
            throughput * emit * w_emit[:, None], 0.0)

        mat_albedo = inst_albedo[inst]
        if leaf_uvs is not None:
            from tinybvh_tpu.render.textures import sample_atlas

            tuv = leaf_uvs[wl, wk]  # (R, 3, 2)
            w0 = (1.0 - hits.u - hits.v)[:, None]
            uv = (w0 * tuv[:, 0] + hits.u[:, None] * tuv[:, 1]
                  + hits.v[:, None] * tuv[:, 2])
            mat_albedo = mat_albedo * sample_atlas(tex, leaf_tex[wl, wk], uv)

        if inst_specular is not None:
            is_spec = hit_ok & (inst_specular[inst] > 0.5)
        else:
            is_spec = jnp.zeros(R, bool)

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
        nee_valid = hit_ok & ~is_spec & (cos_s > 0)
        if use_packets:
            occ, ovf_s = occl_seg(p + n * 1e-4, wi * dist[:, None])
        else:
            srays = make_rays(p + n * 1e-4, wi * dist[:, None])
            _, occ, ovf_s = intersect_tlas_wavefront(
                tlas, srays, 1.0 - 1e-3, cap_factor=cap_factor,
                any_hit=True)
        any_overflow = any_overflow | ovf_s
        pdf_l = dist2 / jnp.maximum(cos_l * larea[li] * n_lights, 1e-9)
        pdf_b = jnp.maximum(cos_s, 0.0) / jnp.pi
        w_nee = pdf_l / jnp.maximum(pdf_l + pdf_b, 1e-9)
        contrib = (throughput * mat_albedo / jnp.pi * light_emission[li]
                   * (cos_s * w_nee / jnp.maximum(pdf_l, 1e-9))[:, None])
        radiance = radiance + jnp.where(
            (nee_valid & ~occ)[:, None], contrib, 0.0)

        # --- analytic (point/spot/directional) delta lights ---------------
        if analytic is not None:
            from tinybvh_tpu.render.pathtracer import _analytic_nee

            if use_packets:
                occl_a = occl_seg
            else:
                def occl_a(oo, seg):
                    _, occ2, o3 = intersect_tlas_wavefront(
                        tlas, make_rays(oo, seg), 1.0 - 1e-3,
                        cap_factor=cap_factor, any_hit=True)
                    return occ2, o3

            a_add, a_ovf = _analytic_nee(
                occl_a, analytic, p, n, mat_albedo, throughput,
                hit_ok & ~is_spec)
            radiance = radiance + a_add
            any_overflow = any_overflow | a_ovf

        # --- bounce: cosine-weighted diffuse or mirror reflection ---------
        r3 = jax.random.uniform(k4, (R,))
        r4 = jax.random.uniform(k5, (R,))
        nd = normalize(cosine_hemisphere(n, r3, r4))
        refl = normalize(d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n)
        new_d = jnp.where(is_spec[:, None], refl, nd)
        throughput = throughput * mat_albedo
        alive = hit_ok & (jnp.max(throughput, axis=-1) > 1e-3)
        o = p + n * 1e-4
        d = new_d
        rd = safe_rcp(d)
        prev_pdf = jnp.maximum(jnp.sum(nd * n, axis=-1), 1e-6) / jnp.pi
        last_spec = is_spec

    return radiance, any_overflow
