"""Wavefront path tracer — the jitted counterpart of wavefront.cl.

The reference's GPU path tracer (wavefront.cl:1-287) runs persistent-thread
kernels (Generate → Extend → Shade → Connect → Finalize) coordinating
through global atomic counters. The TPU formulation keeps the same logical
stages but as one jit-compiled bounce loop over dense ray batches: "queues"
are alive-masks (ray compaction is a planned optimization), atomics are
gone, and the RNG is jax.random (threefry) instead of xor32.

Shading model (parity with wavefront.cl's Shade kernel):
  * Lambertian BRDF with per-triangle albedo + perfect-mirror specular
    materials (~ MATERIAL_SPECULAR handling, wavefront.cl:166-240)
  * emissive triangles as lights
  * next-event estimation toward one sampled light triangle per bounce
    with multiple importance sampling: NEE contributions carry
    lightPDF/(lightPDF+brdfPDF) and BRDF hits on lights carry
    brdfPDF/(brdfPDF+lightPDF), so large/near lights and glossy paths are
    both unbiased and low-variance (~ the 1/(pdf sums) weights in
    wavefront.cl's Shade/Connect stages)
  * cosine-weighted bounce sampling

Traversal overflow (wavefront frontier cap) is OR-reduced across bounces
and returned next to the radiance so callers can detect truncated frames
and retry with a larger cap_factor.
"""

from __future__ import annotations

from functools import partial

import jax
from flax import struct
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
                      tex_id=None, textures=None, sky=None, specular=None):
    """Build shading arrays: per-triangle albedo (N, 3) and emission (N, 3).

    Light triangles = any with emission > 0 (≙ tiny_scene's TriLight
    extraction, tiny_scene.h:2145-2203). Optional texture mapping
    (≙ raytracer.cl's material shading): `uvs` (N, 3, 2) per-vertex UVs,
    `tex_id` (N,) int texture index per triangle (-1 = untextured),
    `textures` a list of (H, W, 3) images packed into one atlas. Optional
    `sky` (H, W, 3) equirect environment sampled on ray miss (≙ SkyDome).
    Optional `specular` (N,) floats: triangles with specular > 0.5 shade as
    perfect mirrors (≙ MATERIAL_SPECULAR, wavefront.cl:166-240).
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
    if specular is not None:
        scene["specular"] = jnp.asarray(specular, jnp.float32)
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


@struct.dataclass
class AnalyticLights:
    """Point/spot/directional delta lights for NEE (≙ tiny_scene.h:701-766).
    kinds is static (per-kind code paths are compiled in); arrays are (A, …)."""

    pos: jnp.ndarray        # (A, 3)
    dir: jnp.ndarray        # (A, 3) unit
    color: jnp.ndarray      # (A, 3) color * intensity
    cos_inner: jnp.ndarray  # (A,)
    cos_outer: jnp.ndarray  # (A,)
    kinds: tuple = struct.field(pytree_node=False, default=())


def pack_analytic_lights(lights):
    """scene.graph.Light list → AnalyticLights for trace_paths(analytic=).
    Delta lights enter NEE with weight 1 (BRDF sampling can never hit
    them — no MIS needed)."""
    if not lights:
        return None
    d = np.stack([np.asarray(l.direction, np.float32) for l in lights])
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-20)
    return AnalyticLights(
        pos=jnp.asarray(np.stack([l.position for l in lights])),
        dir=jnp.asarray(d),
        color=jnp.asarray(np.stack([
            np.asarray(l.color, np.float32) * float(l.intensity)
            for l in lights])),
        cos_inner=jnp.asarray(np.array(
            [l.cos_inner for l in lights], np.float32)),
        cos_outer=jnp.asarray(np.array(
            [l.cos_outer for l in lights], np.float32)),
        kinds=tuple(l.kind for l in lights),
    )


def _analytic_nee(occl_fn, analytic, p, n, mat_albedo, throughput, valid0):
    """Direct lighting from delta lights: one shadow segment per light
    (the light list is small and static). occl_fn(origin, seg) must return
    ((R,) occluded, overflow) for segments origin → origin+seg.
    Returns (radiance_add, overflow)."""
    R = p.shape[0]
    add = jnp.zeros((R, 3), jnp.float32)
    ovf = jnp.zeros((), bool)
    for i, kind in enumerate(analytic.kinds):
        if kind == "directional":
            wi = jnp.broadcast_to(-analytic.dir[i], (R, 3))
            li = jnp.broadcast_to(analytic.color[i], (R, 3))
            seg = wi * 1e4
        else:
            delta = analytic.pos[i][None, :] - p
            dist2 = jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-12)
            wi = delta / jnp.sqrt(dist2)[:, None]
            li = analytic.color[i][None, :] / dist2[:, None]
            if kind == "spot":
                cos_t = jnp.sum(-wi * analytic.dir[i][None, :], axis=-1)
                fall = jnp.clip(
                    (cos_t - analytic.cos_outer[i])
                    / jnp.maximum(analytic.cos_inner[i]
                                  - analytic.cos_outer[i], 1e-6), 0.0, 1.0)
                li = li * fall[:, None]
            seg = delta
        cos_s = jnp.sum(n * wi, axis=-1)
        valid = valid0 & (cos_s > 0)
        occluded, o1 = occl_fn(p + n * 1e-4, seg)
        ovf = ovf | o1
        c = throughput * mat_albedo / jnp.pi * li * cos_s[:, None]
        add = add + jnp.where((valid & ~occluded)[:, None], c, 0.0)
    return add, ovf


def _tri_geom(tris, prim):
    t = tris[jnp.maximum(prim, 0)]
    v0, e1, e2 = tri_edges(t)
    n = jnp.cross(e1, e2)
    area = 0.5 * jnp.linalg.norm(n, axis=-1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return v0, e1, e2, n, area


@partial(jax.jit, static_argnames=("bounces", "cap_factor", "brute_force"))
def trace_paths(bvh8, scene, rays: Rays, key, bounces: int = 3,
                cap_factor: int = 4, brute_force: bool = False,
                analytic=None, aux=None):
    """Trace one sample per ray through `bounces` bounces; returns
    ((R, 3) radiance, overflow flag). Fully jitted; call repeatedly with
    fresh keys to accumulate. The overflow flag ORs every traversal's
    frontier-overflow across bounces — True means some paths were
    truncated and the caller should retry with a larger cap_factor.

    brute_force=True disables NEE/MIS and counts emission with weight 1 on
    every hit — the plain path-integral estimator. Same expectation, much
    higher variance; used by tests to pin the MIS weighting (≙ the
    validation idea of the reference's speedtest: two estimators, one
    answer).

    aux: optional traverse.packet2.PacketAux — routes every traversal
    through the packet engines (shared-origin primaries direct, bounces
    and shadow segments via the coherence sort), each with exact in-call
    wavefront retrace of overflowed tiles. Requires R %% 256 == 0.
    3-6x the wavefront engine on coherent workloads (the same trade the
    reference makes with Intersect256Rays, tiny_bvh.h:3528)."""
    R = rays.o.shape[0]
    use_packets = aux is not None and R % 256 == 0
    if use_packets:
        from tinybvh_tpu.traverse.packet2 import (
            intersect_packets2, intersect_packets2_sorted,
        )

        from tinybvh_tpu.tuning import get_tuning

        # compiled Mosaic kernels on TPU; interpret elsewhere (CI)
        interp = jax.default_backend() != "tpu"
        scene_lo = jnp.min(aux.leaf_lo, axis=1)
        scene_hi = jnp.max(aux.leaf_hi, axis=1)
        # per-generation budgets: bounce/shadow tiles sweep wide frusta
        # and overflow the 128-deep default worklist (exact either way —
        # the in-call retrace covers overflow — but the fast kernel
        # should carry the load)
        tun = get_tuning()

        def extend(cur, bounce):
            if bounce == 0:
                return intersect_packets2(bvh8, aux, cur,
                                          max_leaves=tun.max_leaves,
                                          max_blocks=tun.max_blocks,
                                          interpret=interp)
            h, ov = intersect_packets2_sorted(
                bvh8, aux, cur, scene_lo, scene_hi,
                max_leaves=tun.max_leaves, max_blocks=tun.max_blocks,
                interpret=interp)
            return h, ov.any()

        def occl_seg(oo, seg):
            """Any-hit over segments oo -> oo+seg via sorted packets
            (any_hit: the tile stops once every ray found an occluder)."""
            h, ov = intersect_packets2_sorted(
                bvh8, aux, make_rays(oo, seg), scene_lo, scene_hi,
                max_leaves=tun.max_leaves, max_blocks=tun.max_blocks,
                interpret=interp, any_hit=True, t_max_static=1.0 - 1e-3)
            return (h.prim >= 0) & (h.t < 1.0 - 1e-3), ov.any()
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
    # MIS state: pdf (solid angle) of the BRDF sample that spawned this
    # ray; last_spec marks delta (mirror/camera) vertices where the light-
    # sampling strategy has zero probability -> emission weight 1
    last_spec = jnp.ones(R, bool)
    prev_pdf = jnp.ones(R, jnp.float32)
    any_overflow = jnp.zeros((), bool)

    for bounce in range(bounces):
        key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
        cur = Rays(o=o, d=d, rd=rd, mask=rays.mask)
        if use_packets:
            hits, ovf = extend(cur, bounce)
        else:
            hits, ovf = intersect_wavefront(bvh8, cur,
                                            cap_factor=cap_factor)
        any_overflow = any_overflow | ovf
        hit_ok = alive & (hits.prim >= 0)

        # environment on miss (≙ raytracer.cl skydome lookup)
        if "sky" in scene:
            from tinybvh_tpu.render.textures import sample_sky

            env = sample_sky(scene["sky"], d)
            radiance = radiance + jnp.where(
                (alive & ~(hits.prim >= 0))[:, None], throughput * env, 0.0
            )

        prim = jnp.maximum(hits.prim, 0)
        v0, e1, e2, ng, harea = _tri_geom(tris, prim)
        n = ng
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

        # --- direct emission with MIS weight ------------------------------
        # brdfPDF/(brdfPDF + lightPDF) for diffuse-sampled rays, 1 for
        # camera/specular rays (≙ wavefront.cl's MIS of Shade + Connect)
        emit = emissive[prim]
        is_emitter = jnp.sum(emit, axis=-1) > 0
        dist2_h = hits.t * hits.t
        cos_lh = jnp.abs(jnp.sum(ng * d, axis=-1))
        pl_hit = dist2_h / jnp.maximum(cos_lh * harea * n_lights, 1e-9)
        w_emit = jnp.where(
            last_spec, 1.0, prev_pdf / jnp.maximum(prev_pdf + pl_hit, 1e-9))
        if brute_force:
            w_emit = jnp.ones_like(w_emit)
        radiance = radiance + jnp.where(
            (hit_ok & is_emitter)[:, None],
            throughput * emit * w_emit[:, None], 0.0)

        mat_albedo = albedo[prim]
        if "tex" in scene:
            from tinybvh_tpu.render.textures import sample_atlas

            tuv = scene["uvs"][prim]  # (R, 3, 2)
            w0 = (1.0 - hits.u - hits.v)[:, None]
            uv = (w0 * tuv[:, 0] + hits.u[:, None] * tuv[:, 1]
                  + hits.v[:, None] * tuv[:, 2])
            mat_albedo = mat_albedo * sample_atlas(
                scene["tex"], scene["tex_id"][prim], uv)

        # specular (perfect mirror) vertices skip NEE and bounce by
        # reflection (≙ MATERIAL_SPECULAR, wavefront.cl:166-240)
        if "specular" in scene:
            is_spec = hit_ok & (scene["specular"][prim] > 0.5)
        else:
            is_spec = jnp.zeros(R, bool)

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
        nee_valid = hit_ok & ~is_spec & (cos_s > 0) & (
            jnp.sum(l_emit, axis=-1) > 0
        )
        if brute_force:
            nee_valid = jnp.zeros_like(nee_valid)
        if use_packets:
            occluded, ovf_s = occl_seg(p + n * 1e-4, wi * dist[:, None])
        else:
            srays = make_rays(p + n * 1e-4, wi * dist[:, None])
            _, occluded, ovf_s = intersect_wavefront(
                bvh8, srays, 1.0 - 1e-3, cap_factor=cap_factor,
                any_hit=True)
        any_overflow = any_overflow | ovf_s
        # pdf of sampling that point on that light (area → solid angle)
        pdf_l = dist2 / jnp.maximum(cos_l * larea * n_lights, 1e-9)
        pdf_b = jnp.maximum(cos_s, 0.0) / jnp.pi   # cosine-hemisphere pdf
        w_nee = pdf_l / jnp.maximum(pdf_l + pdf_b, 1e-9)
        contrib = (
            throughput
            * mat_albedo / jnp.pi
            * l_emit
            * (cos_s * w_nee / jnp.maximum(pdf_l, 1e-9))[:, None]
        )
        radiance = radiance + jnp.where(
            (nee_valid & ~occluded)[:, None], contrib, 0.0
        )

        # --- analytic (point/spot/directional) delta lights ---------------
        if analytic:
            def occl(oo, seg):
                if use_packets:
                    return occl_seg(oo, seg)
                from tinybvh_tpu.core.rays import make_rays as _mk
                _, occ, o2 = intersect_wavefront(
                    bvh8, _mk(oo, seg), 1.0 - 1e-3,
                    cap_factor=cap_factor, any_hit=True)
                return occ, o2

            a_add, a_ovf = _analytic_nee(
                occl, analytic, p, n, mat_albedo, throughput,
                hit_ok & ~is_spec)
            radiance = radiance + a_add
            any_overflow = any_overflow | a_ovf

        # --- bounce: cosine-weighted diffuse or mirror reflection ---------
        r3 = jax.random.uniform(k4, (R,))
        r4 = jax.random.uniform(k5, (R,))
        nd = normalize(cosine_hemisphere(n, r3, r4))
        refl = normalize(d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n)
        new_d = jnp.where(is_spec[:, None], refl, nd)
        # cosine-weighted pdf cancels cos/π for diffuse; mirror is delta
        throughput = throughput * mat_albedo
        alive = hit_ok & (jnp.max(throughput, axis=-1) > 1e-3)
        o = p + n * 1e-4
        d = new_d
        from tinybvh_tpu.core.vecmath import safe_rcp

        rd = safe_rcp(d)
        prev_pdf = jnp.maximum(jnp.sum(nd * n, axis=-1), 1e-6) / jnp.pi
        last_spec = is_spec

    return radiance, any_overflow


def render(bvh8, scene, eye, fwd, right, up, width, height, spp=4,
           bounces=3, seed=0, cap_factor: int = 4, analytic=None,
           use_packets: bool = False):
    """Accumulate spp samples; returns ((H, W, 3) float image, overflow).

    use_packets=True routes all traversals through the packet engines
    (build_packet_aux is computed once here)."""
    from tinybvh_tpu.render.camera import primary_rays

    aux = None
    if use_packets and (width * height) % 256 == 0:
        from tinybvh_tpu.traverse.packet2 import build_packet_aux

        aux = build_packet_aux(bvh8)
    key = jax.random.PRNGKey(seed)
    acc = jnp.zeros((width * height, 3), jnp.float32)
    ovf = jnp.zeros((), bool)
    for s in range(spp):
        key, kj, kt = jax.random.split(key, 3)
        jit_ = jax.random.uniform(kj, (height, width, 2))
        rays = primary_rays(eye, fwd, right, up, width, height, jitter=jit_)
        rad, o1 = trace_paths(bvh8, scene, rays, kt, bounces=bounces,
                              cap_factor=cap_factor, analytic=analytic,
                              aux=aux)
        acc = acc + rad
        ovf = ovf | o1
    img = (acc / spp).reshape(height, width, 3)
    return img, ovf
