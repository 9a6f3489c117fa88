"""Benchmark driver: primary-ray throughput on the Stanford bunny (69,630 tris).

Mirrors tiny_bvh_speedtest's primary-ray benchmark (tiny_bvh_speedtest.cpp:
174-336): build a BVH over a real scene, fire camera primary rays, report
MRays/s. Prints ONE JSON line with the headline metric; the `detail` field
carries the full metric table (build time, SAH cost, diffuse/shadow rates).

Runs on whatever jax.devices() provides (the real TPU under the driver).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.io.loaders import load_bin, random_tris

    try:
        tris = load_bin("/root/reference/testdata/bunny.bin")
        scene_name = "bunny"
    except OSError:
        tris = random_tris(65536, seed=0)
        scene_name = "random64k"

    n_tris = tris.shape[0]

    # initialize the device first so build timing excludes TPU cold start
    jax.block_until_ready(jax.numpy.zeros(8) + 1)

    t0 = time.perf_counter()
    bvh = BVH(tris)  # binned SAH + 8-wide collapse (the fast layout)
    jax.block_until_ready(bvh.bvh2.node_min)
    build_s = time.perf_counter() - t0

    # SAH on host (the device version costs an eager-op compile here)
    mn = np.asarray(bvh.bvh2.node_min)
    mx = np.asarray(bvh.bvh2.node_max)
    ct = np.asarray(bvh.bvh2.count)
    used = np.arange(mn.shape[0]) < int(bvh.bvh2.n_nodes)
    used[1] = False
    e = np.maximum(mx - mn, 0)
    area = e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 2] * e[:, 0]
    cost = np.where(ct > 0, ct * area, area)
    sah = float(cost[used].sum() / max(area[0], 1e-30))

    # camera: look at scene center from outside along a diagonal
    lo, hi = bvh.aabb
    center = (lo + hi) * 0.5
    extent = float(np.max(hi - lo))
    eye = center + np.array([0.6, 0.35, 1.1]) * extent * 1.2
    fwd = center - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)

    W = H = 640
    xs = (np.arange(W) + 0.5) / W - 0.5
    ys = (np.arange(H) + 0.5) / H - 0.5
    gx, gy = np.meshgrid(xs, ys)
    d = (
        fwd[None, None]
        + 0.9 * gx[..., None] * right[None, None]
        + 0.9 * gy[..., None] * up[None, None]
    )
    d = d / np.linalg.norm(d, axis=2, keepdims=True)
    # tile-order (16x16 packets) for the packet tracer
    d = d.reshape(H // 16, 16, W // 16, 16, 3).transpose(0, 2, 1, 3, 4)
    d = d.reshape(-1, 3).astype(np.float32)
    o = np.broadcast_to(eye.astype(np.float32), d.shape)
    rays = make_rays(o, d)
    n_rays = d.shape[0]

    # primary rays: packet tracer (headline), wavefront as comparison
    from tinybvh_tpu.traverse.packet import intersect_packets
    from tinybvh_tpu.traverse.wavefront import (
        intersect_wavefront, is_occluded_wavefront,
    )

    use_pallas = jax.default_backend() != "cpu"
    hits, _ = intersect_packets(bvh.bvh8, rays, max_leaves=256,
                                use_pallas=use_pallas, pair_cap_factor=16)
    jax.block_until_ready(hits.t)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        hits, _ = intersect_packets(bvh.bvh8, rays, max_leaves=256,
                                    use_pallas=use_pallas, pair_cap_factor=16)
        np.asarray(hits.t)
        times.append(time.perf_counter() - t0)
    primary_mrays = n_rays / min(times) / 1e6
    hit_rate = float(np.mean(np.asarray(hits.prim) >= 0))

    # secondary metrics are best-effort: the headline JSON must print
    # even if the tunnel is having a slow day or a stage fails
    detail_extra = {}
    try:
        hw, _ = intersect_wavefront(bvh.bvh8, rays, cap_factor=2)
        np.asarray(hw.t)
        t0 = time.perf_counter()
        hw, _ = intersect_wavefront(bvh.bvh8, rays, cap_factor=2)
        np.asarray(hw.t)
        wavefront_mrays = n_rays / (time.perf_counter() - t0) / 1e6

        # shadow rays from hit points toward a fixed point light. Traced as
        # packets FROM the light (every image tile's endpoints form a coherent
        # shared-origin bundle) — the wavefront number is kept for comparison.
        from tinybvh_tpu.traverse.packet import is_occluded_packets

        ht = np.asarray(hits.t)
        ht = np.where(np.isfinite(ht) & (ht < 1e29), ht, 1.0)
        p = (np.asarray(rays.o) + ht[:, None] * np.asarray(rays.d)).astype(
            np.float32)
        light = (center + np.array([0, 2.0, 0]) * extent).astype(np.float32)
        occ, _ = is_occluded_packets(bvh.bvh8, light, p, max_leaves=256,
                                     use_pallas=use_pallas, pair_cap_factor=16)
        np.asarray(occ)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            occ, _ = is_occluded_packets(bvh.bvh8, light, p, max_leaves=256,
                                         use_pallas=use_pallas,
                                         pair_cap_factor=16)
            np.asarray(occ)
            times.append(time.perf_counter() - t0)
        shadow_mrays = n_rays / min(times) / 1e6

        sd = light[None, :] - p
        sn = np.linalg.norm(sd, axis=1, keepdims=True)
        srays = make_rays((p + sd / sn * 1e-3).astype(np.float32),
                          (sd / sn).astype(np.float32))
        occ_w = is_occluded_wavefront(bvh.bvh8, srays, float(np.median(sn)))
        np.asarray(occ_w)
        t0 = time.perf_counter()
        occ_w = is_occluded_wavefront(bvh.bvh8, srays, float(np.median(sn)))
        np.asarray(occ_w)
        shadow_wavefront_mrays = n_rays / (time.perf_counter() - t0) / 1e6

        # diffuse bounce rays (incoherent): cosine-ish random directions from
        # the primary hit points — traced via coherence-sorted packets
        # (≙ the reference's diffuse batch, tiny_bvh_speedtest.cpp:557-587)
        from tinybvh_tpu.traverse.packet import intersect_packets_sorted

        rng = np.random.default_rng(1)
        tri_hit = np.asarray(tris)[np.maximum(np.asarray(hits.prim), 0)]
        nrm = np.cross(tri_hit[:, 1] - tri_hit[:, 0], tri_hit[:, 2] - tri_hit[:, 0])
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
        nrm = np.where((np.sum(nrm * np.asarray(rays.d), axis=1) > 0)[:, None],
                       -nrm, nrm)
        dd = rng.normal(size=(n_rays, 3)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=1, keepdims=True)
        dd = np.where((np.sum(dd * nrm, axis=1) < 0)[:, None], -dd, dd)
        drays = make_rays((p + nrm * 1e-3).astype(np.float32), dd)
        dh, dov = intersect_packets_sorted(
            bvh.bvh8, drays, lo, hi, max_leaves=512, use_pallas=use_pallas,
            pair_cap_factor=64)
        np.asarray(dh.t)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            dh, dov = intersect_packets_sorted(
                bvh.bvh8, drays, lo, hi, max_leaves=512, use_pallas=use_pallas,
                pair_cap_factor=64)
            np.asarray(dh.t)
            times.append(time.perf_counter() - t0)
        diffuse_mrays = n_rays / min(times) / 1e6
        diffuse_overflow = float(np.asarray(dov).mean())

        hw2, _ = intersect_wavefront(bvh.bvh8, drays, cap_factor=2)
        np.asarray(hw2.t)
        t0 = time.perf_counter()
        hw2, _ = intersect_wavefront(bvh.bvh8, drays, cap_factor=2)
        np.asarray(hw2.t)
        diffuse_wavefront_mrays = n_rays / (time.perf_counter() - t0) / 1e6
        # honesty check: overflowed tiles carry truncated leaf lists — how
        # close is the truncated packet trace to the exact wavefront result?
        diffuse_agree = float(
            np.mean(np.asarray(dh.prim) == np.asarray(hw2.prim)))

        detail_extra = dict(
            shadow_mrays=round(shadow_mrays, 3),
            shadow_wavefront_mrays=round(shadow_wavefront_mrays, 3),
            diffuse_mrays=round(diffuse_mrays, 3),
            diffuse_overflow=round(diffuse_overflow, 4),
            diffuse_agree=round(diffuse_agree, 4),
            diffuse_wavefront_mrays=round(diffuse_wavefront_mrays, 3),
            wavefront_mrays=round(wavefront_mrays, 3),
        )
    except Exception as e:  # pragma: no cover - device-dependent
        detail_extra = {"secondary_error": repr(e)[:200]}

    target = 500.0  # BASELINE.json north-star MRays/s per chip
    result = {
        "metric": f"primary_mrays_{scene_name}",
        "value": round(primary_mrays, 3),
        "unit": "MRays/s",
        "vs_baseline": round(primary_mrays / target, 4),
        "detail": {
            "scene": scene_name,
            "n_tris": int(n_tris),
            "n_rays": int(n_rays),
            "build_s": round(build_s, 3),
            "build_mtris_s": round(n_tris / build_s / 1e6, 3),
            "sah_cost": round(sah, 2),
            "hit_rate": round(hit_rate, 4),
            **detail_extra,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
