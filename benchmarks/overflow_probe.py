"""Measure the TRUE cull-survivor distribution of every bench phase.

The bench's exactness contract is *_overflow_* == 0 (≙ the reference's
ValidateTraceResult gate, tiny_bvh_speedtest.cpp:338-381): a tile whose
surviving segment keys exceed the max_leaves/SPAN budget silently drops
hits unless the wavefront retrace catches it. This probe replays each
bench phase's exact ray setup with a deliberately oversized budget and
prints the survivor-count distribution (max / p99 / counts above the
candidate budgets), which is what sizes bench.py's per-phase max_leaves
and max_blocks so the budgets cover every tile with margin and the
retrace branch stays cold.

Usage: python benchmarks/overflow_probe.py [bunny|grid4|grid16|all]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinybvh_tpu.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from bench import _bunny_grid, _camera_rays, _load_bunny
from tinybvh_tpu.api import BVH
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.traverse.packet2 import SPAN, intersect_packets2

PROBE_ML = 4096          # segments*SPAN — oversized so counts are exact
PROBE_MB = 512


def _dir_sort(points, origin):
    """Direction-morton order of shared-origin targets (the tiling
    is_occluded_packets2_sorted uses)."""
    import jax.numpy as jnp

    from tinybvh_tpu.traverse.packet import _spread10

    d = points - origin[None, :]
    dn = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-20)
    q = np.clip(((dn + 1.0) * 0.5 * 1024.0).astype(np.int32), 0, 1023)
    key = (np.asarray(_spread10(jnp.asarray(q[:, 0])))
           | (np.asarray(_spread10(jnp.asarray(q[:, 1]))) << 1)
           | (np.asarray(_spread10(jnp.asarray(q[:, 2]))) << 2))
    return points[np.argsort(key)]


def _report(tag, counts, kk_probe):
    # the cull ACCUMULATES true survivor totals even past the key budget,
    # so counts are exact sizes (only == kk_probe+1 is ambiguous with the
    # block-worklist overflow flag)
    c = np.asarray(counts)
    wl_ovf = int((c == kk_probe + 1).sum())
    print(f"{tag}: tiles={c.size} wl_overflow?={wl_ovf} "
          f"max={int(c.max())} p99={int(np.percentile(c, 99))} "
          f"p90={int(np.percentile(c, 90))} mean={c.mean():.1f}")
    for ml in (512, 1024, 2048, 2560, 4096, 8192, 16384):
        kk = ml // SPAN
        print(f"  ml={ml:5d} (Kk={kk:4d}): tiles_over={int((c > kk).sum())}")


def probe_scene(tris, name, phases=("primary",), light_axis=1.0):
    bvh = BVH(tris)
    aux = bvh.packet_aux
    jax.block_until_ready(aux.gtab_pad)
    lo, hi = bvh.aabb
    o, d, center, extent = _camera_rays(np.asarray(lo), np.asarray(hi))
    rays = make_rays(o, d)
    far = jnp.asarray(1e30, jnp.float32)
    kk_probe = PROBE_ML // SPAN

    t0 = time.time()
    hits, ovf, counts = intersect_packets2(
        bvh.bvh8, aux, rays, max_leaves=PROBE_ML, t_max=far,
        max_blocks=PROBE_MB, retrace=False, return_counts=True)
    jax.block_until_ready(counts)
    print(f"[{name}] primary probe {time.time() - t0:.0f}s")
    _report(f"{name} primary", counts, kk_probe)

    if "shadow" in phases:
        light = (center + np.array([0, 2.0, 0]) * extent).astype(np.float32)
        ht = np.asarray(hits.t)
        ht = np.where(np.isfinite(ht) & (ht < 1e29), ht, 1.0)
        p = o + ht[:, None] * np.asarray(d)
        for tag, pts in (("shadow", p), ("shadow_sorted", _dir_sort(p, light))):
            sd = pts - light[None, :]
            srays = make_rays(np.broadcast_to(light, sd.shape).copy(), sd)
            _, _, counts = intersect_packets2(
                bvh.bvh8, aux, srays, max_leaves=PROBE_ML,
                t_max=jnp.asarray(1.0 - 1e-3, jnp.float32),
                max_blocks=PROBE_MB, retrace=False, any_hit=True,
                return_counts=True)
            jax.block_until_ready(counts)
            _report(f"{name} {tag}", counts, kk_probe)

    if "diffuse" in phases:
        from tinybvh_tpu.traverse.packet import sort_rays_coherent

        rng = np.random.default_rng(1)
        tris_np = np.asarray(tris)
        prim = np.asarray(hits.prim)
        tri = tris_np[np.maximum(prim, 0)]
        nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
        nrm = np.where((np.sum(nrm * np.asarray(d), 1) > 0)[:, None],
                       -nrm, nrm)
        dd = rng.normal(size=(p.shape[0], 3)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=1, keepdims=True)
        dd = np.where((np.sum(dd * nrm, 1) < 0)[:, None], -dd, dd)
        do = (p + nrm * 1e-3).astype(np.float32)
        # replicate the sorted path's tile assembly, then probe the core
        order, _ = sort_rays_coherent(
            jnp.asarray(do), jnp.asarray(dd), jnp.asarray(lo),
            jnp.asarray(hi))
        order = np.asarray(order)
        drays = make_rays(do[order], dd[order].astype(np.float32))
        _, _, counts = intersect_packets2(
            bvh.bvh8, aux, drays, max_leaves=PROBE_ML, t_max=far,
            max_blocks=PROBE_MB, retrace=False, return_counts=True)
        jax.block_until_ready(counts)
        _report(f"{name} diffuse", counts, kk_probe)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    bunny, _ = _load_bunny()
    if which in ("bunny", "all"):
        probe_scene(bunny, "bunny", phases=("primary", "shadow", "diffuse"))
    if which in ("grid4", "all"):
        probe_scene(_bunny_grid(bunny, 2, 2), "grid4")
    if which in ("grid16", "all"):
        probe_scene(_bunny_grid(bunny, 4, 4), "grid16")


if __name__ == "__main__":
    main()
