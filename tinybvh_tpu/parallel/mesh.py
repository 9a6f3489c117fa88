"""Multi-chip scaling: ray-parallel and scene-parallel tracing over a Mesh.

The reference is single-process (SURVEY.md §2.5); its scaling axes are ray
count and scene size. On TPU these become:

  * 'rays' axis  — pure data parallelism over ray batches (the analogue of
    the reference's tile work queues, tiny_bvh_anim.cpp:30,194). BVH
    replicated, zero communication until image assembly.
  * 'scene' axis — geometry sharding for scenes exceeding one chip's HBM:
    each device holds a BVH over a triangle subset, traces the full ray
    block against its subset, and hits are min-combined over ICI — the
    ray-tracing analogue of tensor parallelism.

Everything is expressed with shard_map over a jax.sharding.Mesh so XLA
inserts the collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tinybvh_tpu.core.rays import Hits, Rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.traverse.stack import intersect_bvh2


def make_mesh(n_rays_axis: int, n_scene_axis: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_rays_axis * n_scene_axis
    dev = np.asarray(devices[:n]).reshape(n_rays_axis, n_scene_axis)
    return Mesh(dev, axis_names=("rays", "scene"))


def shard_scene(tris, n_shards: int, builder=None):
    """Split a triangle soup into n interleaved subsets and build one BVH per
    subset. Returns stacked BVH pytrees + packed tris with a leading 'shard'
    axis (padded to equal shapes) plus the per-shard prim-id base map."""
    from tinybvh_tpu.builders.binned import build_binned
    from tinybvh_tpu.traverse.stack import pack_tris

    tris = np.asarray(tris, np.float32)
    n = tris.shape[0]
    per = -(-n // n_shards)
    pad = per * n_shards - n
    # padded degenerate triangles never hit (zero area, det==0)
    tris_p = np.concatenate([tris, np.zeros((pad, 3, 3), np.float32)], axis=0)
    order = np.arange(per * n_shards)
    shards = order.reshape(n_shards, per)
    bvhs, packed, gids = [], [], []
    for s in range(n_shards):
        ids = shards[s]
        sub = tris_p[ids]
        b = (builder or partial(build_binned, max_leaf=8))(sub)
        bvhs.append(b)
        packed.append(pack_tris(b, jnp.asarray(sub)))
        gids.append(jnp.asarray(ids, jnp.int32))
    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
    return stack(bvhs), jnp.stack(packed), jnp.stack(gids)


def trace_sharded(mesh: Mesh, bvh_stack, packed_stack, gid_stack, rays: Rays,
                  t_max=BVH_FAR, leaf_max: int = 8) -> Hits:
    """Two-axis sharded closest-hit trace.

    rays sharded over 'rays'; (bvh, tris) sharded over 'scene'. Each device
    traces its ray block against its scene shard; per-ray winners are
    min-combined across 'scene' via an all_gather + argmin (hits ride ICI).
    """
    n_scene = mesh.shape["scene"]
    assert bvh_stack.node_min.shape[0] == n_scene

    def local(bvh, packed, gids, o, d, rd, mask):
        # strip the per-device leading shard axis
        bvh1 = jax.tree.map(lambda x: x[0], bvh)
        r = Rays(o=o, d=d, rd=rd, mask=mask)
        h = intersect_bvh2(bvh1, packed[0], r, t_max, leaf_max=leaf_max)
        # map shard-local prim ids back to global ids
        gprim = jnp.where(h.prim >= 0, gids[0][jnp.maximum(h.prim, 0)], -1)
        # combine across the scene axis: winner = min t
        tg = jax.lax.all_gather(h.t, "scene")          # (S, R)
        win = jnp.argmin(tg, axis=0)                    # (R,)
        my = jax.lax.axis_index("scene")
        mine = win == my

        def pick(x):
            xg = jax.lax.all_gather(x, "scene")
            return jnp.take_along_axis(xg, win[None, :], axis=0)[0]

        return Hits(
            t=pick(h.t), u=pick(h.u), v=pick(h.v),
            prim=pick(gprim), inst=pick(h.inst),
        )

    f = shard_map(
        local, mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P("scene"), bvh_stack),
            P("scene"), P("scene"),
            P("rays"), P("rays"), P("rays"), P("rays"),
        ),
        out_specs=jax.tree.map(lambda _: P("rays"), Hits(0, 0, 0, 0, 0)),
        check_vma=False,
    )
    return f(bvh_stack, packed_stack, gid_stack, rays.o, rays.d, rays.rd,
             rays.mask)


def render_step_dp(mesh: Mesh, bvh, packed, rays: Rays, light_dir,
                   leaf_max: int = 8):
    """One data-parallel render step: trace + lambert shade + shadow term.

    BVH replicated, rays sharded over 'rays'; returns a per-ray RGB image
    block sharded the same way. This is the multi-chip analogue of the
    reference's tiled CPU renderers (tiny_bvh_pt.cpp:30-60).
    """
    from tinybvh_tpu.core.intersect import tri_edges
    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.traverse.stack import is_occluded_bvh2

    def local(bvh, packed, o, d, rd, mask):
        r = Rays(o=o, d=d, rd=rd, mask=mask)
        h = intersect_bvh2(bvh, packed, r, leaf_max=leaf_max)
        v0, e1, e2 = tri_edges(packed[jnp.maximum(h.prim, 0)])
        n = jnp.cross(e1, e2)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        ndl = jnp.abs(n @ jnp.asarray(light_dir, jnp.float32))
        p = o + h.t[:, None] * d
        srays = make_rays(p + n * 1e-3, jnp.broadcast_to(
            jnp.asarray(light_dir, jnp.float32), p.shape))
        occ = is_occluded_bvh2(bvh, packed, srays, 1e4, leaf_max=leaf_max)
        shade = jnp.where(h.prim >= 0, ndl * jnp.where(occ, 0.2, 1.0), 0.05)
        return jnp.stack([shade, shade, shade], axis=-1)

    f = shard_map(
        local, mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), bvh),
            P(), P("rays"), P("rays"), P("rays"), P("rays"),
        ),
        out_specs=P("rays"),
        check_vma=False,
    )
    return f(bvh, packed, rays.o, rays.d, rays.rd, rays.mask)
