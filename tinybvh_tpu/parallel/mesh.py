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


def trace_packets_dp(mesh: Mesh, bvh8, aux, rays: Rays, t_max=BVH_FAR,
                     max_leaves: int = 256, interpret: bool = False,
                     max_blocks: int = 128) -> Hits:
    """Data-parallel trace with the FLAGSHIP packet2 engine inside
    shard_map: BVH8 + packet tables replicated, tile-ordered rays sharded
    over 'rays' (each shard's ray count must be a multiple of 256), each
    device runs the full dense-cull + fused-MT pipeline incl. its in-call
    wavefront retrace of overflowed tiles — so the combined result is
    exact. ≙ the reference's fastest-layout-under-threads pattern
    (tiny_bvh_anim.cpp:194-205 tile threads call BVH8_CPU::Intersect);
    zero communication (pure DP — image assembly happens where the
    caller gathers)."""
    from tinybvh_tpu.traverse.packet2 import intersect_packets2

    def local(bvh8, aux, o, d, rd, mask):
        r = Rays(o=o, d=d, rd=rd, mask=mask)
        h, _ = intersect_packets2(
            bvh8, aux, r, max_leaves=max_leaves, t_max=t_max,
            interpret=interpret, retrace=True, max_blocks=max_blocks)
        return h

    f = shard_map(
        local, mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), bvh8),
            jax.tree.map(lambda _: P(), aux),
            P("rays"), P("rays"), P("rays"), P("rays"),
        ),
        out_specs=jax.tree.map(lambda _: P("rays"), Hits(0, 0, 0, 0, 0)),
        check_vma=False,
    )
    return f(bvh8, aux, rays.o, rays.d, rays.rd, rays.mask)


def shard_scene_packets(tris, n_shards: int, max_leaf: int = 4):
    """Geometry sharding for the packet2 engine: split the soup into n
    interleaved subsets, build a BVH8 + packet tables per subset, pad all
    shards to common shapes (empty nodes/leaf rows are inert: EMPTY_SLOT
    children, +/-FAR leaf boxes that always cull), and stack into pytrees
    with a leading 'scene' axis. Returns (bvh8_stack, aux_stack,
    gid_stack)."""
    from tinybvh_tpu.builders.binned import build_binned
    from tinybvh_tpu.layouts.mbvh import EMPTY_SLOT, collapse_bvh2
    from tinybvh_tpu.traverse.packet2 import build_packet_aux

    tris = np.asarray(tris, np.float32)
    n = tris.shape[0]
    per = -(-n // n_shards)
    pad = per * n_shards - n
    tris_p = np.concatenate([tris, np.zeros((pad, 3, 3), np.float32)], axis=0)
    shards = np.arange(per * n_shards).reshape(n_shards, per)
    b8s, gids = [], []
    for s in range(n_shards):
        sub = tris_p[shards[s]]
        b2 = build_binned(sub, max_leaf=max_leaf)
        b8s.append(collapse_bvh2(b2, jnp.asarray(sub)))
        gids.append(jnp.asarray(shards[s], jnp.int32))
    n_nodes = max(b.n_nodes for b in b8s)
    n_leaves = max(b.n_leaves for b in b8s)
    # round leaf rows up to the packet2 block size so every shard's aux
    # tables tile identically
    n_leaves = -(-n_leaves // 128) * 128

    def pad_b8(b):
        pn = n_nodes - b.n_nodes
        pl = n_leaves - b.n_leaves
        empty = np.full((pn, 48), BVH_FAR, np.float32)
        empty.reshape(pn, 6, 8)[:, 3:] = -BVH_FAR
        return b.replace(
            bounds=jnp.concatenate([b.bounds, jnp.asarray(empty)], axis=0),
            child=jnp.concatenate(
                [b.child, jnp.full((pn, 8), EMPTY_SLOT, jnp.int32)], axis=0),
            leaf_tris=jnp.concatenate(
                [b.leaf_tris, jnp.zeros((pl, 4, 3, 3), jnp.float32)], axis=0),
            leaf_prim=jnp.concatenate(
                [b.leaf_prim, jnp.full((pl, 4), -1, jnp.int32)], axis=0),
        )

    b8s = [pad_b8(b) for b in b8s]
    auxes = [build_packet_aux(b) for b in b8s]
    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
    return stack(b8s), stack(auxes), jnp.stack(gids)


def trace_packets_sharded(mesh: Mesh, bvh8_stack, aux_stack, gid_stack,
                          rays: Rays, t_max=BVH_FAR, max_leaves: int = 256,
                          interpret: bool = False,
                          max_blocks: int = 128) -> Hits:
    """Two-axis sharded packet2 trace: rays over 'rays', geometry over
    'scene'. Each device packet-traces its ray block against its triangle
    subset (exact, retrace included); winners min-combine across 'scene'
    via all_gather over ICI (≙ SURVEY §2.5 P6 with the fast engine)."""
    from tinybvh_tpu.traverse.packet2 import intersect_packets2

    def local(bvh8, aux, gids, o, d, rd, mask):
        bvh1 = jax.tree.map(lambda x: x[0], bvh8)
        aux1 = jax.tree.map(lambda x: x[0], aux)
        r = Rays(o=o, d=d, rd=rd, mask=mask)
        h, _ = intersect_packets2(
            bvh1, aux1, r, max_leaves=max_leaves, t_max=t_max,
            interpret=interpret, retrace=True, max_blocks=max_blocks)
        gprim = jnp.where(h.prim >= 0, gids[0][jnp.maximum(h.prim, 0)], -1)
        tg = jax.lax.all_gather(h.t, "scene")
        win = jnp.argmin(tg, axis=0)

        def pick(x):
            xg = jax.lax.all_gather(x, "scene")
            return jnp.take_along_axis(xg, win[None, :], axis=0)[0]

        return Hits(t=pick(h.t), u=pick(h.u), v=pick(h.v),
                    prim=pick(gprim), inst=pick(h.inst))

    f = shard_map(
        local, mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P("scene"), bvh8_stack),
            jax.tree.map(lambda _: P("scene"), aux_stack),
            P("scene"),
            P("rays"), P("rays"), P("rays"), P("rays"),
        ),
        out_specs=jax.tree.map(lambda _: P("rays"), Hits(0, 0, 0, 0, 0)),
        check_vma=False,
    )
    return f(bvh8_stack, aux_stack, gid_stack, rays.o, rays.d, rays.rd,
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
