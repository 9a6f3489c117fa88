"""Non-ray BVH queries: sphere overlap (collision detection) and custom
user primitives.

Counterparts of BVH::IntersectSphere (tiny_bvh.h:3140-3200) and the
customIntersect/customIsOccluded callbacks (tiny_bvh.h:966-967,
3270-3280). Batched: a whole array of query spheres advances in lockstep,
like the ray traversals in traverse/stack.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from tinybvh_tpu.core.intersect import sphere_tri_overlap
from tinybvh_tpu.core.rays import Hits, Rays
from tinybvh_tpu.core.vecmath import BVH_FAR

STACK_DEPTH = 64


def _sphere_aabb_overlap(c, r, bmin, bmax):
    """Squared distance from centers to boxes <= r²."""
    q = jnp.maximum(bmin - c, 0.0) + jnp.maximum(c - bmax, 0.0)
    return jnp.sum(q * q, axis=-1) <= r * r


@partial(jax.jit, static_argnames=("leaf_max",))
def intersect_sphere(bvh, packed_tris, centers, radii, leaf_max: int = 16):
    """True per sphere if any triangle overlaps it (exact tri-sphere test).

    centers: (Q, 3); radii: (Q,) or scalar. ≙ BVH::IntersectSphere.
    """
    c = jnp.asarray(centers, jnp.float32)
    Q = c.shape[0]
    r = jnp.broadcast_to(jnp.asarray(radii, jnp.float32), (Q,))
    tris = packed_tris

    state = dict(
        cur=jnp.zeros(Q, jnp.int32),
        sp=jnp.zeros(Q, jnp.int32),
        stack=jnp.zeros((Q, STACK_DEPTH), jnp.int32),
        hit=jnp.zeros(Q, bool),
        done=jnp.zeros(Q, bool),
    )
    rows = jnp.arange(Q)

    def cond(s):
        return jnp.any(~s["done"])

    def body(s):
        cur, sp, done, hitq = s["cur"], s["sp"], s["done"], s["hit"]
        need_pop = (cur < 0) & ~done
        can_pop = need_pop & (sp > 0)
        nsp = jnp.where(can_pop, sp - 1, sp)
        col = jnp.clip(nsp, 0, STACK_DEPTH - 1)
        cur = jnp.where(can_pop, s["stack"][rows, col], cur)
        done = done | (need_pop & (sp == 0))
        sp = nsp

        proc = (cur >= 0) & ~done
        node = jnp.maximum(cur, 0)
        lf = bvh.left_first[node]
        ct = bvh.count[node]
        is_leaf = proc & (ct > 0)
        is_int = proc & (ct == 0)

        base = jnp.where(is_leaf, lf, 0)
        idx = jnp.clip(
            base[:, None] + jnp.arange(leaf_max, dtype=jnp.int32)[None, :],
            0, tris.shape[0] - 1,
        )
        t = tris[idx]  # (Q, L, 3, 3)
        ov = sphere_tri_overlap(
            c[:, None, :], r[:, None], t[:, :, 0], t[:, :, 1], t[:, :, 2]
        )
        lane_ok = jnp.arange(leaf_max)[None, :] < ct[:, None]
        new_hit = hitq | (is_leaf & jnp.any(ov & lane_ok, axis=1))
        done = done | new_hit

        l = jnp.where(is_int, lf, 0)
        ol = _sphere_aabb_overlap(c, r, bvh.node_min[l], bvh.node_max[l]) & is_int
        orr = _sphere_aabb_overlap(c, r, bvh.node_min[l + 1], bvh.node_max[l + 1]) & is_int
        push = ol & orr
        colp = jnp.clip(sp, 0, STACK_DEPTH - 1)
        old = s["stack"][rows, colp]
        stack = s["stack"].at[rows, colp].set(jnp.where(push, l + 1, old))
        sp = jnp.where(push, sp + 1, sp)
        cur = jnp.where(is_int, jnp.where(ol, l, jnp.where(orr, l + 1, -1)), cur)
        cur = jnp.where(is_leaf, -1, cur)
        return dict(cur=cur, sp=sp, stack=stack, hit=new_hit, done=done)

    s = lax.while_loop(cond, body, state)
    return s["hit"]


@partial(jax.jit, static_argnames=("custom_intersect", "leaf_max"))
def intersect_custom(bvh, rays: Rays, custom_intersect, t_max=BVH_FAR,
                     leaf_max: int = 4):
    """Closest-hit over a BVH built on user AABBs with a user primitive
    test (≙ customIntersect, tiny_bvh.h:3270-3280).

    custom_intersect(o, d, prim_ids, t_cur) → (hit_mask, t, u, v) where all
    args/returns are batched (R, L); prim_ids indexes the user's primitive
    array. Must be jit-traceable.
    """
    o, d, rd = rays.o, rays.d, rays.rd
    R = o.shape[0]
    rows = jnp.arange(R)
    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

    state = dict(
        cur=jnp.zeros(R, jnp.int32),
        sp=jnp.zeros(R, jnp.int32),
        stack_node=jnp.zeros((R, 64), jnp.int32),
        stack_dist=jnp.zeros((R, 64), jnp.float32),
        t=t0,
        u=jnp.zeros(R, jnp.float32),
        v=jnp.zeros(R, jnp.float32),
        prim=jnp.full(R, -1, jnp.int32),
        done=jnp.zeros(R, bool),
    )

    def cond(s):
        return jnp.any(~s["done"])

    def body(s):
        cur, sp, done, t = s["cur"], s["sp"], s["done"], s["t"]
        need_pop = (cur < 0) & ~done
        can_pop = need_pop & (sp > 0)
        nsp = jnp.where(can_pop, sp - 1, sp)
        col = jnp.clip(nsp, 0, 63)
        pe = s["stack_node"][rows, col]
        pd = s["stack_dist"][rows, col]
        take = can_pop & (pd < t)
        cur = jnp.where(take, pe, cur)
        done = done | (need_pop & (sp == 0))
        sp = nsp

        proc = (cur >= 0) & ~done
        node = jnp.maximum(cur, 0)
        lf = bvh.left_first[node]
        ct = bvh.count[node]
        is_leaf = proc & (ct > 0)
        is_int = proc & (ct == 0)

        base = jnp.where(is_leaf, lf, 0)
        lanes = jnp.arange(leaf_max, dtype=jnp.int32)
        pid = bvh.prim_idx[
            jnp.clip(base[:, None] + lanes[None, :], 0, bvh.prim_idx.shape[0] - 1)
        ]
        hitm, th, uh, vh = custom_intersect(o, d, pid, t)
        lane_ok = lanes[None, :] < ct[:, None]
        th = jnp.where(hitm & lane_ok & is_leaf[:, None], th, BVH_FAR)
        best = jnp.argmin(th, axis=1)
        bt = jnp.min(th, axis=1)
        improved = bt < t
        t = jnp.where(improved, bt, t)
        u = jnp.where(improved, jnp.take_along_axis(uh, best[:, None], 1)[:, 0], s["u"])
        v = jnp.where(improved, jnp.take_along_axis(vh, best[:, None], 1)[:, 0], s["v"])
        prim = jnp.where(
            improved, jnp.take_along_axis(pid, best[:, None], 1)[:, 0], s["prim"]
        )

        l = jnp.where(is_int, lf, 0)
        from tinybvh_tpu.traverse.stack import _slab

        dl = _slab(o, rd, t, bvh.node_min[l], bvh.node_max[l])
        dr = _slab(o, rd, t, bvh.node_min[l + 1], bvh.node_max[l + 1])
        swap = dr < dl
        near_n = jnp.where(swap, l + 1, l)
        far_n = jnp.where(swap, l, l + 1)
        near_d = jnp.minimum(dl, dr)
        far_d = jnp.maximum(dl, dr)
        near_hit = is_int & (near_d < BVH_FAR)
        far_hit = is_int & (far_d < BVH_FAR)
        push = near_hit & far_hit
        colp = jnp.clip(sp, 0, 63)
        olde = s["stack_node"][rows, colp]
        oldd = s["stack_dist"][rows, colp]
        stack_node = s["stack_node"].at[rows, colp].set(
            jnp.where(push, far_n, olde))
        stack_dist = s["stack_dist"].at[rows, colp].set(
            jnp.where(push, far_d, oldd))
        sp = jnp.where(push, sp + 1, sp)
        cur = jnp.where(is_int, jnp.where(near_hit, near_n, -1), cur)
        cur = jnp.where(is_leaf, -1, cur)
        return dict(
            cur=cur, sp=sp, stack_node=stack_node, stack_dist=stack_dist,
            t=t, u=u, v=v, prim=prim, done=done,
        )

    s = lax.while_loop(cond, body, state)
    ok = s["prim"] >= 0
    return Hits(
        t=jnp.where(ok, s["t"], BVH_FAR), u=s["u"], v=s["v"],
        prim=s["prim"], inst=jnp.full(R, -1, jnp.int32),
    )
