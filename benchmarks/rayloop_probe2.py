"""Probe 2: where does the lockstep wide.py engine's time go?

Replaces the while_loop with a fixed-K fori_loop and reports (a) rays
still active after K steps, (b) wall time vs K — separating per-step
cost from straggler step count. Uses the bench's real camera so the
diffuse batch matches BENCH_r04's.

Run: python benchmarks/rayloop_probe2.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    from bench import _camera_rays
    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.core.rays import make_rays, Rays, RAY_MASK_ALL
    from tinybvh_tpu.core.vecmath import safe_rcp, BVH_FAR
    from tinybvh_tpu.io.loaders import load_bin
    from tinybvh_tpu.core.intersect import moller_trumbore, tri_edges
    from tinybvh_tpu.layouts.mbvh import EMPTY_SLOT
    from tinybvh_tpu.traverse import wide

    tris = load_bin("/root/reference/testdata/bunny.bin")
    bvh = BVH(tris)
    jax.block_until_ready(bvh.bvh8.bounds)
    print(f"nodes={bvh.bvh8.n_nodes} leaves={bvh.bvh8.n_leaves}", flush=True)

    o, d, center, extent = _camera_rays(np.asarray(bvh.aabb[0]),
                                        np.asarray(bvh.aabb[1]))
    rays = make_rays(o, d)
    R = d.shape[0]

    hits = wide.intersect_bvh8(bvh.bvh8, rays)
    jax.block_until_ready(hits.t)
    print(f"primary hit_rate="
          f"{float(jnp.mean((hits.prim >= 0).astype(jnp.float32))):.3f}",
          flush=True)

    tris_dev = bvh.tris

    @jax.jit
    def diffuse_rays(prim, t, key):
        ht = jnp.where(jnp.isfinite(t) & (t < 1e29), t, 1.0)
        p = rays.o + ht[:, None] * rays.d
        tri = tris_dev[jnp.maximum(prim, 0)]
        nrm = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        nrm = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
        nrm = jnp.where((jnp.sum(nrm * rays.d, axis=1) > 0)[:, None],
                        -nrm, nrm)
        dd = jax.random.normal(key, (R, 3), jnp.float32)
        dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
        dd = jnp.where((jnp.sum(dd * nrm, axis=1) < 0)[:, None], -dd, dd)
        mask = jnp.full(R, RAY_MASK_ALL, jnp.int32)
        return p + nrm * 1e-3, dd, safe_rcp(dd), mask

    do_, dd_, rd_, mk_ = diffuse_rays(hits.prim, hits.t, jax.random.PRNGKey(1))
    drays = Rays(o=do_, d=dd_, rd=rd_, mask=mk_)
    jax.block_until_ready(drays.o)

    bvh8 = bvh.bvh8
    _EMPTY = jnp.int32(-(2**31) + 1)
    S = 32

    @partial(jax.jit, static_argnames=("K",))
    def k_steps(rays, K):
        o, d, rd = rays.o, rays.d, rays.rd
        rows = jnp.arange(R)
        t0 = jnp.full((R,), BVH_FAR, jnp.float32)
        v0t, e1t, e2t = tri_edges(bvh8.leaf_tris)
        state = dict(
            cur=jnp.zeros(R, jnp.int32), sp=jnp.zeros(R, jnp.int32),
            stack_e=jnp.zeros((S, R), jnp.int32),
            stack_d=jnp.zeros((S, R), jnp.float32),
            t=t0, u=jnp.zeros(R, jnp.float32), v=jnp.zeros(R, jnp.float32),
            prim=jnp.full(R, -1, jnp.int32), done=jnp.zeros(R, bool),
            cost=jnp.zeros(R, jnp.float32),
        )

        def body(i, s):
            cur, sp, done, t = s["cur"], s["sp"], s["done"], s["t"]
            need_pop = (cur == _EMPTY) & ~done
            can_pop = need_pop & (sp > 0)
            nsp = jnp.where(can_pop, sp - 1, sp)
            pe = wide._pop(s["stack_e"], nsp, can_pop, 0)
            pd = wide._pop(s["stack_d"], nsp, can_pop, 0.0)
            take = can_pop & (pd < t)
            cur = jnp.where(take, pe, cur)
            done = done | (need_pop & (sp == 0))
            sp = nsp
            proc = (cur != _EMPTY) & ~done
            is_node = proc & (cur >= 0)
            is_leaf = proc & (cur < 0)
            nrow = jnp.where(is_node, cur, 0)
            dist = wide._slab8(o, rd, t, bvh8.bounds[nrow])
            kids = bvh8.child[nrow]
            valid = (dist < BVH_FAR) & (kids != EMPTY_SLOT) & is_node[:, None]
            dist = jnp.where(valid, dist, BVH_FAR)
            near = jnp.argmin(dist, axis=1)
            any_valid = valid.any(axis=1)
            next_node = jnp.where(any_valid, kids[rows, near], _EMPTY)
            lanes8 = jnp.arange(8, dtype=jnp.int32)
            pushmask = valid & (lanes8[None, :] != near[:, None])
            stack_e, stack_d, sp = wide._push8(
                s["stack_e"], s["stack_d"], sp, kids, dist, pushmask)
            lrow = jnp.where(is_leaf, -cur - 1, 0)
            hit, th, uh, vh = moller_trumbore(
                o[:, None, :], d[:, None, :], v0t[lrow], e1t[lrow],
                e2t[lrow], t[:, None])
            th = jnp.where(hit & is_leaf[:, None], th, BVH_FAR)
            best = jnp.argmin(th, axis=1)
            bt = jnp.min(th, axis=1)
            improved = bt < t
            t = jnp.where(improved, bt, t)
            prim = jnp.where(
                improved,
                jnp.take_along_axis(bvh8.leaf_prim[lrow], best[:, None],
                                    1)[:, 0], s["prim"])
            cur = jnp.where(is_node, next_node, _EMPTY)
            cost = s["cost"] + jnp.where(proc, 1.0, 0.0)
            return dict(cur=cur, sp=sp, stack_e=stack_e, stack_d=stack_d,
                        t=t, u=s["u"], v=s["v"], prim=prim, done=done,
                        cost=cost)

        s = lax.fori_loop(0, K, body, state)
        return (jnp.sum((~s["done"]).astype(jnp.int32)),
                jnp.sum(s["cost"]), s["cost"].max())

    for K in (32, 64, 128, 256, 512):
        t0 = time.perf_counter()
        alive, tot, mx = k_steps(drays, K)
        jax.block_until_ready(alive)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2):
            alive, tot, mx = k_steps(drays, K)
        jax.block_until_ready(alive)
        dt = (time.perf_counter() - t0) / 2
        print(f"K={K:4d}: {dt*1e3:7.1f} ms ({dt/K*1e6:6.1f} us/step)  "
              f"alive={int(alive):6d}  avg_steps={float(tot)/R:6.1f}  "
              f"(warm {warm:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
