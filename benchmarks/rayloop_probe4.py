"""Probe 4: bisect the 80 ms/step lockstep body — which component blows up
in composition. Variants of the wide.py step body, K=32 fori_loop steps,
R=409600, bunny BVH8 tables, synthetic incoherent rays.

Run: python benchmarks/rayloop_probe4.py
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

K = 32


def main():
    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.core.intersect import moller_trumbore, tri_edges
    from tinybvh_tpu.core.vecmath import BVH_FAR
    from tinybvh_tpu.io.loaders import load_bin
    from tinybvh_tpu.layouts.mbvh import EMPTY_SLOT
    from tinybvh_tpu.traverse import wide

    tris = load_bin("/root/reference/testdata/bunny.bin")
    bvh8 = BVH(tris).bvh8
    jax.block_until_ready(bvh8.bounds)
    R = 409600
    rng = np.random.default_rng(0)
    lo = tris.reshape(-1, 3).min(0)
    hi = tris.reshape(-1, 3).max(0)
    o = jnp.asarray(lo + rng.random((R, 3)).astype(np.float32) * (hi - lo))
    d = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    rd = 1.0 / d
    _EMPTY = jnp.int32(-(2**31) + 1)
    S = 32
    v0t, e1t, e2t = tri_edges(bvh8.leaf_tris)
    v0t, e1t, e2t = map(jax.block_until_ready, (v0t, e1t, e2t))
    rows = jnp.arange(R)
    lanes8 = jnp.arange(8, dtype=jnp.int32)

    def make(variant):
        @jax.jit
        def run():
            state = dict(
                cur=jnp.zeros(R, jnp.int32), sp=jnp.zeros(R, jnp.int32),
                stack_e=jnp.zeros((S, R), jnp.int32),
                stack_d=jnp.zeros((S, R), jnp.float32),
                t=jnp.full((R,), BVH_FAR, jnp.float32),
                prim=jnp.full(R, -1, jnp.int32),
                done=jnp.zeros(R, bool),
            )

            def body(i, s):
                cur, sp, done, t = s["cur"], s["sp"], s["done"], s["t"]
                stack_e, stack_d, prim = s["stack_e"], s["stack_d"], s["prim"]
                if variant not in ("nopop",):
                    need_pop = (cur == _EMPTY) & ~done
                    can_pop = need_pop & (sp > 0)
                    nsp = jnp.where(can_pop, sp - 1, sp)
                    pe = wide._pop(stack_e, nsp, can_pop, 0)
                    pd = wide._pop(stack_d, nsp, can_pop, 0.0)
                    take = can_pop & (pd < t)
                    cur = jnp.where(take, pe, cur)
                    done = done | (need_pop & (sp == 0))
                    sp = nsp
                else:
                    done = done | (cur == _EMPTY)
                proc = (cur != _EMPTY) & ~done
                is_node = proc & (cur >= 0)
                is_leaf = proc & (cur < 0)
                nrow = jnp.where(is_node, cur, 0)
                dist = wide._slab8(o, rd, t, bvh8.bounds[nrow])
                kids = bvh8.child[nrow]
                valid = ((dist < BVH_FAR) & (kids != EMPTY_SLOT)
                         & is_node[:, None])
                dist = jnp.where(valid, dist, BVH_FAR)
                near = jnp.argmin(dist, axis=1)
                any_valid = valid.any(axis=1)
                next_node = jnp.where(any_valid, kids[rows, near], _EMPTY)
                if variant not in ("nopush", "nopop"):
                    pushmask = valid & (lanes8[None, :] != near[:, None])
                    stack_e, stack_d, sp = wide._push8(
                        stack_e, stack_d, sp, kids, dist, pushmask)
                if variant not in ("noleaf", "nopush", "nopop"):
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
                        jnp.take_along_axis(bvh8.leaf_prim[lrow],
                                            best[:, None], 1)[:, 0], prim)
                else:
                    # leaves: just mark done-ish by treating as EMPTY
                    next_node = jnp.where(is_leaf, _EMPTY, next_node)
                cur = jnp.where(is_node, next_node, _EMPTY)
                cur = jnp.where(is_leaf, _EMPTY, cur)
                return dict(cur=cur, sp=sp, stack_e=stack_e, stack_d=stack_d,
                            t=t, prim=prim, done=done)

            s = lax.fori_loop(0, K, body, state)
            return s["t"].sum() + s["sp"].sum() + s["prim"].sum()
        return run

    for variant in ("full", "noleaf", "nopush", "nopop"):
        fn = make(variant)
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 2
        print(f"{variant:7s}: {dt/K*1e3:8.2f} ms/step  (warm {warm:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
