"""Probe 5: validate the two lockstep fixes.

  flatleaf : full wide.py-style body, but every leaf gather flattened to
             rank-2 rows ((L,48) edges+prim row) — expect the 69 ms/step
             leaf term to collapse if rank-3 gathers were the culprit.
  rs_stack : same + stacks as (R,S) multiply-sum pop / one-hot push
             instead of (S,R) select chains.

Run: python benchmarks/rayloop_probe5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

K = 32
S = 16


def main():
    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.core.intersect import tri_edges
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

    v0t, e1t, e2t = tri_edges(bvh8.leaf_tris)  # (L,4,3)
    # flat leaf row: [v0|e1|e2] = (L, 36) f32 and (L,4) i32 prim
    leaf_row = jnp.concatenate(
        [v0t.reshape(-1, 12), e1t.reshape(-1, 12), e2t.reshape(-1, 12)],
        axis=1)
    leaf_prim = bvh8.leaf_prim
    jax.block_until_ready(leaf_row)
    rows = jnp.arange(R)
    lanes8 = jnp.arange(8, dtype=jnp.int32)
    iota_s = jnp.arange(S, dtype=jnp.int32)

    def mt_flat(o, d, row, t):
        v0 = row[:, 0:12].reshape(-1, 4, 3)
        e1 = row[:, 12:24].reshape(-1, 4, 3)
        e2 = row[:, 24:36].reshape(-1, 4, 3)
        ox, dx = o[:, None, :], d[:, None, :]
        h = jnp.cross(dx, e2)
        a = jnp.sum(e1 * h, axis=-1)
        f = jnp.where(jnp.abs(a) > 1e-12, 1.0 / a, 0.0)
        sv = ox - v0
        u = f * jnp.sum(sv * h, axis=-1)
        q = jnp.cross(sv, e1)
        v = f * jnp.sum(dx * q, axis=-1)
        th = f * jnp.sum(e2 * q, axis=-1)
        hit = ((jnp.abs(a) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
               & (th > 1e-6) & (th < t[:, None]))
        return hit, th, u, v

    def make(variant):
        @jax.jit
        def run():
            state = dict(
                cur=jnp.zeros(R, jnp.int32), sp=jnp.zeros(R, jnp.int32),
                stack_e=(jnp.zeros((R, S), jnp.int32) if variant == "rs_stack"
                         else jnp.zeros((S, R), jnp.int32)),
                stack_d=(jnp.zeros((R, S), jnp.float32)
                         if variant == "rs_stack"
                         else jnp.zeros((S, R), jnp.float32)),
                t=jnp.full((R,), BVH_FAR, jnp.float32),
                prim=jnp.full(R, -1, jnp.int32),
                done=jnp.zeros(R, bool),
            )

            def body(i, s):
                cur, sp, done, t = s["cur"], s["sp"], s["done"], s["t"]
                stack_e, stack_d, prim = s["stack_e"], s["stack_d"], s["prim"]
                need_pop = (cur == _EMPTY) & ~done
                can_pop = need_pop & (sp > 0)
                nsp = jnp.where(can_pop, sp - 1, sp)
                if variant == "rs_stack":
                    oh = (iota_s[None, :] == nsp[:, None]) & can_pop[:, None]
                    pe = jnp.sum(jnp.where(oh, stack_e, 0), axis=1)
                    pd = jnp.sum(jnp.where(oh, stack_d, 0.0), axis=1)
                else:
                    pe = wide._pop(stack_e, nsp, can_pop, 0)
                    pd = wide._pop(stack_d, nsp, can_pop, 0.0)
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
                valid = ((dist < BVH_FAR) & (kids != EMPTY_SLOT)
                         & is_node[:, None])
                dist = jnp.where(valid, dist, BVH_FAR)
                near = jnp.argmin(dist, axis=1)
                any_valid = valid.any(axis=1)
                next_node = jnp.where(any_valid, kids[rows, near], _EMPTY)
                pushmask = valid & (lanes8[None, :] != near[:, None])
                if variant == "rs_stack":
                    rank = (jnp.cumsum(pushmask.astype(jnp.int32), axis=1)
                            - pushmask)
                    target = jnp.where(pushmask, sp[:, None] + rank, -1)
                    target = jnp.where(target < S, target, -1)
                    # (R, S, 8) one-hot accumulation, folded over k
                    m = (iota_s[None, :, None] == target[:, None, :])
                    upd_e = jnp.sum(
                        jnp.where(m, kids[:, None, :], 0), axis=2)
                    upd_d = jnp.sum(
                        jnp.where(m, dist[:, None, :], 0.0), axis=2)
                    any_m = jnp.any(m, axis=2)
                    stack_e = jnp.where(any_m, upd_e, stack_e)
                    stack_d = jnp.where(any_m, upd_d, stack_d)
                    sp = sp + jnp.sum(
                        (target >= 0).astype(jnp.int32), axis=1)
                else:
                    stack_e, stack_d, sp = wide._push8(
                        stack_e, stack_d, sp, kids, dist, pushmask)
                lrow = jnp.where(is_leaf, -cur - 1, 0)
                hit, th, uh, vh = mt_flat(o, d, leaf_row[lrow], t)
                th = jnp.where(hit & is_leaf[:, None], th, BVH_FAR)
                best = jnp.argmin(th, axis=1)
                bt = jnp.min(th, axis=1)
                improved = bt < t
                t = jnp.where(improved, bt, t)
                prim = jnp.where(
                    improved,
                    jnp.take_along_axis(leaf_prim[lrow], best[:, None],
                                        1)[:, 0], prim)
                cur = jnp.where(is_node, next_node, _EMPTY)
                cur = jnp.where(is_leaf, _EMPTY, cur)
                return dict(cur=cur, sp=sp, stack_e=stack_e, stack_d=stack_d,
                            t=t, prim=prim, done=done)

            s = lax.fori_loop(0, K, body, state)
            return s["t"].sum() + s["sp"].sum() + s["prim"].sum()
        return run

    for variant in ("flatleaf", "rs_stack"):
        fn = make(variant)
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 2
        print(f"{variant:8s}: {dt/K*1e3:8.2f} ms/step  (warm {warm:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()

# TPU v5e results (R=409600, bunny, K=32):
#   probe2: full wide.py body          81 ms/step, avg ray depth 4.4 steps
#   probe4: noleaf 12 / nopush 8.3 / interior-only 0.41 ms/step
#   probe5: flatleaf 22.0 / rs_stack 19.8 ms/step
# Conclusions: (a) rank-3 table gathers ((L,4,3)[idx]) are ~70x slower than
# rank-2 row gathers — flatten every gathered table; (b) stack one-hot
# passes and the in-loop leaf path dominate what remains; (c) rays finish
# in ~4 steps on average vs ~100 lockstep max — compaction between rounds
# is the big lever. Engine design: k-step rounds + deferred dense leaf
# resolve + active-ray compaction (traverse/rayloop.py).
