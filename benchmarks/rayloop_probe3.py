"""Probe 3: component costs of one lockstep step at R=409600 on TPU.

Times, in isolation (each in its own tiny fori_loop to amortize dispatch):
  gather48   bounds[idx]        (R,48) from (5930,48)
  gather8    child[idx]         (R,8)
  gatherL    leaf tri edges     3x(R,4,3) + (R,4) from (21249,4,3)
  slab       _slab8 on pre-gathered rows
  push8      one _push8 into (32,R) stacks
  pop        two _pop
  mt         4-wide moller_trumbore on pre-gathered rows
Run: python benchmarks/rayloop_probe3.py
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

R = 409600
M = 5930
L = 21249
S = 32


def timed(name, fn, *args, iters=8):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:8.2f} ms/loop  ({dt/16*1e3:7.3f} ms/step)",
          flush=True)


def main():
    from tinybvh_tpu.traverse import wide
    from tinybvh_tpu.core.intersect import moller_trumbore

    rng = np.random.default_rng(0)
    bounds = jnp.asarray(rng.random((M, 48), np.float32))
    child = jnp.asarray(rng.integers(0, M, (M, 8)).astype(np.int32))
    v0 = jnp.asarray(rng.random((L, 4, 3), np.float32))
    e1 = jnp.asarray(rng.random((L, 4, 3), np.float32))
    e2 = jnp.asarray(rng.random((L, 4, 3), np.float32))
    lp = jnp.asarray(rng.integers(0, 69630, (L, 4)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, M, R).astype(np.int32))
    lidx = jnp.asarray(rng.integers(0, L, R).astype(np.int32))
    o = jnp.asarray(rng.random((R, 3), np.float32))
    d = jnp.asarray(rng.random((R, 3), np.float32) - 0.5)
    rd = 1.0 / d
    t = jnp.full((R,), 1e30, jnp.float32)
    se = jnp.zeros((S, R), jnp.int32)
    sd = jnp.zeros((S, R), jnp.float32)
    sp = jnp.asarray(rng.integers(0, 8, R).astype(np.int32))
    kids = jnp.asarray(rng.integers(0, M, (R, 8)).astype(np.int32))
    dist = jnp.asarray(rng.random((R, 8), np.float32))
    pm = dist < 0.5
    browsR = jnp.asarray(rng.random((R, 48), np.float32))

    # every op wrapped in a 16-iteration loop, result folded to keep deps
    def loop16(f):
        @jax.jit
        def g(*a):
            def body(i, acc):
                return acc + f(i, *a)
            return lax.fori_loop(0, 16, body, jnp.zeros((), jnp.float32))
        return g

    timed("gather48", loop16(
        lambda i, b, ix: b[(ix + i) % M].sum()), bounds, idx)
    timed("gather8 ", loop16(
        lambda i, c, ix: c[(ix + i) % M].sum().astype(jnp.float32)),
        child, idx)
    timed("gatherL ", loop16(
        lambda i, v, ix: v[(ix + i) % L].sum()), v0, lidx)
    timed("slab    ", loop16(
        lambda i, br: wide._slab8(o, rd, t, br + i).sum()), browsR)

    def push_once(i, se, sd):
        a, b, nsp = wide._push8(se, sd, sp, kids, dist + i, pm)
        return a.sum().astype(jnp.float32) + b.sum()
    timed("push8   ", loop16(push_once), se, sd)

    def pop_once(i, se, sd):
        pe = wide._pop(se, sp + (i % 2), sp > 0, 0)
        pd = wide._pop(sd, sp + (i % 2), sp > 0, 0.0)
        return pe.sum().astype(jnp.float32) + pd.sum()
    timed("pop     ", loop16(pop_once), se, sd)

    v0r, e1r, e2r = v0[lidx], e1[lidx], e2[lidx]

    def mt_once(i, v0r):
        hit, th, uh, vh = moller_trumbore(
            o[:, None, :], d[:, None, :], v0r + i, e1r, e2r, t[:, None])
        return th.sum()
    timed("mt      ", loop16(mt_once), v0r)

    # combined gather+slab as the engine does it (nrow dependent gather)
    def gslab(i, b, ix):
        return wide._slab8(o, rd, t, b[(ix + i) % M]).sum()
    timed("g+slab  ", loop16(gslab), bounds, idx)


if __name__ == "__main__":
    main()
