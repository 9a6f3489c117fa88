"""Stage-level timing of the device LBVH build (builders/lbvh.py).

BENCH_r03 measured the fully-jitted Morton+Karras build at 0.27-0.53
Mtris/s — pathological for an embarrassingly parallel algorithm. This
probe times cumulative prefixes of the same graph (mirrors lbvh.py
stage for stage) so the dominant stage is identified by subtraction:

  S0  morton codes + stable argsort
  S1  + Karras direction/range binary searches (the ~100 scan
      iterations, each with data-dependent (N,) gathers)
  S2  + range-AABB doubling sweep (K gather levels)
  S3  full build_lbvh

Usage: python benchmarks/lbvh_probe.py [n_tris]
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
from jax import lax

from tinybvh_tpu.builders.lbvh import _bit_length_u32, build_lbvh
from tinybvh_tpu.core.vecmath import morton_encode_3d
from tinybvh_tpu.io.loaders import random_tris


def _codes_order(tris):
    fmin = jnp.min(tris, axis=1)
    fmax = jnp.max(tris, axis=1)
    cent = (fmin + fmax) * 0.5
    smin = jnp.min(cent, axis=0)
    smax = jnp.max(cent, axis=0)
    scale = 1023.0 / jnp.maximum(smax - smin, 1e-20)
    q = jnp.clip((cent - smin) * scale, 0, 1023).astype(jnp.uint32)
    codes = morton_encode_3d(q)
    order = jnp.argsort(codes, stable=True)
    return codes[order], order, fmin, fmax


def _ansv(scode, N):
    """Mirrors lbvh.py's channel-scan ANSV (r4)."""
    from tinybvh_tpu.builders.lbvh import _N_CHAN
    idx = jnp.arange(N - 1, dtype=jnp.int32)
    x = scode[:-1] ^ scode[1:]
    tie = x == 0
    y = idx.astype(jnp.uint32) ^ (idx + 1).astype(jnp.uint32)
    D = jnp.where(tie, 64 - _bit_length_u32(y), 32 - _bit_length_u32(x))
    chan = jnp.arange(_N_CHAN, dtype=jnp.int32)[:, None]
    onehot = D[None, :] == chan
    pos = jnp.where(onehot, idx[None, :], -1)
    lastpos = lax.cummax(pos, axis=1)
    lastpos_excl = jnp.concatenate(
        [jnp.full((_N_CHAN, 1), -1, lastpos.dtype), lastpos[:, :-1]], axis=1)
    a = jnp.max(jnp.where(chan <= D[None, :], lastpos_excl, -1), axis=0)
    BIG = jnp.int32(2**30)
    posr = jnp.where(onehot, idx[None, :], BIG)
    nextpos = lax.cummin(posr[:, ::-1], axis=1)[:, ::-1]
    nextpos_excl = jnp.concatenate(
        [nextpos[:, 1:], jnp.full((_N_CHAN, 1), BIG, nextpos.dtype)], axis=1)
    b_raw = jnp.min(jnp.where(chan < D[None, :], nextpos_excl, BIG), axis=0)
    return D, a, jnp.where(b_raw >= BIG, N - 1, b_raw)


def _aabb_sweep(order, fmin, fmax, a, b, N):
    sorted_fmin = fmin[order]
    sorted_fmax = fmax[order]
    rlo = a + 1
    rhi = b
    rlen = rhi - rlo + 1
    klev = _bit_length_u32(rlen.astype(jnp.uint32)) - 1
    K = max(1, int(np.ceil(np.log2(max(N, 2)))) + 1)
    amin = jnp.zeros((N - 1, 3), jnp.float32)
    amax = jnp.zeros((N - 1, 3), jnp.float32)
    Tmin, Tmax = sorted_fmin, sorted_fmax
    ar = jnp.arange(N, dtype=jnp.int32)
    for k in range(K):
        take = (klev == k)[:, None]
        b_ix = rhi - (1 << k) + 1
        amin = jnp.where(take, jnp.minimum(Tmin[rlo], Tmin[b_ix]), amin)
        amax = jnp.where(take, jnp.maximum(Tmax[rlo], Tmax[b_ix]), amax)
        if (1 << (k + 1)) <= N:
            nxt = jnp.minimum(ar + (1 << k), N - 1)
            Tmin = jnp.minimum(Tmin, Tmin[nxt])
            Tmax = jnp.maximum(Tmax, Tmax[nxt])
    return amin, amax


def _time(fn, label, n_tris):
    out = fn()
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(4)]
        np.asarray(jnp.ravel(jax.tree_util.tree_leaves(outs[-1])[0])[:1])
        best = min(best, (time.perf_counter() - t0) / 4)
        time.sleep(1.0)
    print(f"{label}: {best * 1e3:8.2f} ms   ({n_tris / best / 1e6:7.3f} "
          f"Mtris/s)", flush=True)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    tris = random_tris(n, seed=1)
    tris_dev = jax.device_put(jnp.asarray(tris, jnp.float32))
    jax.block_until_ready(tris_dev)
    N = n

    s0 = jax.jit(lambda t: _codes_order(t)[0])
    s1 = jax.jit(lambda t: _ansv(_codes_order(t)[0], N)[1])

    def s2_f(t):
        scode, order, fmin, fmax = _codes_order(t)
        D, a, b = _ansv(scode, N)
        return _aabb_sweep(order, fmin, fmax, a, b, N)[0]

    s2 = jax.jit(s2_f)
    s3 = jax.jit(lambda t: build_lbvh(t).node_min)

    t0 = _time(lambda: s0(tris_dev), "S0 codes+sort      ", n)
    t1 = _time(lambda: s1(tris_dev), "S1 +D+ANSV         ", n)
    t2 = _time(lambda: s2(tris_dev), "S2 +aabb sweep     ", n)
    t3 = _time(lambda: s3(tris_dev), "S3 full build      ", n)
    print(f"deltas: ansv={1e3 * (t1 - t0):.2f} ms, "
          f"aabb={1e3 * (t2 - t1):.2f} ms, assembly={1e3 * (t3 - t2):.2f} ms")


if __name__ == "__main__":
    main()
