"""Probe the primitives the wavefront (BFS + compaction) traversal needs.

The while_loop lockstep traversal pays per-op dispatch × iterations × rays;
the wavefront design replaces it with ~tree-depth big dense steps built from
gather / cumsum / searchsorted / sort only. This probe measures those on the
target TPU. Run: python benchmarks/wavefront_primitives_probe.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp
import numpy as np

P = 1 << 20  # 1M


def timeit(f, *a, n=20):
    x = f(*a)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(*a)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    flat = jnp.asarray(np.random.rand(P * 8), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, P * 8, P), jnp.int32)
    counts = jnp.asarray(np.random.randint(0, 9, P), jnp.int32)
    keys = jnp.asarray(np.random.randint(0, 1 << 30, P), jnp.int32)
    vals = jnp.asarray(np.random.rand(P), jnp.float32)
    sorted_offs = jnp.cumsum(counts) - counts
    queries = jnp.asarray(np.sort(np.random.randint(0, int(4e6), P)), jnp.int32)

    @jax.jit
    def elem_gather(f, i):
        return f[i].sum()

    @jax.jit
    def cumsum(c):
        return jnp.cumsum(c)

    @jax.jit
    def searchsorted(o, q):
        return jnp.searchsorted(o, q, side="right").sum()

    @jax.jit
    def sort1(k):
        return jnp.sort(k)

    @jax.jit
    def argsort1(k):
        return jnp.argsort(k)

    @jax.jit
    def sort_kv(k, v):
        return jax.lax.sort((k, v), num_keys=1)

    print("1D elem gather (1M from 8M):", round(timeit(elem_gather, flat, idx), 3), "ms", flush=True)
    print("cumsum 1M:                  ", round(timeit(cumsum, counts), 3), "ms", flush=True)
    print("searchsorted 1M in 1M:      ", round(timeit(searchsorted, sorted_offs, queries), 3), "ms", flush=True)
    print("sort 1M i32:                ", round(timeit(sort1, keys), 3), "ms", flush=True)
    print("argsort 1M i32:             ", round(timeit(argsort1, keys), 3), "ms", flush=True)
    print("sort_kv 1M:                 ", round(timeit(sort_kv, keys, vals), 3), "ms", flush=True)


if __name__ == "__main__":
    main()
