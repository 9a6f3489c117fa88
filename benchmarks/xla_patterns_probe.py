"""Probe XLA-on-TPU costs of the primitives the traversal loop needs.

Findings drive traverse/wide.py's implementation strategy:
  * row gather  table[idx]            — node fetch
  * lane gather take_along_axis       — stack pop
  * one-hot lane gather (arithmetic)  — stack pop fallback
  * 2D scatter  arr.at[rows,col].set  — stack push (KNOWN SLOW: serial)
  * one-hot lane update (arithmetic)  — stack push replacement
Run: python benchmarks/xla_patterns_probe.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp
import numpy as np

R, S = 409600, 16
M = 16384


def timeit(f, *a, n=20):
    x = f(*a)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(*a)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    arr = jnp.zeros((R, S), jnp.float32)
    col = jnp.asarray(np.random.randint(0, S, R), jnp.int32)
    val = jnp.ones(R, jnp.float32)
    table = jnp.asarray(np.random.rand(M, 48), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, M, R), jnp.int32)
    lanes = jnp.arange(S, dtype=jnp.int32)

    @jax.jit
    def row_gather(t, i):
        return t[i].sum()

    @jax.jit
    def lane_gather_taa(a, c):
        return jnp.take_along_axis(a, c[:, None], axis=1)[:, 0].sum()

    @jax.jit
    def lane_gather_onehot(a, c):
        return jnp.sum(jnp.where(lanes[None, :] == c[:, None], a, 0.0))

    @jax.jit
    def lane_update_onehot(a, c, v):
        oh = lanes[None, :] == c[:, None]
        return jnp.where(oh, v[:, None], a)

    print(f"row_gather({R}x48 from {M}):", round(timeit(row_gather, table, idx), 3), "ms", flush=True)
    print("lane_gather take_along:", round(timeit(lane_gather_taa, arr, col), 3), "ms", flush=True)
    print("lane_gather one-hot:   ", round(timeit(lane_gather_onehot, arr, col), 3), "ms", flush=True)
    print("lane_update one-hot:   ", round(timeit(lane_update_onehot, arr, col, val), 3), "ms", flush=True)


if __name__ == "__main__":
    main()
