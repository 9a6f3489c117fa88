"""Amortized in-jit op costs on the TPU (the only reliable methodology here:
standalone timings are polluted by ~27ms tunnel round-trips and apparent
result caching; so each op runs 20x inside one jit with a data dependency
chain, and the delta vs an empty chain gives the per-op cost).

Run: python benchmarks/op_cost_probe.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

P = 1 << 20
R = 409600
REPS = 20


def bench(name, make_body, *args):
    @jax.jit
    def run(*a):
        def body(i, carry):
            return make_body(i, carry, *a)
        out = lax.fori_loop(0, REPS, body, jnp.float32(0.0))
        return out

    x = float(np.asarray(run(*args)))  # compile+warm
    t0 = time.perf_counter()
    x = float(np.asarray(run(*args)))
    dt = (time.perf_counter() - t0) * 1e3
    print(f"{name:34s}: {dt/REPS:8.3f} ms/op  (total {dt:.1f} ms)", flush=True)


def main():
    keys = jnp.asarray(np.random.randint(0, R, P), jnp.int32)
    vals = jnp.asarray(np.random.rand(P), jnp.float32)
    tbl48 = jnp.asarray(np.random.rand(16384, 48), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 16384, P), jnp.int32)
    p8 = jnp.asarray(np.random.rand(P, 8), jnp.float32)

    bench("baseline (empty chain)", lambda i, c: c + 1.0)
    bench("elementwise 1M", lambda i, c, v: c + (v * (c + 2.0)).sum(),
          vals)
    bench("row gather 1M x48", lambda i, c, t, ix: c + t[(ix + i) % 16384].sum(),
          tbl48, idx)
    bench("scatter-min 1D 1M->400k",
          lambda i, c, k, v: c + jnp.zeros(R).at[(k + i) % R].min(v + c)[0],
          keys, vals)
    bench("scatter-add 1D 1M->400k",
          lambda i, c, k, v: c + jnp.zeros(R).at[(k + i) % R].add(v + c)[0],
          keys, vals)
    bench("segment_min 1M->400k",
          lambda i, c, k, v: c + jax.ops.segment_min(v + c, (k + i) % R, num_segments=R)[0],
          keys, vals)
    bench("sort 2op 1M",
          lambda i, c, k, v: c + lax.sort(((k + i) % R, v + c), num_keys=1)[1][0],
          keys, vals)
    bench("sort 3op 2key 1M",
          lambda i, c, k, v: c + lax.sort(((k + i) % R, v + c, (k * 2) % P), num_keys=2)[1][0],
          keys, vals)
    bench("sort 5op 2key 1M",
          lambda i, c, k, v: c + lax.sort(
              ((k + i) % R, v + c, v, v, (k * 2) % P), num_keys=2)[1][0],
          keys, vals)
    bench("cumsum 1M",
          lambda i, c, v: c + jnp.cumsum(v + c)[-1], vals)
    bench("searchsorted 1M in 1M",
          lambda i, c, v, k: c + jnp.searchsorted(
              jnp.cumsum(v), v + c).astype(jnp.float32)[0],
          vals, keys)
    bench("(P,8) elementwise x5",
          lambda i, c, a: c + ((a + c) * 1.1 + (a * a) - a / 2.0).sum(),
          p8)
    bench("(P,8) argmin+min",
          lambda i, c, a: c + jnp.argmin(a + c, axis=1).sum().astype(jnp.float32)
          + jnp.min(a + c, axis=1)[0],
          p8)


if __name__ == "__main__":
    main()
