"""Separate compile time from run time for the rayloop engine at bench
scale (R=409600) on the real TPU, sweeping the ladder depth. The first
full-scale call blew a 570 s window with no output — this tells us
whether that is XLA compile (then: persistent-cache it and move on) or
the run itself (then: the round cost model is wrong at large R)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tinybvh_tpu.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from tinybvh_tpu.api import BVH
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.io.loaders import load_bin
from tinybvh_tpu.traverse.rayloop import make_rayloop_tables, _run


def main():
    tris = load_bin("/root/reference/testdata/bunny.bin")
    bvh = BVH(tris)
    tb = make_rayloop_tables(bvh.bvh8, host=bvh._bvh8_host)
    jax.block_until_ready(tb.leaf_row)
    rng = np.random.default_rng(0)
    lo, hi = np.asarray(bvh.aabb[0]), np.asarray(bvh.aabb[1])
    print("tables ready", flush=True)

    for R, levels, min_size in ((409600, 1, 4096), (409600, 2, 25600),
                                (409600, 4, 4096)):
        o = (rng.uniform(0, 1, (R, 3)) * (hi - lo) + lo).astype(np.float32)
        d = rng.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rays = make_rays(o, d)
        far = jnp.asarray(1e30, jnp.float32)
        t0 = time.time()
        lowered = _run.lower(tb, rays, far, levels=levels,
                             min_size=min_size)
        print(f"R={R} levels={levels} lowered {time.time()-t0:.1f}s",
              flush=True)
        t0 = time.time()
        compiled = lowered.compile()
        print(f"  compiled {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        outs = compiled(tb, rays, far)
        jax.block_until_ready(outs["t"])
        dt = time.time() - t0
        print(f"  run1 {dt:.3f}s  {R/dt/1e6:.2f} MRays/s", flush=True)
        t0 = time.time()
        outs = compiled(tb, rays, far)
        jax.block_until_ready(outs["t"])
        dt = time.time() - t0
        hr = float(jnp.mean((outs["prim"] >= 0).astype(jnp.float32)))
        print(f"  run2 {dt:.3f}s  {R/dt/1e6:.2f} MRays/s hit={hr:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
