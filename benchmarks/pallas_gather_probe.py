"""Probe: which gather patterns does Pallas/Mosaic support on this TPU?

Results feed the traversal-kernel design (see traverse/pallas_kernel.py).
Run: python benchmarks/pallas_gather_probe.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, C, R = 8192, 48, 4096
table = jnp.asarray(np.random.rand(M, C), jnp.float32)
idx = jnp.asarray(np.random.randint(0, M, R), jnp.int32)


def kernel(table_ref, idx_ref, out_ref):
    out_ref[:] = table_ref[idx_ref[:], :]


@jax.jit
def row_gather(table, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)


def main():
    try:
        out = row_gather(table, idx)
        jax.block_until_ready(out)
        ref = np.asarray(table)[np.asarray(idx)]
        print("row-gather OK, match:", np.allclose(np.asarray(out), ref),
              flush=True)
        t0 = time.perf_counter()
        for _ in range(50):
            out = row_gather(table, idx)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 50
        print(f"{dt*1e6:.0f} us -> {R/dt/1e6:.0f} Mlookups/s", flush=True)
    except Exception as e:
        print("row-gather FAILED:", str(e)[:500], flush=True)

    def kernel2(a_ref, col_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(
            a_ref[:], col_ref[:][:, None], axis=1
        )[:, 0]

    @jax.jit
    def lane_gather(a, col):
        return pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, col)

    a = jnp.asarray(np.random.rand(R, 32), jnp.float32)
    col = jnp.asarray(np.random.randint(0, 32, R), jnp.int32)
    try:
        out = lane_gather(a, col)
        jax.block_until_ready(out)
        ref = np.take_along_axis(np.asarray(a), np.asarray(col)[:, None], 1)[:, 0]
        print("lane-gather OK, match:", np.allclose(np.asarray(out), ref),
              flush=True)
    except Exception as e:
        print("lane-gather FAILED:", str(e)[:500], flush=True)


if __name__ == "__main__":
    main()
