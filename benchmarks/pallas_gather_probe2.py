"""Probe 2: per-lane dynamic gather formulations inside Pallas on this TPU.

The per-ray traversal kernel needs: for 128-256 rays (lanes), fetch each
ray's current node's fields from a node table. Candidates:

  A. take_along_axis along LANES on a vreg-shaped block (F, 128) with a
     broadcast index (F, 128)  -> Mosaic tpu.DynamicGatherOp?
  B. same but table (F, 1024) (multi-vreg along lanes)
  C. take_along_axis along SUBLANES: table (N, 128), idx (1, 128) per lane
  D. one-hot matmul gather (256, N) @ (N, F) bf16 - timing reference
  E. jnp.take of a flat (N,) table with (8,128) indices

Run: python benchmarks/pallas_gather_probe2.py
"""
import sys, os, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args, ref=None, iters=0):
    try:
        out = jax.block_until_ready(fn(*args))
        ok = True if ref is None else bool(
            np.allclose(np.asarray(out), ref, atol=1e-5))
        msg = f"{name}: OK match={ok}"
        if iters:
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            msg += f"  {dt*1e6:.1f} us/call"
        print(msg, flush=True)
        return True
    except Exception as e:
        first = str(e).split("\n")[0][:300]
        print(f"{name}: FAILED {type(e).__name__}: {first}", flush=True)
        return False


# ---- A: lane gather on one vreg-block (F=8 sublanes, 128 lanes) ----------
F, L = 8, 128
tblA = np.random.rand(F, L).astype(np.float32)
idxA = np.random.randint(0, L, (F, L)).astype(np.int32)

def kA(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

fA = jax.jit(lambda t, i: pl.pallas_call(
    kA, out_shape=jax.ShapeDtypeStruct((F, L), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i))
run("A  lane-gather (8,128)", fA, jnp.asarray(tblA), jnp.asarray(idxA),
    ref=np.take_along_axis(tblA, idxA, 1))

# ---- B: lane gather across multiple vregs (8, 1024) -----------------------
L2 = 1024
tblB = np.random.rand(F, L2).astype(np.float32)
idxB = np.random.randint(0, L2, (F, L2)).astype(np.int32)

def kB(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

fB = jax.jit(lambda t, i: pl.pallas_call(
    kB, out_shape=jax.ShapeDtypeStruct((F, L2), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i))
run("B  lane-gather (8,1024)", fB, jnp.asarray(tblB), jnp.asarray(idxB),
    ref=np.take_along_axis(tblB, idxB, 1))

# ---- B2: gather only 128 outputs from a (8,1024) table --------------------
idxB2 = np.random.randint(0, L2, (F, L)).astype(np.int32)

def kB2(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

fB2 = jax.jit(lambda t, i: pl.pallas_call(
    kB2, out_shape=jax.ShapeDtypeStruct((F, L), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i))
run("B2 lane-gather (8,1024)->(8,128)", fB2, jnp.asarray(tblB),
    jnp.asarray(idxB2), ref=np.take_along_axis(tblB, idxB2, 1))

# ---- C: sublane gather: table (N,128), per-lane row index -----------------
N = 512
tblC = np.random.rand(N, L).astype(np.float32)
idxC = np.random.randint(0, N, (8, L)).astype(np.int32)

def kC(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

fC = jax.jit(lambda t, i: pl.pallas_call(
    kC, out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i))
run("C  sublane-gather (512,128) ax0", fC, jnp.asarray(tblC),
    jnp.asarray(idxC), ref=np.take_along_axis(tblC, idxC, 0))

# ---- E: flat take ----------------------------------------------------------
flat = np.random.rand(2048).astype(np.float32)
idxE = np.random.randint(0, 2048, (8, L)).astype(np.int32)

def kE(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

fE = jax.jit(lambda t, i: pl.pallas_call(
    kE, out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i))
run("E  flat-take (2048,)[8,128]", fE, jnp.asarray(flat), jnp.asarray(idxE),
    ref=flat[idxE])

# ---- timing of the winners -------------------------------------------------
print("--- timing ---", flush=True)
# A timing: 100 chained gathers to amortize dispatch
def kA100(t_ref, i_ref, o_ref):
    acc = t_ref[:]
    idx = i_ref[:]
    for _ in range(100):
        acc = jnp.take_along_axis(acc, idx, axis=1)
    o_ref[:] = acc

fA100 = jax.jit(lambda t, i: pl.pallas_call(
    kA100, out_shape=jax.ShapeDtypeStruct((F, L), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i))
run("A  x100 chained", fA100, jnp.asarray(tblA), jnp.asarray(idxA), iters=20)

# C timing chained
def kC100(t_ref, i_ref, o_ref):
    idx = i_ref[:]
    acc = jnp.zeros((8, L), jnp.float32)
    for s in range(100):
        g = jnp.take_along_axis(t_ref[:], (idx + s) % N, axis=0)
        acc = acc + g
    o_ref[:] = acc

fC100 = jax.jit(lambda t, i: pl.pallas_call(
    kC100, out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i))
run("C  x100 chained (512,128) ax0", fC100, jnp.asarray(tblC),
    jnp.asarray(idxC), iters=20)

# D: one-hot matmul gather timing (256 rays, N nodes, F cols), bf16
for NN in (2048, 8192):
    FF = 96
    tblD = jnp.asarray(np.random.rand(NN, FF), jnp.bfloat16)
    idxD = jnp.asarray(np.random.randint(0, NN, 256), jnp.int32)

    def kD(t_ref, i_ref, o_ref):
        ids = jax.lax.broadcasted_iota(jnp.int32, (256, NN), 1)
        oh = (ids == i_ref[:][:, None]).astype(jnp.bfloat16)
        acc = jnp.zeros((256, FF), jnp.float32)
        for _ in range(10):
            acc += jnp.dot(oh, t_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = acc

    fD = jax.jit(lambda t, i: pl.pallas_call(
        kD, out_shape=jax.ShapeDtypeStruct((256, FF), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i))
    run(f"D  one-hot x10 (256x{NN})@({NN}x{FF})", fD, tblD, idxD, iters=20)

# Results on TPU v5e (round 5, via tunnel; ~2ms dispatch floor dominates
# the timed rows, so timings are upper bounds only):
#   A  lane-gather (8,128):            OK   (single-vreg lane gather works)
#   B  lane-gather (8,1024):           FAILED MosaicError (multi-vreg lanes)
#   B2 lane-gather (8,1024)->(8,128):  FAILED AssertionError
#   C  sublane-gather (512,128) ax0:   FAILED AssertionError
#   E  flat-take (2048,)[8,128]:       FAILED NotImplementedError
#   A  x100 chained:                   2185 us/call  (incl ~2ms floor)
#   D  one-hot x10 (256x2048)@(2048x96):  2194 us/call
#   D  one-hot x10 (256x8192)@(8192x96):  1649 us/call
# Conclusion: per-lane dynamic gather is only available within one 128-lane
# vreg block; everything wider must be a one-hot matmul (MXU) or a
# block-loop of single-vreg gathers + selects.
