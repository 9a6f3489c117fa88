"""Pallas TPU kernel: dense per-tile leaf resolve (packet phase 2).

The packet pipeline's hot loop — every ray of a 256-ray tile tested against
the tile's K candidate leaves (4 tris each) — is pure dense math with NO
data-dependent indexing, exactly what Mosaic can schedule well. The XLA
version materializes (T, 256, K, 4)-shaped intermediates through HBM
(~50 GB per frame); this kernel keeps the whole working set in VMEM:

  grid = (T,) tiles; per step the kernel sees
    rays   (3, 256)+(3, 256)   o, d (transposed: rays on lanes)
    geom   (K, 48)             [v0|e1|e2|pad]×4 tris per leaf row
    rows   (K,)                leaf row ids (SMEM, scalar-read)
  and loops leaves with (4, 256)-shaped Möller–Trumbore on the VPU,
  folding a running per-ray (min-t, packed winner).

Counterpart of the dense 4-tri leaf loops in BVH8_CPU::Intersect
(tiny_bvh.h:7290-7360), restructured per SURVEY.md §7 step 4.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinybvh_tpu.core.vecmath import BVH_FAR

TILE = 256


def _kernel(o_ref, d_ref, geom_ref, live_ref, rows_ref, t_ref, pk_ref):
    K = geom_ref.shape[1]

    ox = o_ref[0, 0, :]  # (256,)
    oy = o_ref[0, 1, :]
    oz = o_ref[0, 2, :]
    dx = d_ref[0, 0, :]
    dy = d_ref[0, 1, :]
    dz = d_ref[0, 2, :]

    def leaf_body(j, carry):
        best_t, best_pk = carry  # (256,), (256,) i32
        g = geom_ref[0, j, :]  # (48,)
        live = live_ref[0, 0, j]
        row = rows_ref[0, 0, j]
        # 4 triangles, fields packed x-major (see pack_leaf_geom)
        v0x = g[0:4][:, None]
        v0y = g[4:8][:, None]
        v0z = g[8:12][:, None]
        e1x = g[12:16][:, None]
        e1y = g[16:20][:, None]
        e1z = g[20:24][:, None]
        e2x = g[24:28][:, None]
        e2y = g[28:32][:, None]
        e2z = g[32:36][:, None]
        # h = d × e2  → (4, 256)
        hx = dy[None, :] * e2z - dz[None, :] * e2y
        hy = dz[None, :] * e2x - dx[None, :] * e2z
        hz = dx[None, :] * e2y - dy[None, :] * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        okd = jnp.abs(det) > 1e-9
        inv = 1.0 / jnp.where(okd, det, 1.0)
        sx = ox[None, :] - v0x
        sy = oy[None, :] - v0y
        sz = oz[None, :] - v0z
        u = (sx * hx + sy * hy + sz * hz) * inv
        # q = s × e1
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = (dx[None, :] * qx + dy[None, :] * qy + dz[None, :] * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = okd & (u >= 0) & (v >= 0) & (u + v <= 1) & (tt > 0) & (live > 0)
        tt = jnp.where(hit, tt, BVH_FAR)  # (4, 256)
        lane = jnp.argmin(tt, axis=0)  # (256,)
        m = jnp.min(tt, axis=0)
        better = m < best_t
        pk = row * 4 + lane.astype(jnp.int32)
        return (jnp.where(better, m, best_t),
                jnp.where(better, pk, best_pk))

    t0 = jnp.full((TILE,), BVH_FAR, jnp.float32)
    p0 = jnp.zeros((TILE,), jnp.int32)
    bt, bp = jax.lax.fori_loop(0, K, leaf_body, (t0, p0))
    t_ref[0, 0, :] = bt
    pk_ref[0, 0, :] = bp


def _kernel_v2(o_ref, d_ref, geom_ref, t_ref, idx_ref):
    """Leaf-blocked variant: 32 triangles (8 leaves) per fori iteration as
    one (32, 256) Möller–Trumbore. Geometry arrives as per-TRIANGLE rows
    (4L, 12) = [v0|e1|e2|pad], so field extraction is pure slicing (Mosaic
    cannot reshape across sublanes/lanes). Dead entries carry zeroed
    geometry (det = 0 → never hit); the winner is reported as tri position
    in the tile's list (caller resolves to leaf row + lane)."""
    K4 = geom_ref.shape[1]  # = K·4 triangles

    ox = o_ref[0, 0, :]
    oy = o_ref[0, 1, :]
    oz = o_ref[0, 2, :]
    dx = d_ref[0, 0, :]
    dy = d_ref[0, 1, :]
    dz = d_ref[0, 2, :]

    def blk(j, carry):
        best_t, best_i = carry
        g = geom_ref[0, pl.ds(j * 32, 32), :]  # (32, 12)
        v0x = g[:, 0:1]
        v0y = g[:, 1:2]
        v0z = g[:, 2:3]
        e1x = g[:, 3:4]
        e1y = g[:, 4:5]
        e1z = g[:, 5:6]
        e2x = g[:, 6:7]
        e2y = g[:, 7:8]
        e2z = g[:, 8:9]
        hx = dy[None, :] * e2z - dz[None, :] * e2y
        hy = dz[None, :] * e2x - dx[None, :] * e2z
        hz = dx[None, :] * e2y - dy[None, :] * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        okd = jnp.abs(det) > 1e-9
        inv = 1.0 / jnp.where(okd, det, 1.0)
        sx = ox[None, :] - v0x
        sy = oy[None, :] - v0y
        sz = oz[None, :] - v0z
        u = (sx * hx + sy * hy + sz * hz) * inv
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = (dx[None, :] * qx + dy[None, :] * qy + dz[None, :] * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = okd & (u >= 0) & (v >= 0) & (u + v <= 1) & (tt > 0)
        tt = jnp.where(hit, tt, BVH_FAR)  # (32, 256)
        am = jnp.argmin(tt, axis=0)  # (256,)
        m = jnp.min(tt, axis=0)
        better = m < best_t
        pk = j * 32 + am.astype(jnp.int32)  # global tri position in list
        return (jnp.where(better, m, best_t),
                jnp.where(better, pk, best_i))

    t0 = jnp.full((TILE,), BVH_FAR, jnp.float32)
    p0 = jnp.zeros((TILE,), jnp.int32)
    bt, bp = jax.lax.fori_loop(0, K4 // 32, blk, (t0, p0))
    t_ref[0, 0, :] = bt
    idx_ref[0, 0, :] = bp


def _kernel_v3(o_ref, d_ref, geom_ref, t_ref, idx_ref):
    """Wide-block variant of v2: B=256 triangles per fori iteration as one
    (256, 256) Möller–Trumbore, and NO reductions inside the loop — each
    (sublane, ray) slot keeps its own running (best t, best block), so the
    loop is pure elementwise VPU math; one cross-sublane argmin at the end
    resolves the winner. 8x fewer iterations and 2 fewer reductions per
    iteration than v2.

    MEASURED SLOWER than v2 on the bunny bench (2.78 vs 3.41 MRays/s
    end-to-end): the (256, 256) f32 loop carries + two full-size
    where-updates per iteration outweigh the saved reductions. Kept for
    reference/retuning; leaf_resolve_v2 defaults to the v2 kernel."""
    K4 = geom_ref.shape[1]
    B = 256 if K4 % 256 == 0 else (128 if K4 % 128 == 0 else 32)

    ox = o_ref[0, 0, :]
    oy = o_ref[0, 1, :]
    oz = o_ref[0, 2, :]
    dx = d_ref[0, 0, :]
    dy = d_ref[0, 1, :]
    dz = d_ref[0, 2, :]

    def blk(j, carry):
        best_t, best_j = carry  # (B, 256) f32 / i32
        g = geom_ref[0, pl.ds(j * B, B), :]  # (B, 12)
        v0x = g[:, 0:1]
        v0y = g[:, 1:2]
        v0z = g[:, 2:3]
        e1x = g[:, 3:4]
        e1y = g[:, 4:5]
        e1z = g[:, 5:6]
        e2x = g[:, 6:7]
        e2y = g[:, 7:8]
        e2z = g[:, 8:9]
        hx = dy[None, :] * e2z - dz[None, :] * e2y
        hy = dz[None, :] * e2x - dx[None, :] * e2z
        hz = dx[None, :] * e2y - dy[None, :] * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        okd = jnp.abs(det) > 1e-9
        inv = 1.0 / jnp.where(okd, det, 1.0)
        sx = ox[None, :] - v0x
        sy = oy[None, :] - v0y
        sz = oz[None, :] - v0z
        u = (sx * hx + sy * hy + sz * hz) * inv
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = (dx[None, :] * qx + dy[None, :] * qy + dz[None, :] * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = okd & (u >= 0) & (v >= 0) & (u + v <= 1) & (tt > 0)
        tt = jnp.where(hit, tt, BVH_FAR)  # (B, 256)
        better = tt < best_t
        return (jnp.where(better, tt, best_t),
                jnp.where(better, j, best_j))

    t0 = jnp.full((B, TILE), BVH_FAR, jnp.float32)
    j0 = jnp.zeros((B, TILE), jnp.int32)
    bt, bj = jax.lax.fori_loop(0, K4 // B, blk, (t0, j0))
    am = jnp.argmin(bt, axis=0)  # (256,) winning sublane
    m = jnp.min(bt, axis=0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (B, TILE), 0)
    onehot = sub == am[None, :]
    best_blk = jnp.sum(jnp.where(onehot, bj, 0), axis=0)
    t_ref[0, 0, :] = m
    idx_ref[0, 0, :] = best_blk * B + am.astype(jnp.int32)


def pack_tri_geom(bvh8) -> jnp.ndarray:
    """(4L, 12) per-triangle kernel rows: [v0 | e1 | e2 | pad]."""
    lt = bvh8.leaf_tris  # (L, 4, 3, 3)
    v0 = lt[:, :, 0]
    e1 = lt[:, :, 1] - v0
    e2 = lt[:, :, 2] - v0
    g = jnp.concatenate(
        [v0, e1, e2, jnp.zeros_like(v0)], axis=-1
    )  # (L, 4, 12)
    return g.reshape(-1, 12)


@partial(jax.jit, static_argnames=("interpret", "wide"))
def leaf_resolve_v2(o_t, d_t, geom, interpret: bool = False,
                    wide: bool = False):
    """o_t, d_t: (T, 3, 256); geom: (T, K·4, 12) with dead rows zeroed →
    (t (T, 256), tri list position (T, 256)). wide=True selects the
    256-tri-block kernel (v3); False the original 32-tri-block v2."""
    T, K4 = geom.shape[:2]
    assert K4 % 32 == 0
    t_out, pk_out = pl.pallas_call(
        _kernel_v3 if wide else _kernel_v2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 3, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K4, 12), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, TILE), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, TILE), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(o_t, d_t, geom)
    return t_out.reshape(T, TILE), pk_out.reshape(T, TILE)


def pack_leaf_geom(bvh8) -> jnp.ndarray:
    """(L, 48) kernel-layout leaf geometry: [v0x·4|v0y·4|v0z·4|e1…|e2…|pad]."""
    lt = bvh8.leaf_tris  # (L, 4, 3, 3)
    v0 = lt[:, :, 0]
    e1 = lt[:, :, 1] - v0
    e2 = lt[:, :, 2] - v0
    parts = [v0[..., 0], v0[..., 1], v0[..., 2],
             e1[..., 0], e1[..., 1], e1[..., 2],
             e2[..., 0], e2[..., 1], e2[..., 2]]
    packed = jnp.concatenate(parts, axis=1)  # (L, 36)
    return jnp.concatenate(
        [packed, jnp.zeros((packed.shape[0], 12), jnp.float32)], axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def leaf_resolve(o_t, d_t, geom, live, rows, interpret: bool = False):
    """o_t, d_t: (T, 3, 256); geom: (T, K, 48); live: (T, K) i32;
    rows: (T, K) i32 → (t (T, 256), packed (T, 256))."""
    T, K = geom.shape[:2]
    live3 = live.reshape(T, 1, K)
    rows3 = rows.reshape(T, 1, K)
    t_out, pk_out = pl.pallas_call(
        _kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 3, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 48), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, TILE), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, TILE), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(o_t, d_t, geom, live3, rows3)
    return t_out.reshape(T, TILE), pk_out.reshape(T, TILE)
