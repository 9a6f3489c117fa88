"""Sparse voxel set + batched hierarchical DDA traversal.

Counterpart of the reference's VoxelSet (tiny_bvh.h:3786-4160): a 256³
voxel space stored as a 32³ grid of 8³ bricks with on-demand brick
allocation, traversed by a two-level Amanatides–Woo 3DDDA (Setup3DDDA
tiny_bvh.h:3829-3858, Intersect :3871-4020). The hit normal derives from
the DDA step axis (:3860-3869).

TPU formulation: the grid is a dense (32,32,32) int32 brick-index array
(-1 = empty), bricks a (B, 8, 8, 8) bool pool; a whole ray batch advances
in lockstep through one while_loop with a per-ray level flag (grid/brick)
instead of the reference's nested scalar loops. A VoxelSet can be attached
to a TLAS as a custom BLAS via ops.queries.intersect_custom.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tinybvh_tpu.core.rays import Rays
from tinybvh_tpu.core.vecmath import BVH_FAR

GRID = 32
BRICK = 8
WORLD = GRID * BRICK  # 256
TOPG = 8              # topgrid: one bit per 4^3 group of bricks
GROUP = WORLD // TOPG  # 32 world units per top cell


class VoxelSet:
    """Host-side container; build with set(), then freeze() for traversal.

    Voxel coordinates are integers in [0, 256)³; `aabb_min/aabb_max` place
    the 256³ cube in world space (identity: [0,1)³ like the reference's
    unit-cube convention, tiny_bvh.h:988).
    """

    def __init__(self, aabb_min=(0.0, 0.0, 0.0), aabb_max=(1.0, 1.0, 1.0)):
        self.grid = np.full((GRID, GRID, GRID), -1, np.int32)
        self.bricks = [np.zeros((BRICK, BRICK, BRICK), bool)]  # slot 0 unused
        self.aabb_min = np.asarray(aabb_min, np.float32)
        self.aabb_max = np.asarray(aabb_max, np.float32)

    def set(self, x, y, z, value=True):
        """Set voxels; x/y/z arrays of ints in [0,256). ≙ VoxelSet::Set
        (tiny_bvh.h:3786-3807) with on-demand brick allocation."""
        x, y, z = (np.atleast_1d(np.asarray(v, np.int64)) for v in (x, y, z))
        gx, gy, gz = x // BRICK, y // BRICK, z // BRICK
        for cx, cy, cz, vx, vy, vz in zip(gx, gy, gz, x % BRICK, y % BRICK,
                                          z % BRICK):
            b = self.grid[cx, cy, cz]
            if b < 0:
                b = len(self.bricks)
                self.bricks.append(np.zeros((BRICK, BRICK, BRICK), bool))
                self.grid[cx, cy, cz] = b
            self.bricks[b][vx, vy, vz] = value

    def freeze(self):
        # topgrid: 1 bit per 4^3 group of bricks (≙ UpdateTopGrid,
        # tiny_bvh.h:3809-3827) — the DDA crosses empty 32-unit cells in
        # one step instead of four 8-unit ones
        occ = self.grid >= 0
        top = occ.reshape(TOPG, 4, TOPG, 4, TOPG, 4).any(axis=(1, 3, 5))
        return dict(
            grid=jnp.asarray(self.grid),
            bricks=jnp.asarray(np.stack(self.bricks)),
            top=jnp.asarray(top),
            aabb_min=jnp.asarray(self.aabb_min),
            aabb_max=jnp.asarray(self.aabb_max),
        )


@jax.jit
def intersect_voxels(vox, rays: Rays, t_max=BVH_FAR):
    """Batched two-level DDA. Returns (t, normal, voxel_idx) per ray;
    t = BVH_FAR on miss, normal is the ±axis unit vector of the entered
    face, voxel_idx the (3,) integer coordinate of the hit voxel."""
    o_w, d_w = rays.o, rays.d
    R = o_w.shape[0]
    # transform into voxel space [0, 256)³
    scale = WORLD / (vox["aabb_max"] - vox["aabb_min"])
    o = (o_w - vox["aabb_min"]) * scale
    d = d_w * scale
    inv = jnp.where(jnp.abs(d) > 1e-20, 1.0 / jnp.where(d == 0, 1, d),
                    jnp.where(d < 0, -1e30, 1e30))

    # clip to the volume
    t1 = (0.0 - o) * inv
    t2 = (WORLD - o) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=1)
    tmax_box = jnp.min(jnp.maximum(t1, t2), axis=1)
    enter = jnp.maximum(tmin, 0.0) + 1e-4
    inside = (tmax_box >= tmin) & (tmax_box > 0)

    step = jnp.where(d >= 0, 1, -1).astype(jnp.int32)  # (R, 3)

    def cell_setup(t_at, size):
        """Current cell + per-axis t of the next boundary at scale `size`."""
        p = o + t_at[:, None] * d
        cell = jnp.clip((p / size).astype(jnp.int32), 0, WORLD // size - 1)
        nxt = (cell + (step > 0)) * size
        tside = (nxt - o) * inv  # (R, 3)
        return cell, tside

    gcell, gtside = cell_setup(enter, BRICK)
    has_top = "top" in vox
    tcell, ttside = cell_setup(enter, GROUP)

    state = dict(
        # levels: 0 = grid, 1 = brick, 2 = topgrid (≙ the reference's
        # 3-level DDA, tiny_bvh.h:3871-4020 with topgrid at :3809-3827)
        level=jnp.full(R, 2 if has_top else 0, jnp.int32),
        tcell=tcell, ttside=ttside,
        gcell=gcell, gtside=gtside,
        bcell=jnp.zeros((R, 3), jnp.int32),
        btside=jnp.zeros((R, 3), jnp.float32),
        brick=jnp.zeros(R, jnp.int32),
        t_cur=enter,
        axis=jnp.argmax(jnp.abs(d), axis=1),  # entry axis approx
        t_hit=jnp.full(R, BVH_FAR, jnp.float32),
        vhit=jnp.zeros((R, 3), jnp.int32),
        nhit=jnp.zeros((R, 3), jnp.float32),
        done=~inside,
    )

    def in_bounds(cell, hi):
        return ((cell >= 0) & (cell < hi)).all(axis=1)

    def cond(s):
        return jnp.any(~s["done"])

    def body(s):
        done = s["done"]
        level, t_cur = s["level"], s["t_cur"]
        tcell, ttside = s["tcell"], s["ttside"]
        gcell, gtside = s["gcell"], s["gtside"]
        bcell, btside = s["bcell"], s["btside"]
        axis = s["axis"]

        # ---- topgrid level: step 32-unit cells across empty space --------
        if has_top:
            at_top = (level == 2) & ~done
            tc = jnp.clip(tcell, 0, TOPG - 1)
            tocc = vox["top"][tc[:, 0], tc[:, 1], tc[:, 2]]
            t_desc = at_top & tocc & in_bounds(tcell, TOPG)
            ng_cell, ng_tside = cell_setup(t_cur + 1e-5, BRICK)
            gcell = jnp.where(t_desc[:, None], ng_cell, gcell)
            gtside = jnp.where(t_desc[:, None], ng_tside, gtside)
            level = jnp.where(t_desc, 0, level)
            tstep = at_top & ~t_desc
            taxis = jnp.argmin(ttside, axis=1)
            tt = jnp.min(ttside, axis=1)
            onehot_t = jax.nn.one_hot(taxis, 3, dtype=jnp.int32)
            tcell = jnp.where(tstep[:, None], tcell + onehot_t * step, tcell)
            ttside = jnp.where((tstep[:, None]) & (onehot_t > 0),
                               ttside + jnp.abs(inv) * GROUP, ttside)
            t_cur = jnp.where(tstep, tt, t_cur)
            axis = jnp.where(tstep, taxis, axis)
            done = done | (tstep & (
                ~in_bounds(tcell, TOPG)
                | (t_cur > jnp.minimum(t_max, tmax_box))))

        at_grid = (level == 0) & ~done
        at_brick = (level == 1) & ~done

        # grid cell sits in an empty topgrid group → pop back up so the
        # DDA crosses it at 32-unit strides
        if has_top:
            gg = jnp.clip(gcell >> 2, 0, TOPG - 1)
            gocc = vox["top"][gg[:, 0], gg[:, 1], gg[:, 2]]
            to_top = at_grid & ~gocc & in_bounds(gcell, GRID)
            ntc, ntts = cell_setup(t_cur + 1e-5, GROUP)
            tcell = jnp.where(to_top[:, None], ntc, tcell)
            ttside = jnp.where(to_top[:, None], ntts, ttside)
            level = jnp.where(to_top, 2, level)
            at_grid = at_grid & ~to_top

        # ---- grid level: does the current cell hold a brick? -------------
        gc = jnp.clip(gcell, 0, GRID - 1)
        bidx = vox["grid"][gc[:, 0], gc[:, 1], gc[:, 2]]
        occupied = at_grid & (bidx >= 0) & in_bounds(gcell, GRID)
        # descend: set up brick DDA from the current t
        nb_cell, nb_tside = cell_setup(t_cur + 1e-5, 1)
        bcell = jnp.where(occupied[:, None], nb_cell, bcell)
        btside = jnp.where(occupied[:, None], nb_tside, btside)
        brick = jnp.where(occupied, bidx, s["brick"])
        level = jnp.where(occupied, 1, level)

        # grid step for non-occupied cells
        gstep = at_grid & ~occupied
        gaxis = jnp.argmin(gtside, axis=1)
        gt = jnp.min(gtside, axis=1)
        onehot = jax.nn.one_hot(gaxis, 3, dtype=jnp.int32)
        gcell = jnp.where(gstep[:, None], gcell + onehot * step, gcell)
        gtside = jnp.where(
            (gstep[:, None]) & (onehot > 0),
            gtside + jnp.abs(inv) * BRICK, gtside,
        )
        t_cur = jnp.where(gstep, gt, t_cur)
        axis = jnp.where(gstep, gaxis, axis)
        done = done | (gstep & (
            ~in_bounds(gcell, GRID) | (t_cur > jnp.minimum(t_max, tmax_box))
        ))

        # ---- brick level: test voxel, else step ---------------------------
        bc_local = jnp.clip(bcell - gc * BRICK, 0, BRICK - 1)
        vbit = vox["bricks"][
            s["brick"], bc_local[:, 0], bc_local[:, 1], bc_local[:, 2]
        ]
        brick_in = in_bounds(bcell - gc * BRICK, BRICK)
        hit = at_brick & vbit & brick_in
        t_hit = jnp.where(hit, t_cur, s["t_hit"])
        vhit = jnp.where(hit[:, None], bcell, s["vhit"])
        naxis = jax.nn.one_hot(axis, 3, dtype=jnp.float32)
        nhit = jnp.where(
            hit[:, None], -naxis * step.astype(jnp.float32), s["nhit"]
        )
        done = done | hit

        bstep = at_brick & ~hit
        baxis = jnp.argmin(btside, axis=1)
        bt = jnp.min(btside, axis=1)
        onehot_b = jax.nn.one_hot(baxis, 3, dtype=jnp.int32)
        bcell = jnp.where(bstep[:, None], bcell + onehot_b * step, bcell)
        btside = jnp.where(
            (bstep[:, None]) & (onehot_b > 0), btside + jnp.abs(inv), btside
        )
        t_cur = jnp.where(bstep, bt, t_cur)
        axis = jnp.where(bstep, baxis, axis)
        # leaving the brick → pop back to grid level and step the grid cell
        left = bstep & ~in_bounds(bcell - gc * BRICK, BRICK)
        level = jnp.where(left, 0, level)
        # grid step on exit
        gaxis2 = jnp.argmin(gtside, axis=1)
        gt2 = jnp.min(gtside, axis=1)
        onehot2 = jax.nn.one_hot(gaxis2, 3, dtype=jnp.int32)
        gcell = jnp.where(left[:, None], gcell + onehot2 * step, gcell)
        gtside = jnp.where(
            (left[:, None]) & (onehot2 > 0), gtside + jnp.abs(inv) * BRICK,
            gtside,
        )
        t_cur = jnp.where(left, gt2, t_cur)
        axis = jnp.where(left, gaxis2, axis)
        done = done | (left & (
            ~in_bounds(gcell, GRID) | (t_cur > jnp.minimum(t_max, tmax_box))
        ))

        return dict(
            level=level, tcell=tcell, ttside=ttside,
            gcell=gcell, gtside=gtside, bcell=bcell,
            btside=btside, brick=brick, t_cur=t_cur, axis=axis,
            t_hit=t_hit, vhit=vhit, nhit=nhit, done=done,
        )

    s = lax.while_loop(cond, body, state)
    # convert t back to world scale: t is in voxel-space parameter units of
    # d (same parametrization since both o and d were scaled) → identical t
    return s["t_hit"], s["nhit"], s["vhit"]


def is_occluded_voxels(vox, rays: Rays, t_max):
    t, _, _ = intersect_voxels(vox, rays, t_max)
    return t < t_max
