"""TLAS / BLAS instancing: merged-table two-level 8-wide traversal.

TPU-native counterpart of BLASInstance + the TLAS build/traversal
(tiny_bvh.h:1443-1475, 2221-2259, 3306-3380). The reference walks a TLAS
whose leaves hold instance ids, re-transforms the ray per instance and
recursively calls the BLAS's own Intersect. Pointer-chasing across
heterogeneous BVH objects doesn't batch, so the TPU design merges
everything into ONE node/leaf table:

  * all BLAS BVH8 tables are concatenated (child/leaf indices rebased);
  * the TLAS is itself built 8-wide over instance world AABBs, with
    instance entries encoded directly in child words;
  * the traversal is a single batched state machine whose per-ray state
    includes the current instance frame; entering an instance swaps in the
    transformed ray (directions NOT normalized, so hit-t is identical in
    both spaces — same trick as tiny_bvh.h:3329-3333).

child-word encoding e (int32):
  e >= 0            → node row (merged table)
  -L <= e <= -1     → leaf row  (-e - 1), L = total leaf rows
  e < -L            → instance  (-e - 1 - L)
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from flax import struct

from tinybvh_tpu.core.intersect import moller_trumbore, tri_edges
from tinybvh_tpu.core.rays import Hits, Rays
from tinybvh_tpu.core.vecmath import BVH_FAR, mat3_apply
from tinybvh_tpu.layouts.mbvh import BVH8, EMPTY_SLOT

# two-level descent pushes at most one node per level per BVH; 130 covers
# the builder's 128-level depth bound (see traverse/stack.py)
STACK_DEPTH = 130
_EMPTY = -(2**31) + 1  # plain int (see traverse/wavefront.py _I32MAX note)


@struct.dataclass
class TLAS8:
    bounds: jnp.ndarray      # (M, 48) f32 merged node table (TLAS rows first)
    child: jnp.ndarray       # (M, 8) i32 encoded child words
    leaf_tris: jnp.ndarray   # (L, 4, 3, 3) f32 merged leaf table
    leaf_prim: jnp.ndarray   # (L, 4) i32 BLAS-local prim ids
    inst_inv: jnp.ndarray    # (I, 4, 4) f32 world→BLAS transforms
    inst_mask: jnp.ndarray   # (I,) i32 visibility masks
    inst_root: jnp.ndarray   # (I,) i32 merged-table root row of the BLAS
    n_leaf_rows: int = struct.field(pytree_node=False)


class MergedBlas:
    """Concatenated BLAS tables, cached across per-frame TLAS rebuilds.

    The reference re-Builds only the TLAS over instance AABBs each frame
    (UpdateSceneGraph, tiny_scene.h:3687-3696) — the BLAS memory is
    untouched. This is the TPU twin: merge the (large, static) BLAS node
    and leaf tables ONCE, device-resident; per frame only the small TLAS
    rows are rebuilt on the host and prepended on device
    (build_tlas_from_merged)."""

    def __init__(self, blases, host8s=None):
        node_off, leaf_off = [], []
        b_parts, c_parts, lt_parts, lp_parts = [], [], [], []
        blas_root = []
        n_nodes = n_leaves = 0
        self.any_device = False
        for bi, b in enumerate(blases):
            h = host8s[bi] if host8s is not None else None
            node_off.append(n_nodes)
            leaf_off.append(n_leaves)
            if h is not None:
                bo = h["bounds"]
                ch = np.where(
                    h["child"] == EMPTY_SLOT, h["child"],
                    np.where(h["child"] >= 0, h["child"] + n_nodes,
                             h["child"] - n_leaves)).astype(np.int32)
                lt, lp = h["leaf_tris"], h["leaf_prim"]
                blas_root.append(bo[0].reshape(6, 8))
            else:
                # device BLAS (e.g. after a device refit): rebase on
                # device — a D2H readback here would cost minutes/MB
                self.any_device = True
                bo = b.bounds
                ch = jnp.where(
                    b.child == EMPTY_SLOT, b.child,
                    jnp.where(b.child >= 0, b.child + n_nodes,
                              b.child - n_leaves))
                lt, lp = b.leaf_tris, b.leaf_prim
                blas_root.append(None)  # resolved lazily below
            b_parts.append(bo)
            c_parts.append(ch)
            lt_parts.append(lt)
            lp_parts.append(lp)
            n_nodes += b.n_nodes
            n_leaves += b.n_leaves
        cat = jnp.concatenate if self.any_device else np.concatenate
        asa = (lambda x: x) if not self.any_device else jnp.asarray
        self.bounds = cat([asa(p) for p in b_parts])
        self.child = cat([asa(p) for p in c_parts])
        self.leaf_tris = cat([asa(p) for p in lt_parts])
        self.leaf_prim = cat([asa(p) for p in lp_parts])
        # root boxes (host): needed every frame for instance world AABBs.
        # A device-refit BLAS pays ONE tiny (48,) readback here per merge.
        self.blas_root = [
            r if r is not None else np.asarray(blases[i].bounds[0])
            .reshape(6, 8)
            for i, r in enumerate(blas_root)]
        self.node_off = node_off
        self.n_nodes = n_nodes
        self.n_leaves = n_leaves

    def to_device(self) -> "MergedBlas":
        """Move the merged tables to the device once; subsequent
        build_tlas_from_merged calls then transfer only TLAS rows."""
        if not isinstance(self.bounds, np.ndarray):
            return self
        self.bounds = jnp.asarray(self.bounds, jnp.float32)
        self.child = jnp.asarray(self.child, jnp.int32)
        self.leaf_tris = jnp.asarray(self.leaf_tris, jnp.float32)
        self.leaf_prim = jnp.asarray(self.leaf_prim, jnp.int32)
        return self


def merge_blas_tables(blases, host8s=None) -> MergedBlas:
    return MergedBlas(blases, host8s)


def build_tlas(blases, transforms, masks=None, builder=None,
               host8s=None) -> TLAS8:
    """Build a TLAS8 from BVH8 BLASes + per-instance 4x4 transforms.

    blases: list of BVH8 (from layouts.mbvh.collapse_bvh2) — instances index
    into this list via blas_ids; transforms: (I, 4, 4) or list of
    (blas_id, transform) pairs.

    host8s: optional list of host-array dicts aligned with blases
    (collapse_bvh2 as_host). The merge is host-side numpy; without
    host copies every BLAS array pays a device->host readback, which
    costs minutes per MB through the tunnel backend.

    Per-frame callers should cache merge_blas_tables(...) and call
    build_tlas_from_merged — only the instance-level rows rebuild.
    """
    return build_tlas_from_merged(merge_blas_tables(blases, host8s),
                                  transforms, masks=masks, builder=builder)


def build_tlas_from_merged(merged: MergedBlas, transforms, masks=None,
                           builder=None) -> TLAS8:
    from tinybvh_tpu.builders.binned import build_binned_aabbs

    if isinstance(transforms, (list, tuple)) and transforms and isinstance(
        transforms[0], tuple
    ):
        blas_ids = np.array([b for b, _ in transforms], np.int32)
        mats = np.stack([np.asarray(m, np.float32) for _, m in transforms])
    else:
        mats = np.asarray(transforms, np.float32)
        blas_ids = np.zeros(mats.shape[0], np.int32)
    I = mats.shape[0]
    if masks is None:
        masks = np.full(I, 0xFFFF, np.int32)
    node_off = merged.node_off
    n_leaves = merged.n_leaves

    # ---- instance world AABBs + TLAS build --------------------------------
    inst_root_local = np.array(
        [node_off[blas_ids[i]] for i in range(I)], np.int32
    )
    blas_lo = np.stack([
        merged.blas_root[blas_ids[i]][:3].min(1) for i in range(I)
    ])
    blas_hi = np.stack([
        merged.blas_root[blas_ids[i]][3:].max(1) for i in range(I)
    ])
    # numpy twin of core.vecmath.transform_aabb (center' ± |A|·extent):
    # a device round-trip here would cost an eager-op compile + D2H
    cc = (blas_lo + blas_hi) * 0.5
    ee = (blas_hi - blas_lo) * 0.5
    a3 = mats[:, :3, :3]
    c2 = np.einsum("ijk,ik->ij", a3, cc) + mats[:, :3, 3]
    e2 = np.einsum("ijk,ik->ij", np.abs(a3), ee)
    wlo, whi = c2 - e2, c2 + e2

    if builder is None:
        tlas2, th = build_binned_aabbs(wlo, whi, max_leaf=1,
                                       return_host=True)
        mn, mx = th["node_min"], th["node_max"]
        lf, ct = th["left_first"], th["count"]
        pidx = th["prim_idx"]
    else:
        tlas2 = builder(wlo, whi)
        mn = np.asarray(tlas2.node_min)
        mx = np.asarray(tlas2.node_max)
        lf = np.asarray(tlas2.left_first)
        ct = np.asarray(tlas2.count)
        pidx = np.asarray(tlas2.prim_idx)
    L = n_leaves

    def inst_code(i):
        return -(int(i) + 1 + L)

    t_bounds, t_child = [], []

    def area(i):
        e = np.maximum(mx[i] - mn[i], 0)
        return e[0] * e[1] + e[1] * e[2] + e[2] * e[0]

    if ct[0] > 0:  # root is a leaf (single instance)
        rb = np.full((6, 8), BVH_FAR, np.float32)
        rb[3:] = -BVH_FAR
        rc = np.full(8, EMPTY_SLOT, np.int64)
        rb[:3, 0] = mn[0]
        rb[3:, 0] = mx[0]
        rc[0] = inst_code(pidx[lf[0]])
        t_bounds.append(rb)
        t_child.append(rc)
    else:
        t_bounds.append(None)
        t_child.append(None)
        work = [(0, 0)]
        while work:
            b2node, row = work.pop()
            kids = [lf[b2node], lf[b2node] + 1]
            while len(kids) < 8:
                best, best_a = -1, -1.0
                for k, c in enumerate(kids):
                    if ct[c] == 0:
                        a = area(c)
                        if a > best_a:
                            best, best_a = k, a
                if best < 0:
                    break
                c = kids.pop(best)
                kids.extend((lf[c], lf[c] + 1))
            rb = np.full((6, 8), BVH_FAR, np.float32)
            rb[3:] = -BVH_FAR
            rc = np.full(8, EMPTY_SLOT, np.int64)
            for k, c in enumerate(kids):
                rb[:3, k] = mn[c]
                rb[3:, k] = mx[c]
                if ct[c] > 0:
                    rc[k] = inst_code(pidx[lf[c]])
                else:
                    t_bounds.append(None)
                    t_child.append(None)
                    rc[k] = len(t_bounds) - 1
                    work.append((c, len(t_bounds) - 1))
            t_bounds[row] = rb
            t_child[row] = rc

    n_tlas = len(t_bounds)
    tlas_bounds = np.stack([b.reshape(-1) for b in t_bounds]).astype(
        np.float32)
    tlas_child = np.stack(t_child).astype(np.int32)

    # HOST inverse (f64 for conditioning): the previous device
    # mat4_inverse + np.asarray readback paid an eager-op remote compile
    # plus a D2H transfer through the tunnel backend — measured 390 s of
    # an 8-instance TLAS build, i.e. the entire build cost. Singular
    # transforms (e.g. zero scale used to hide an instance) get an
    # identity inverse; their mask is zeroed so they can never be hit.
    m64 = mats.astype(np.float64)
    det = np.linalg.det(m64)
    degenerate = ~np.isfinite(det) | (np.abs(det) < 1e-30)
    if degenerate.any():
        m64 = np.where(degenerate[:, None, None], np.eye(4), m64)
        masks = np.where(degenerate, 0, masks)
    inv = np.linalg.inv(m64).astype(np.float32)

    # TLAS rows come first; BLAS node refs shift by n_tlas, leaf/instance
    # codes are row-count independent. With a host merge this is one numpy
    # concat + one upload; with a device-resident merge (per-frame scene
    # updates, refit BLASes) only the small TLAS rows transfer and the
    # combine runs as one jitted device op.
    mb, mc = merged.bounds, merged.child
    if isinstance(mb, np.ndarray):
        bounds_all = jnp.asarray(np.concatenate(
            [tlas_bounds, mb.reshape(mb.shape[0], -1)]), jnp.float32)
        child_all = jnp.asarray(np.concatenate(
            [tlas_child, np.where(mc >= 0, mc + n_tlas, mc)]), jnp.int32)
        lt = jnp.asarray(merged.leaf_tris, jnp.float32)
        lp = jnp.asarray(merged.leaf_prim, jnp.int32)
    else:
        bounds_all, child_all = _combine_tlas_rows(
            jnp.asarray(tlas_bounds), jnp.asarray(tlas_child), mb, mc)
        lt, lp = merged.leaf_tris, merged.leaf_prim

    return TLAS8(
        bounds=bounds_all,
        child=child_all,
        leaf_tris=lt,
        leaf_prim=lp,
        inst_inv=jnp.asarray(inv, jnp.float32),
        inst_mask=jnp.asarray(masks, jnp.int32),
        inst_root=jnp.asarray(inst_root_local + n_tlas, jnp.int32),
        n_leaf_rows=int(n_leaves),
    )


@jax.jit
def _combine_tlas_rows(tlas_bounds, tlas_child, mb, mc):
    n_tlas = tlas_bounds.shape[0]
    bounds_all = jnp.concatenate([tlas_bounds, mb.reshape(mb.shape[0], -1)])
    child_all = jnp.concatenate(
        [tlas_child, jnp.where(mc >= 0, mc + n_tlas, mc)])
    return bounds_all, child_all


def _slab8(o, rd, t, bounds):
    b = bounds.reshape(-1, 6, 8)
    t1x = (b[:, 0] - o[:, 0:1]) * rd[:, 0:1]
    t2x = (b[:, 3] - o[:, 0:1]) * rd[:, 0:1]
    t1y = (b[:, 1] - o[:, 1:2]) * rd[:, 1:2]
    t2y = (b[:, 4] - o[:, 1:2]) * rd[:, 1:2]
    t1z = (b[:, 2] - o[:, 2:3]) * rd[:, 2:3]
    t2z = (b[:, 5] - o[:, 2:3]) * rd[:, 2:3]
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    hit = (tmax >= tmin) & (tmin < t[:, None]) & (tmax >= 0.0)
    return jnp.where(hit, tmin, BVH_FAR)


def _xform_ray(inv, o, d):
    """Apply (R, 4, 4) world→BLAS transforms; directions unnormalized.
    mat3_apply, not einsum: TPU f32 dot_general defaults to bf16
    multiplies (see vecmath.mat3_apply)."""
    from tinybvh_tpu.core.vecmath import mat3_apply, safe_rcp

    o2 = mat3_apply(inv[:, :3, :3], o) + inv[:, :3, 3]
    d2 = mat3_apply(inv[:, :3, :3], d)
    return o2, d2, safe_rcp(d2)


@partial(jax.jit, static_argnames=())
def intersect_tlas8(tlas: TLAS8, rays: Rays, t_max=BVH_FAR) -> Hits:
    """Closest-hit two-level traversal; Hits.inst is the instance id and
    Hits.prim the BLAS-local primitive id (matching the reference's
    Intersection record semantics, tiny_bvh.h:693-703)."""
    o, d = rays.o, rays.d
    R = o.shape[0]
    rows = jnp.arange(R)
    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    v0t, e1t, e2t = tri_edges(tlas.leaf_tris)
    L = tlas.n_leaf_rows
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (1, 4, 4))
    inv_all = jnp.concatenate([tlas.inst_inv, eye], axis=0)  # frame -1 → id
    n_inst = tlas.inst_inv.shape[0]

    state = dict(
        cur=jnp.zeros(R, jnp.int32),
        frame=jnp.full(R, -1, jnp.int32),
        o2=o, d2=d, rd2=rays.rd,
        sp=jnp.zeros(R, jnp.int32),
        stack_e=jnp.zeros((R, STACK_DEPTH), jnp.int32),
        stack_d=jnp.zeros((R, STACK_DEPTH), jnp.float32),
        stack_f=jnp.full((R, STACK_DEPTH), -1, jnp.int32),
        t=t0,
        u=jnp.zeros(R, jnp.float32),
        v=jnp.zeros(R, jnp.float32),
        prim=jnp.full(R, -1, jnp.int32),
        inst=jnp.full(R, -1, jnp.int32),
        done=jnp.zeros(R, bool),
    )

    def cond(s):
        return jnp.any(~s["done"])

    def body(s):
        cur, sp, done, t = s["cur"], s["sp"], s["done"], s["t"]
        frame, o2, d2, rd2 = s["frame"], s["o2"], s["d2"], s["rd2"]

        # ---- pop (with frame restore) -----------------------------------
        need_pop = (cur == _EMPTY) & ~done
        can_pop = need_pop & (sp > 0)
        nsp = jnp.where(can_pop, sp - 1, sp)
        col = jnp.clip(nsp, 0, STACK_DEPTH - 1)
        pe = s["stack_e"][rows, col]
        pd = s["stack_d"][rows, col]
        pf = s["stack_f"][rows, col]
        take = can_pop & (pd < t)
        cur = jnp.where(take, pe, cur)
        new_frame = jnp.where(take, pf, frame)
        switch = take & (new_frame != frame)
        # recompute the frame-local ray where the frame changed
        inv = inv_all[jnp.where(new_frame < 0, n_inst, new_frame)]
        to2, td2, trd2 = _xform_ray(inv, o, d)
        o2 = jnp.where(switch[:, None], to2, o2)
        d2 = jnp.where(switch[:, None], td2, d2)
        rd2 = jnp.where(switch[:, None], trd2, rd2)
        frame = new_frame
        done = done | (need_pop & (sp == 0))
        sp = nsp

        proc = (cur != _EMPTY) & ~done
        is_node = proc & (cur >= 0)
        code = jnp.where(proc & (cur < 0), -cur - 1, 0)  # leaf/instance code
        is_leaf = proc & (cur < 0) & (code < L)
        is_inst = proc & (cur < 0) & (code >= L)

        # ---- interior node ----------------------------------------------
        nrow = jnp.where(is_node, cur, 0)
        dist = _slab8(o2, rd2, t, tlas.bounds[nrow])
        dist = jnp.where(is_node[:, None], dist, BVH_FAR)
        kids = tlas.child[nrow]
        valid = (dist < BVH_FAR) & (kids != EMPTY_SLOT)
        dist = jnp.where(valid, dist, BVH_FAR)
        near = jnp.argmin(dist, axis=1)
        any_valid = valid.any(axis=1)
        next_node = jnp.where(any_valid, kids[rows, near], _EMPTY)

        stack_e, stack_d, stack_f = s["stack_e"], s["stack_d"], s["stack_f"]
        for k in range(8):
            push = is_node & valid[:, k] & (near != k)
            colp = jnp.clip(sp, 0, STACK_DEPTH - 1)
            oe = stack_e[rows, colp]
            od = stack_d[rows, colp]
            of = stack_f[rows, colp]
            stack_e = stack_e.at[rows, colp].set(
                jnp.where(push, kids[:, k], oe))
            stack_d = stack_d.at[rows, colp].set(
                jnp.where(push, dist[:, k], od))
            stack_f = stack_f.at[rows, colp].set(jnp.where(push, frame, of))
            sp = jnp.where(push, sp + 1, sp)

        # ---- leaf --------------------------------------------------------
        lrow = jnp.where(is_leaf, code, 0)
        hit, th, uh, vh = moller_trumbore(
            o2[:, None, :], d2[:, None, :], v0t[lrow], e1t[lrow], e2t[lrow],
            t[:, None],
        )
        th = jnp.where(hit & is_leaf[:, None], th, BVH_FAR)
        best = jnp.argmin(th, axis=1)
        bt = th[rows, best]
        improved = bt < t
        t = jnp.where(improved, bt, t)
        u = jnp.where(improved, uh[rows, best], s["u"])
        v = jnp.where(improved, vh[rows, best], s["v"])
        prim = jnp.where(improved, tlas.leaf_prim[lrow, best], s["prim"])
        inst = jnp.where(improved, frame, s["inst"])

        # ---- instance entry: switch frame, jump to BLAS root ------------
        iid = jnp.where(is_inst, code - L, 0)
        mask_ok = (tlas.inst_mask[iid] & rays.mask) != 0
        enter = is_inst & mask_ok
        inv_i = inv_all[jnp.where(enter, iid, n_inst)]
        io2, id2, ird2 = _xform_ray(inv_i, o, d)
        o2 = jnp.where(enter[:, None], io2, o2)
        d2 = jnp.where(enter[:, None], id2, d2)
        rd2 = jnp.where(enter[:, None], ird2, rd2)
        frame = jnp.where(enter, iid, frame)

        cur = jnp.where(
            is_node, next_node,
            jnp.where(enter, tlas.inst_root[iid], _EMPTY),
        )
        return dict(
            cur=cur, frame=frame, o2=o2, d2=d2, rd2=rd2, sp=sp,
            stack_e=stack_e, stack_d=stack_d, stack_f=stack_f,
            t=t, u=u, v=v, prim=prim, inst=inst, done=done,
        )

    s = lax.while_loop(cond, body, state)
    ok = s["prim"] >= 0
    return Hits(
        t=jnp.where(ok, s["t"], BVH_FAR),
        u=s["u"], v=s["v"], prim=s["prim"], inst=s["inst"],
    )


def is_occluded_tlas8(tlas: TLAS8, rays: Rays, t_max, cap_factor: int = 4):
    """Early-exit any-hit two-level query (≙ IsOccludedTLAS,
    tiny_bvh.h:3455-3526): rides the wavefront traversal with any_hit=True,
    which drops a ray's remaining (ray, node) pairs the moment any
    triangle hits below t_max — shadow rays in instanced scenes stop at
    the first occluder instead of paying the full closest-hit walk.
    Retries with a larger frontier on overflow, then falls back to the
    (exact, overflow-free) lockstep traversal."""
    for cap in (cap_factor, 3 * cap_factor):
        _, occ, overflow = intersect_tlas_wavefront(
            tlas, rays, t_max, cap_factor=cap, any_hit=True)
        if not bool(np.asarray(overflow)):
            return occ
    h = intersect_tlas8(tlas, rays, t_max)
    return h.prim >= 0


@partial(jax.jit, static_argnames=("cap_factor", "any_hit", "return_winner"))
def intersect_tlas_wavefront(
    tlas: TLAS8, rays: Rays, t_max=BVH_FAR, cap_factor: int = 3,
    any_hit: bool = False, return_winner: bool = False,
):
    """Two-level wavefront traversal over the merged TLAS8 table.

    The level-synchronous frontier of traverse/wavefront.py, extended with
    a per-pair FRAME (instance id; sentinel = world): pair rays are
    transformed by their frame's inverse at gather time, instance child
    entries spawn BLAS-root pairs in the instance frame (after the
    visibility-mask test, ≙ tiny_bvh.h:3326), and winners carry their frame
    so Hits.inst is exact. Distances stay comparable across frames because
    directions are not renormalized (tiny_bvh.h:3329-3333).
    """
    from tinybvh_tpu.layouts.mbvh import EMPTY_SLOT as _ES
    from tinybvh_tpu.core.vecmath import safe_rcp

    MAX_LEVELS = 64
    _I32MAX = jnp.int32(2**31 - 1)
    o_all, d_all = rays.o, rays.d
    R = o_all.shape[0]
    P = cap_factor * R
    L = tlas.n_leaf_rows
    n_inst = tlas.inst_inv.shape[0]
    eye4 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (1, 4, 4))
    inv_all = jnp.concatenate([tlas.inst_inv, eye4], axis=0)
    WORLD = jnp.int32(n_inst)  # frame sentinel: identity transform

    v0t, e1t, e2t = tri_edges(tlas.leaf_tris)
    leaf_geom = jnp.concatenate(
        [v0t.reshape(-1, 12), e1t.reshape(-1, 12), e2t.reshape(-1, 12),
         jnp.zeros((v0t.shape[0], 12), jnp.float32)], axis=1)
    ray_data = jnp.concatenate(
        [o_all, d_all, jnp.zeros((R, 2), jnp.float32)], axis=1)  # (R, 8)

    def t_key(t):
        return lax.bitcast_convert_type(t, jnp.int32)

    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    tkey0 = t_key(t0)

    slot = jnp.arange(P, dtype=jnp.int32)
    state = dict(
        pr=jnp.where(slot < R, slot, R - 1),
        pc=jnp.zeros(P, jnp.int32),
        pf=jnp.full(P, WORLD, jnp.int32),
        pt=jnp.where(slot < R, 0.0, BVH_FAR),
        n_pairs=jnp.asarray(R, jnp.int32),
        tkey=tkey0,
        win=jnp.full(R, _I32MAX, jnp.int32),
        win_inst=jnp.full(R, _I32MAX, jnp.int32),
        overflow=jnp.zeros((), bool),
        level=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return (s["n_pairs"] > 0) & (s["level"] < MAX_LEVELS)

    def body(s):
        pr, pc, pf, pt = s["pr"], s["pc"], s["pf"], s["pt"]
        tkey = s["tkey"]
        t_best = lax.bitcast_convert_type(tkey, jnp.float32)
        active = (slot < s["n_pairs"]) & (pt < t_best[pr])
        if any_hit:
            active = active & ~(tkey < tkey0)[pr]
        is_node = active & (pc >= 0)
        code = jnp.where(active & (pc < 0), -pc - 1, 0)
        is_leaf = active & (pc < 0) & (code < L)

        rdat = ray_data[pr]
        inv = inv_all[pf]  # (P, 4, 4)
        o = mat3_apply(inv[:, :3, :3], rdat[:, 0:3]) + inv[:, :3, 3]
        d = mat3_apply(inv[:, :3, :3], rdat[:, 3:6])
        rd = safe_rcp(d)
        tb = t_best[pr]

        nrow = jnp.where(is_node, pc, 0)
        dist = _slab8(o, rd, tb, tlas.bounds[nrow])
        kids = tlas.child[nrow]
        valid = (dist < BVH_FAR) & (kids != _ES) & is_node[:, None]

        # classify children
        kcode = jnp.where(kids < 0, -kids - 1, 0)
        k_is_inst = valid & (kids < 0) & (kcode >= L) & (kids != _ES)
        iid = jnp.clip(kcode - L, 0, n_inst - 1)
        mask_ok = (tlas.inst_mask[iid] & rays.mask[pr][:, None]) != 0
        k_is_inst = k_is_inst & mask_ok
        k_keep = (valid & ~((kids < 0) & (kcode >= L))) | k_is_inst
        # per-lane next-pair payload
        lane_code = jnp.where(k_is_inst, tlas.inst_root[iid], kids)
        lane_frame = jnp.where(k_is_inst, iid, pf[:, None])

        # ---- leaf fold ----------------------------------------------------
        lrow = jnp.where(is_leaf, code, 0)
        geom = leaf_geom[lrow]
        gv0 = geom[:, 0:12].reshape(-1, 4, 3)
        ge1 = geom[:, 12:24].reshape(-1, 4, 3)
        ge2 = geom[:, 24:36].reshape(-1, 4, 3)
        hit, th, _, _ = moller_trumbore(
            o[:, None, :], d[:, None, :], gv0, ge1, ge2, tb[:, None])
        th = jnp.where(hit & is_leaf[:, None], th, BVH_FAR)
        lbest = jnp.argmin(th, axis=1)
        cand_t = jnp.min(th, axis=1)
        has_cand = cand_t < BVH_FAR
        ckey = jnp.where(has_cand, t_key(cand_t), _I32MAX)
        ray_ix = jnp.where(has_cand, pr, 0)
        new_tkey = tkey.at[ray_ix].min(ckey)
        is_winner = has_cand & (ckey == new_tkey[pr])
        packed = jnp.where(is_winner, lrow * 4 + lbest.astype(jnp.int32),
                           _I32MAX)
        improved = new_tkey < tkey
        win = jnp.where(improved, _I32MAX, s["win"])
        win = win.at[ray_ix].min(packed)
        # winner's frame: second fold keyed on the final packed value
        final_winner = is_winner & (packed == win[pr])
        wi = jnp.where(improved, _I32MAX, s["win_inst"])
        wi = wi.at[ray_ix].min(jnp.where(final_winner, pf, _I32MAX))

        # ---- compact next frontier ---------------------------------------
        t_best2 = lax.bitcast_convert_type(new_tkey, jnp.float32)
        k_keep = k_keep & (dist < t_best2[pr][:, None])
        counts = k_keep.sum(axis=1).astype(jnp.int32)
        offs = jnp.cumsum(counts) - counts
        want = offs[-1] + counts[-1]
        total = jnp.minimum(want, P)
        head = jnp.full(P, -1, jnp.int32)
        head_pos = jnp.where(counts > 0, jnp.minimum(offs, P - 1), P - 1)
        head = head.at[head_pos].max(jnp.where(counts > 0, slot, -1))
        src = jnp.maximum(lax.associative_scan(jnp.maximum, head), 0)
        lane_rank = slot - offs[src]
        rank = jnp.cumsum(k_keep, axis=1) - k_keep
        lanes8 = jnp.arange(8, dtype=jnp.int32)
        # one-hot reduction instead of an 8-step select chain (op count is
        # the cost currency in this loop)
        onehot = (rank[:, :, None] == lanes8[None, None, :]) \
            & k_keep[:, :, None]
        lookup = jnp.sum(onehot * lanes8[:, None], axis=1, dtype=jnp.int32)
        lane = lookup.reshape(-1)[src * 8 + (lane_rank % 8)]
        flat = src * 8 + lane
        in_range = slot < total
        np_pr = jnp.where(in_range, pr[src], R - 1)
        np_pc = jnp.where(in_range, lane_code.reshape(-1)[flat], 0)
        np_pf = jnp.where(in_range, lane_frame.reshape(-1)[flat], WORLD)
        np_pt = jnp.where(in_range, dist.reshape(-1)[flat], BVH_FAR)
        return dict(
            pr=np_pr, pc=np_pc, pf=np_pf, pt=np_pt, n_pairs=total,
            tkey=new_tkey, win=win, win_inst=wi,
            overflow=s["overflow"] | (want > P), level=s["level"] + 1,
        )

    s = lax.while_loop(cond, body, state)
    # stopping at MAX_LEVELS with pairs pending is silent truncation
    s["overflow"] = s["overflow"] | (
        (s["n_pairs"] > 0) & (s["level"] >= MAX_LEVELS))
    win = s["win"]
    ok = win != _I32MAX
    wl = jnp.where(ok, win >> 2, 0)
    wk = jnp.where(ok, win & 3, 0)
    prim = jnp.where(ok, tlas.leaf_prim[wl, wk], -1)
    inst = jnp.where(ok & (s["win_inst"] < n_inst), s["win_inst"], -1)
    # u/v recovery: re-intersect the winning tri with the frame-local ray
    inv_w = inv_all[jnp.where(ok, jnp.minimum(s["win_inst"], n_inst), n_inst)]
    o2 = mat3_apply(inv_w[:, :3, :3], o_all) + inv_w[:, :3, 3]
    d2 = mat3_apply(inv_w[:, :3, :3], d_all)
    _, _, uu, vv = moller_trumbore(
        o2, d2, v0t[wl, wk], e1t[wl, wk], e2t[wl, wk],
        jnp.full(R, BVH_FAR, jnp.float32))
    t_fin = lax.bitcast_convert_type(s["tkey"], jnp.float32)
    hits = Hits(
        t=jnp.where(ok, t_fin, BVH_FAR),
        u=jnp.where(ok, uu, 0.0),
        v=jnp.where(ok, vv, 0.0),
        prim=prim, inst=inst,
    )
    if any_hit:
        return hits, s["tkey"] < tkey0, s["overflow"]
    if return_winner:
        # winner leaf row + lane (for shading-normal lookup)
        return hits, jnp.where(ok, win, -1), s["overflow"]
    return hits, s["overflow"]


def merge_leaf_attrs(blases, attrs):
    """Per-BLAS per-primitive shading attributes → one merged (L, 4, ...)
    table aligned with TLAS8.leaf_tris (same BLAS concatenation order as
    build_tlas). attrs[i] is (N_i, ...) indexed by BLAS-local prim id —
    e.g. per-triangle UV triples or texture ids. Empty leaf lanes keep
    index-0 data; their triangles are degenerate and never win a hit.

    ≙ the per-instance shading tables uploaded next to the BVH by the
    reference's GPU tracer (wavefront2.cl Instance struct / FatTri data).
    """
    import numpy as _np

    out = []
    for b, a in zip(blases, attrs):
        lp = _np.asarray(b.leaf_prim)
        out.append(_np.asarray(a)[_np.maximum(lp, 0)])
    return jnp.asarray(_np.concatenate(out, axis=0))
