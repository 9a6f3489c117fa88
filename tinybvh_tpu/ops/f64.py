"""Double-precision BVH pipeline.

Counterpart of the reference's BVH_Double (64-bit indices + f64 math,
tiny_bvh.h:7898-8378, BLASInstanceEx 8432-8474). TPUs have no f64
execution units, so — in the same spirit as the reference keeping its
double path scalar-C++ while the fast path is SIMD — this path runs
host-side as vectorized float64 numpy: exact same algorithms (binned SAH
build, ordered stack traversal, Möller–Trumbore) at full precision.
Useful for planetary-scale scenes and as the precision oracle in tests.
"""

from __future__ import annotations

import numpy as np

from tinybvh_tpu.core.vecmath import C_INT, C_TRAV

FAR = 1e300


def _sah_build_f64(fmin, fmax, max_leaf=4, bins=8):
    """Serial binned-SAH build in f64 over per-primitive AABBs.

    Shared by BVHDouble (triangles) and TLASDouble (instance world AABBs,
    like the reference building its double TLAS with the same builder,
    tiny_bvh.h:7943-7979). Returns SoA arrays
    (node_min, node_max, left_first, count, prim_idx, n_nodes).
    """
    N = fmin.shape[0]
    cent = (fmin + fmax) / 2
    M = 2 * N + 2
    node_min = np.full((M, 3), FAR)
    node_max = np.full((M, 3), -FAR)
    left_first = np.zeros(M, np.int64)
    count = np.zeros(M, np.int64)
    idx = np.arange(N)
    node_min[0] = fmin.min(axis=0)
    node_max[0] = fmax.max(axis=0)
    n_used = [2]
    order = []

    def ha(mn, mx):
        e = np.maximum(mx - mn, 0)
        return e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] + e[..., 2] * e[..., 0]

    def build(node, ids):
        if len(ids) <= 1:
            count[node] = len(ids)
            left_first[node] = len(order)
            order.extend(ids.tolist())
            return
        c = cent[ids]
        cmin, cmax = c.min(axis=0), c.max(axis=0)
        ext = cmax - cmin
        best = (FAR, -1, -1)
        for ax in range(3):
            if ext[ax] < 1e-300:
                continue
            b = np.clip(((c[:, ax] - cmin[ax]) * bins * 0.999999
                         / ext[ax]).astype(int), 0, bins - 1)
            cnt = np.bincount(b, minlength=bins)
            bmn = np.full((bins, 3), FAR)
            bmx = np.full((bins, 3), -FAR)
            np.minimum.at(bmn, b, fmin[ids])
            np.maximum.at(bmx, b, fmax[ids])
            lmin = np.minimum.accumulate(bmn, 0)
            lmax = np.maximum.accumulate(bmx, 0)
            rmin = np.minimum.accumulate(bmn[::-1], 0)[::-1]
            rmax = np.maximum.accumulate(bmx[::-1], 0)[::-1]
            nl = np.cumsum(cnt)[:-1]
            nr = cnt.sum() - nl
            cost = np.where(
                (nl == 0) | (nr == 0), FAR,
                ha(lmin[:-1], lmax[:-1]) * nl + ha(rmin[1:], rmax[1:]) * nr,
            )
            k = int(np.argmin(cost))
            if cost[k] < best[0]:
                best = (cost[k], ax, k, b)
        area = ha(node_min[node], node_max[node])
        no_split = C_INT * len(ids)
        if best[1] >= 0:
            split = C_TRAV + C_INT * best[0] / max(area, 1e-300)
        else:
            split = FAR
        if (split >= no_split and len(ids) <= (max_leaf or len(ids))) or \
           best[1] < 0:
            count[node] = len(ids)
            left_first[node] = len(order)
            order.extend(ids.tolist())
            return
        _, ax, k, b = best
        lm = b <= k
        lids, rids = ids[lm], ids[~lm]
        if not len(lids) or not len(rids):
            half = len(ids) // 2
            o2 = np.argsort(c[:, ax], kind="stable")
            lm = np.zeros(len(ids), bool)
            lm[o2[:half]] = True
            lids, rids = ids[lm], ids[~lm]
        l = n_used[0]
        n_used[0] += 2
        left_first[node] = l
        count[node] = 0
        for child, cids in ((l, lids), (l + 1, rids)):
            node_min[child] = fmin[cids].min(axis=0)
            node_max[child] = fmax[cids].max(axis=0)
            build(child, cids)

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(100000)
    try:
        build(0, idx)
    finally:
        sys.setrecursionlimit(old)
    return (node_min, node_max, left_first, count,
            np.asarray(order, np.int64), n_used[0])


class BVHDouble:
    """Build + traverse in float64. API mirrors api.BVH."""

    def __init__(self, tris, max_leaf: int = 4):
        tris = np.asarray(tris, np.float64)
        if tris.ndim != 3 or tris.shape[1:] != (3, 3) or not len(tris):
            raise ValueError(f"triangles must be (N, 3, 3), got {tris.shape}")
        self.tris = tris
        self._build(max_leaf)

    # -- build: serial binned SAH, f64 throughout ------------------------
    def _build(self, max_leaf, bins=8):
        tris = self.tris
        fmin = tris.min(axis=1)
        fmax = tris.max(axis=1)
        (self.node_min, self.node_max, self.left_first, self.count,
         self.prim_idx, self.n_nodes) = _sah_build_f64(
            fmin, fmax, max_leaf, bins)

    # -- traversal: vectorized batch, f64 --------------------------------
    def intersect(self, o, d, t_max=FAR):
        """o, d: (R, 3) float64 → dict(t, u, v, prim)."""
        o = np.asarray(o, np.float64)
        d = np.asarray(d, np.float64)
        R = o.shape[0]
        rd = np.where(np.abs(d) > 1e-300, 1 / np.where(d == 0, 1, d),
                      np.where(d < 0, -FAR, FAR))
        t = np.full(R, min(t_max, FAR))
        u = np.zeros(R)
        v = np.zeros(R)
        prim = np.full(R, -1, np.int64)
        tris = self.tris[self.prim_idx] if len(self.prim_idx) else self.tris

        for i in range(R):
            t[i], u[i], v[i], prim[i] = self._trace1(
                o[i], d[i], rd[i], t[i], tris
            )
        return dict(t=t, u=u, v=v, prim=prim)

    def _trace1(self, o, d, rd, t, tris):
        stack = [(0, 0.0)]
        bu = bv = 0.0
        bp = -1
        while stack:
            node, dist = stack.pop()
            if dist >= t:
                continue
            if self.count[node] > 0:
                s, c = self.left_first[node], self.count[node]
                for k in range(s, s + c):
                    v0, v1, v2 = tris[k]
                    e1, e2 = v1 - v0, v2 - v0
                    h = np.cross(d, e2)
                    det = e1 @ h
                    if abs(det) < 1e-12:
                        continue
                    inv = 1 / det
                    sv = o - v0
                    uu = (sv @ h) * inv
                    if uu < 0 or uu > 1:
                        continue
                    q = np.cross(sv, e1)
                    vv = (d @ q) * inv
                    if vv < 0 or uu + vv > 1:
                        continue
                    tt = (e2 @ q) * inv
                    if 1e-12 < tt < t:
                        t, bu, bv = tt, uu, vv
                        bp = int(self.prim_idx[k])
                continue
            l = self.left_first[node]
            hits = []
            for ch in (l, l + 1):
                t1 = (self.node_min[ch] - o) * rd
                t2 = (self.node_max[ch] - o) * rd
                tmin = np.minimum(t1, t2).max()
                tmax = np.maximum(t1, t2).min()
                if tmax >= tmin and tmin < t and tmax >= 0:
                    hits.append((tmin, ch))
            hits.sort(reverse=True)  # far first → near popped first
            stack.extend((ch, tm) for tm, ch in hits)
        return t, bu, bv, bp

    def is_occluded(self, o, d, t_max=FAR):
        """Any-hit occlusion query, early-exit per ray (≙ the reference's
        BVH_Double::IsOccluded, tiny_bvh.h:8270-8361)."""
        o = np.asarray(o, np.float64)
        d = np.asarray(d, np.float64)
        R = o.shape[0]
        rd = np.where(np.abs(d) > 1e-300, 1 / np.where(d == 0, 1, d),
                      np.where(d < 0, -FAR, FAR))
        tris = self.tris[self.prim_idx] if len(self.prim_idx) else self.tris
        out = np.zeros(R, bool)
        for i in range(R):
            out[i] = self._occluded1(o[i], d[i], rd[i], t_max, tris)
        return out

    def _occluded1(self, o, d, rd, t_max, tris):
        stack = [0]
        while stack:
            node = stack.pop()
            t1 = (self.node_min[node] - o) * rd
            t2 = (self.node_max[node] - o) * rd
            tmin = np.minimum(t1, t2).max()
            tmax = np.maximum(t1, t2).min()
            if tmax < tmin or tmin >= t_max or tmax < 0:
                continue
            if self.count[node] > 0:
                s, c = self.left_first[node], self.count[node]
                for k in range(s, s + c):
                    v0, v1, v2 = tris[k]
                    e1, e2 = v1 - v0, v2 - v0
                    h = np.cross(d, e2)
                    det = e1 @ h
                    if abs(det) < 1e-12:
                        continue
                    inv = 1 / det
                    sv = o - v0
                    uu = (sv @ h) * inv
                    if uu < 0 or uu > 1:
                        continue
                    q = np.cross(sv, e1)
                    vv = (d @ q) * inv
                    if vv < 0 or uu + vv > 1:
                        continue
                    tt = (e2 @ q) * inv
                    if 1e-12 < tt < t_max:
                        return True
                continue
            l = self.left_first[node]
            stack.extend((l, l + 1))
        return False

    def sah_cost(self):
        def ha(mn, mx):
            e = np.maximum(mx - mn, 0)
            return e[0] * e[1] + e[1] * e[2] + e[2] * e[0]

        total = 0.0
        stack = [0]
        while stack:
            n = stack.pop()
            a = ha(self.node_min[n], self.node_max[n])
            if self.count[n] > 0:
                total += C_INT * self.count[n] * a
            else:
                total += C_TRAV * a
                stack.extend((self.left_first[n], self.left_first[n] + 1))
        return total / max(ha(self.node_min[0], self.node_max[0]), 1e-300)


class BLASInstanceEx:
    """Double-precision BLAS instance (≙ BLASInstanceEx,
    tiny_bvh.h:8432-8474): 4x4 f64 transform + inverse + world-space AABB
    of the referenced BLAS root, plus the 16-bit visibility mask."""

    def __init__(self, blas_id: int, transform=None, mask: int = 0xFFFF):
        self.blas_id = int(blas_id)
        self.mask = int(mask)
        t = np.eye(4) if transform is None else np.asarray(
            transform, np.float64).reshape(4, 4)
        self.transform = t
        self.inv = np.linalg.inv(t)
        self.aabb_min = None  # world AABB, set by TLASDouble from the BLAS
        self.aabb_max = None

    def update(self, blas: BVHDouble):
        """Transform the BLAS root AABB into world space
        (≙ BLASInstanceEx::Update, tiny_bvh.h:8442-8456)."""
        mn, mx = blas.node_min[0], blas.node_max[0]
        cs = np.array([[x, y, z, 1.0]
                       for x in (mn[0], mx[0])
                       for y in (mn[1], mx[1])
                       for z in (mn[2], mx[2])], np.float64)
        wc = cs @ self.transform.T
        self.aabb_min = wc[:, :3].min(axis=0)
        self.aabb_max = wc[:, :3].max(axis=0)


class TLASDouble:
    """Double-precision two-level structure: a SAH BVH over instance world
    AABBs whose leaves dispatch into per-instance BVHDouble BLASes
    (≙ BVH_Double::Build(BLASInstanceEx*,...) + IntersectTLAS,
    tiny_bvh.h:7943-7979, 8203-8268)."""

    def __init__(self, instances: list, blasses: list):
        self.instances = instances
        self.blasses = blasses
        for inst in instances:
            inst.update(blasses[inst.blas_id])
        fmin = np.stack([i.aabb_min for i in instances])
        fmax = np.stack([i.aabb_max for i in instances])
        (self.node_min, self.node_max, self.left_first, self.count,
         self.inst_idx, self.n_nodes) = _sah_build_f64(
            fmin, fmax, max_leaf=2)

    def _leaf_instances(self, node):
        s, c = self.left_first[node], self.count[node]
        return [int(self.inst_idx[k]) for k in range(s, s + c)]

    def intersect(self, o, d, t_max=FAR, mask=0xFFFF):
        """Closest hit over all instances. Returns dict with world-space t,
        barycentric u/v, prim id within the BLAS, and instance id."""
        o = np.asarray(o, np.float64)
        d = np.asarray(d, np.float64)
        R = o.shape[0]
        t = np.full(R, min(t_max, FAR))
        u = np.zeros(R)
        v = np.zeros(R)
        prim = np.full(R, -1, np.int64)
        inst_out = np.full(R, -1, np.int64)
        masks = np.broadcast_to(np.asarray(mask, np.int64), (R,))
        for i in range(R):
            t[i], u[i], v[i], prim[i], inst_out[i] = self._trace1(
                o[i], d[i], t[i], int(masks[i]))
        return dict(t=t, u=u, v=v, prim=prim, inst=inst_out)

    def _trace1(self, o, d, t, ray_mask):
        rd = np.where(np.abs(d) > 1e-300, 1 / np.where(d == 0, 1, d),
                      np.where(d < 0, -FAR, FAR))
        bu = bv = 0.0
        bp = bi = -1
        stack = [(0, 0.0)]
        while stack:
            node, dist = stack.pop()
            if dist >= t:
                continue
            if self.count[node] > 0:
                for ii in self._leaf_instances(node):
                    inst = self.instances[ii]
                    if not (inst.mask & ray_mask):
                        continue
                    blas = self.blasses[inst.blas_id]
                    # ray into BLAS space; direction NOT renormalized so the
                    # hit parameter stays in world units (tiny_bvh.h:8232)
                    oh = inst.inv @ np.append(o, 1.0)
                    dh = inst.inv[:3, :3] @ d
                    ol, dl = oh[:3], dh
                    rdl = np.where(np.abs(dl) > 1e-300,
                                   1 / np.where(dl == 0, 1, dl),
                                   np.where(dl < 0, -FAR, FAR))
                    tris = (blas.tris[blas.prim_idx]
                            if len(blas.prim_idx) else blas.tris)
                    nt, nu, nv, npr = blas._trace1(ol, dl, rdl, t, tris)
                    if npr >= 0 and nt < t:
                        t, bu, bv, bp, bi = nt, nu, nv, npr, ii
                continue
            l = self.left_first[node]
            hits = []
            for ch in (l, l + 1):
                t1 = (self.node_min[ch] - o) * rd
                t2 = (self.node_max[ch] - o) * rd
                tmin = np.minimum(t1, t2).max()
                tmax = np.maximum(t1, t2).min()
                if tmax >= tmin and tmin < t and tmax >= 0:
                    hits.append((tmin, ch))
            hits.sort(reverse=True)
            stack.extend((ch, tm) for tm, ch in hits)
        return t, bu, bv, bp, bi

    def is_occluded(self, o, d, t_max=FAR, mask=0xFFFF):
        """Any-hit over all instances, early exit
        (≙ IsOccludedTLAS, tiny_bvh.h:8300-8361)."""
        o = np.asarray(o, np.float64)
        d = np.asarray(d, np.float64)
        R = o.shape[0]
        out = np.zeros(R, bool)
        masks = np.broadcast_to(np.asarray(mask, np.int64), (R,))
        for i in range(R):
            out[i] = self._occluded1(o[i], d[i], t_max, int(masks[i]))
        return out

    def _occluded1(self, o, d, t_max, ray_mask):
        rd = np.where(np.abs(d) > 1e-300, 1 / np.where(d == 0, 1, d),
                      np.where(d < 0, -FAR, FAR))
        stack = [0]
        while stack:
            node = stack.pop()
            t1 = (self.node_min[node] - o) * rd
            t2 = (self.node_max[node] - o) * rd
            tmin = np.minimum(t1, t2).max()
            tmax = np.maximum(t1, t2).min()
            if tmax < tmin or tmin >= t_max or tmax < 0:
                continue
            if self.count[node] > 0:
                for ii in self._leaf_instances(node):
                    inst = self.instances[ii]
                    if not (inst.mask & ray_mask):
                        continue
                    blas = self.blasses[inst.blas_id]
                    oh = inst.inv @ np.append(o, 1.0)
                    dl = inst.inv[:3, :3] @ d
                    rdl = np.where(np.abs(dl) > 1e-300,
                                   1 / np.where(dl == 0, 1, dl),
                                   np.where(dl < 0, -FAR, FAR))
                    tris = (blas.tris[blas.prim_idx]
                            if len(blas.prim_idx) else blas.tris)
                    if blas._occluded1(oh[:3], dl, rdl, t_max, tris):
                        return True
                continue
            l = self.left_first[node]
            stack.extend((l, l + 1))
        return False
