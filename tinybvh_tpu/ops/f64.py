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
        N = tris.shape[0]
        fmin = tris.min(axis=1)
        fmax = tris.max(axis=1)
        cent = (fmin + fmax) / 2
        M = 2 * N + 2
        self.node_min = np.full((M, 3), FAR)
        self.node_max = np.full((M, 3), -FAR)
        self.left_first = np.zeros(M, np.int64)
        self.count = np.zeros(M, np.int64)
        idx = np.arange(N)
        self.node_min[0] = fmin.min(axis=0)
        self.node_max[0] = fmax.max(axis=0)
        n_used = [2]
        order = []

        def ha(mn, mx):
            e = np.maximum(mx - mn, 0)
            return e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] + e[..., 2] * e[..., 0]

        def build(node, ids):
            if len(ids) <= 1:
                self.count[node] = len(ids)
                self.left_first[node] = len(order)
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
            area = ha(self.node_min[node], self.node_max[node])
            no_split = C_INT * len(ids)
            if best[1] >= 0:
                split = C_TRAV + C_INT * best[0] / max(area, 1e-300)
            else:
                split = FAR
            if (split >= no_split and len(ids) <= (max_leaf or len(ids))) or \
               best[1] < 0:
                self.count[node] = len(ids)
                self.left_first[node] = len(order)
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
            self.left_first[node] = l
            self.count[node] = 0
            for child, cids in ((l, lids), (l + 1, rids)):
                self.node_min[child] = fmin[cids].min(axis=0)
                self.node_max[child] = fmax[cids].max(axis=0)
                build(child, cids)

        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(100000)
        try:
            build(0, idx)
        finally:
            sys.setrecursionlimit(old)
        self.n_nodes = n_used[0]
        self.prim_idx = np.asarray(order, np.int64)

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
