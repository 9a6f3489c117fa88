"""8-wide BVH layout: SoA node table + packed 4-triangle leaves.

TPU-native counterpart of the reference's wide CPU layouts
(MBVH<8> collapse, tiny_bvh.h:4975-5048; BVH8_CPU node packing,
tiny_bvh.h:5664-5763). Differences by design:

  * Node = one contiguous (48,) f32 row [minx·8|miny·8|minz·8|maxx·8|maxy·8
    |maxz·8] plus one (8,) i32 child row — a traversal step is exactly two
    row gathers, dense 8-lane slab tests on the VPU, no bit-packed perm LUTs
    (ordering is computed from the 8 distances at runtime).
  * Leaves are rows of a (L, 4, 3, 3) triangle table padded with degenerate
    (all-zero) triangles, so leaf intersection is a fixed dense 4-lane
    Möller–Trumbore with no count logic (the reference's BVHTri4Leaf SoA,
    tiny_bvh.h:1364-1378, needs masked tails instead).
  * Empty child slots carry inverted (+FAR/−FAR) boxes: the slab test
    rejects them with no special casing.

child[i] >= 0 → child node row; child[i] < 0 → leaf row -(child[i]+1).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.layouts.bvh2 import BVH2

# Child word marking an unused slot. Traversal must mask these out
# explicitly: with a min/max-sorted slab test an inverted (+FAR/-FAR) box
# "hits" with dist -inf, so the box alone cannot encode emptiness.
EMPTY_SLOT = -(2**31) + 1


@struct.dataclass
class BVH8:
    bounds: jnp.ndarray  # (M, 48) f32
    child: jnp.ndarray  # (M, 8) i32
    leaf_tris: jnp.ndarray  # (L, 4, 3, 3) f32
    leaf_prim: jnp.ndarray  # (L, 4) i32 global prim ids (-1 padding)

    @property
    def n_nodes(self):
        return self.bounds.shape[0]

    @property
    def n_leaves(self):
        return self.leaf_tris.shape[0]


def collapse_bvh2(bvh: BVH2, tris, width: int = 8, leaf_width: int = 4,
                  host: dict | None = None, tris_dev=None,
                  as_host: bool = False):
    """Collapse a BVH2 into the wide layout (host-side).

    Mirrors MBVH<M>::ConvertFrom (tiny_bvh.h:4975-5048): greedily adopt the
    grandchildren of the child with the largest surface area until the node
    has `width` children or only leaves remain. BVH2 leaves must have
    count <= leaf_width (build with max_leaf=leaf_width).

    width < 8 (e.g. 4 ≙ MBVH<4>/BVH4_CPU, tiny_bvh.h:1291) limits the
    branching factor but keeps the physical 8-slot row format so every
    traversal engine works unchanged (the unused slots stay EMPTY_SLOT).

    tris_dev: optional device-resident (N, 3, 3) triangle array. When
    given (and tris is None), leaf_tris is GATHERED ON DEVICE from it —
    for callers whose triangles only exist on device (refit re-collapse),
    where a host gather would cost a D2H readback (minutes through the
    tunnel). Callers with host triangles should pass them instead: H2D
    is fast here, but every eager device op pays a per-shape remote
    compile.

    as_host: return a dict of NUMPY arrays (bounds, child, leaf_tris,
    leaf_prim) instead of a device BVH8 — for the all-host build path
    (api.BVH) that uploads once and builds the packet tables in numpy.
    """
    assert 2 <= width <= 8
    if as_host:
        assert tris is not None, "as_host needs host triangles"
        tris_dev = None
    if host is not None:
        # device→host readbacks cost minutes through this environment's
        # TPU tunnel; builders that kept host copies pass them in
        mn, mx = host["node_min"], host["node_max"]
        lf, ct = host["left_first"], host["count"]
        pidx = host["prim_idx"]
    else:
        mn = np.asarray(bvh.node_min)
        mx = np.asarray(bvh.node_max)
        lf = np.asarray(bvh.left_first)
        ct = np.asarray(bvh.count)
        pidx = np.asarray(bvh.prim_idx)
    tris_np = None if tris_dev is not None else np.asarray(tris, np.float32)
    assert int(ct.max()) <= leaf_width, (
        f"BVH2 leaves up to {int(ct.max())} prims; rebuild with "
        f"max_leaf={leaf_width}"
    )

    def area(i):
        e = np.maximum(mx[i] - mn[i], 0)
        return e[0] * e[1] + e[1] * e[2] + e[2] * e[0]

    node_bounds = []
    node_child = []
    leaf_tris = []
    leaf_prim = []

    def add_leaf(b2node) -> int:
        first, cnt = lf[b2node], ct[b2node]
        ids = pidx[first : first + cnt]
        p = np.full(leaf_width, -1, np.int64)
        p[:cnt] = ids
        leaf_prim.append(p)
        if tris_np is not None:
            t = np.zeros((leaf_width, 3, 3), np.float32)
            t[:cnt] = tris_np[ids]
            leaf_tris.append(t)
        return len(leaf_prim) - 1

    # breadth-first emission; work items are (bvh2_node, my_row)
    if ct[0] > 0:  # root is a leaf: single node with one leaf child
        row_b = np.full((6, 8), BVH_FAR, np.float32)
        row_b[3:] = -BVH_FAR
        row_c = np.full(8, EMPTY_SLOT, np.int64)
        row_b[:3, 0] = mn[0]
        row_b[3:, 0] = mx[0]
        row_c[0] = -(add_leaf(0) + 1)
        node_bounds.append(row_b)
        node_child.append(row_c)
    else:
        node_bounds.append(None)
        node_child.append(None)
        work = [(0, 0)]
        while work:
            b2node, row = work.pop()
            kids = [lf[b2node], lf[b2node] + 1]
            # grow: replace the largest-area interior child by its children
            while len(kids) < width:
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
            row_b = np.full((6, 8), BVH_FAR, np.float32)
            row_b[3:] = -BVH_FAR
            row_c = np.full(8, EMPTY_SLOT, np.int64)
            for k, c in enumerate(kids):
                row_b[:3, k] = mn[c]
                row_b[3:, k] = mx[c]
                if ct[c] > 0:
                    row_c[k] = -(add_leaf(c) + 1)
                else:
                    node_bounds.append(None)
                    node_child.append(None)
                    new_row = len(node_bounds) - 1
                    row_c[k] = new_row
                    work.append((c, new_row))
            node_bounds[row] = row_b
            node_child[row] = row_c

    bounds = np.stack([b.reshape(-1) for b in node_bounds]).astype(np.float32)
    child = np.stack(node_child).astype(np.int32)
    lp_np = np.stack(leaf_prim).astype(np.int32)
    if as_host:
        return dict(bounds=bounds, child=child,
                    leaf_tris=np.stack(leaf_tris).astype(np.float32),
                    leaf_prim=lp_np)
    lp = jnp.asarray(lp_np)
    if tris_np is not None:
        lt = jnp.asarray(np.stack(leaf_tris), jnp.float32)
    else:
        n = tris_dev.shape[0]
        lt = jnp.where((lp >= 0)[..., None, None],
                       tris_dev[jnp.clip(lp, 0, n - 1)], 0.0)
    return BVH8(
        bounds=jnp.asarray(bounds),
        child=jnp.asarray(child),
        leaf_tris=lt,
        leaf_prim=lp,
    )
