"""Layout transform tests (leaf shaping)."""

import numpy as np
import jax.numpy as jnp

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.io.loaders import random_tris


def test_combine_and_split_leafs(rng):
    """Leaf-shape transforms (≙ CombineLeafs/SplitLeafs,
    tiny_bvh.h:3099-3139, 1988-2018): traversal results are invariant,
    leaf sizes obey the bound, and combine enables the wide collapse."""
    from tinybvh_tpu.core.intersect import brute_force_closest
    from tinybvh_tpu.layouts.leafshape import combine_leafs, split_leafs
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2
    from tinybvh_tpu.traverse.stack import intersect_bvh2, pack_tris

    tris = random_tris(300, seed=3)
    tj = jnp.asarray(tris)
    fine = build_binned(tris, max_leaf=1)       # 1-prim leaves

    comb = combine_leafs(fine, max_prims=4)
    used = np.arange(comb.capacity) < int(np.asarray(comb.n_nodes))
    used[1] = False
    cts = np.asarray(comb.count)[used]
    assert cts.max() <= 4 and (cts > 1).any()   # actually combined

    o = rng.uniform(-2, 3, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    ref = brute_force_closest(rays, tj)
    lm = int(np.asarray(comb.count).max())
    h = intersect_bvh2(comb, pack_tris(comb, tj), rays, leaf_max=lm)
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(ref.prim))

    # combined tree feeds the 8-wide collapse (≙ BVH8_CPU's preprocessing)
    bvh8 = collapse_bvh2(comb, tj)
    from tinybvh_tpu.traverse.wide import intersect_bvh8
    h8 = intersect_bvh8(bvh8, rays)
    np.testing.assert_array_equal(np.asarray(h8.prim), np.asarray(ref.prim))

    # split: big leaves -> <= 4-prim leaves, traversal unchanged
    coarse = build_binned(tris, max_leaf=None)  # SAH-chosen (can be big)
    big = int(np.asarray(coarse.count).max())
    sp = split_leafs(coarse, max_prims=4)
    assert int(np.asarray(sp.count).max()) <= min(big, 4) or big <= 4
    lm2 = int(np.asarray(sp.count).max())
    h2 = intersect_bvh2(sp, pack_tris(sp, tj), rays, leaf_max=max(lm2, 1))
    np.testing.assert_array_equal(np.asarray(h2.prim), np.asarray(ref.prim))
