"""BVH serialization + build cache.

Counterpart of the reference's Save/Load (tiny_bvh.h:1747-1799, per-layout
variants at 4779, 5404, 5614, 5786) and the scene layer's disk BVH cache
(Scene::CacheBVHs, tiny_scene.h:2035-2113). Arrays are stored as .npz with
a version + layout tag (≙ TINY_BVH_CACHE_VERSION + (layout << 24),
tiny_bvh.h:97,1778-1787); loads fail cleanly on mismatch. The cache keys on
a geometry hash, so deformed scenes rebuild automatically.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import jax.numpy as jnp

CACHE_VERSION = 1

_LAYOUTS = {"BVH2": 0, "BVH8": 1, "TLAS8": 2, "BVH8Q": 3}


def _tag(layout: str) -> int:
    return CACHE_VERSION | (_LAYOUTS[layout] << 24)


def save_bvh(path: str, obj) -> None:
    from tinybvh_tpu.layouts.bvh2 import BVH2
    from tinybvh_tpu.layouts.cwbvh import BVH8Q
    from tinybvh_tpu.layouts.mbvh import BVH8
    from tinybvh_tpu.tlas.instance import TLAS8

    if isinstance(obj, BVH2):
        layout = "BVH2"
        arrays = dict(
            node_min=obj.node_min, node_max=obj.node_max,
            left_first=obj.left_first, count=obj.count,
            prim_idx=obj.prim_idx, n_nodes=obj.n_nodes,
        )
    elif isinstance(obj, BVH8):
        layout = "BVH8"
        arrays = dict(
            bounds=obj.bounds, child=obj.child,
            leaf_tris=obj.leaf_tris, leaf_prim=obj.leaf_prim,
        )
    elif isinstance(obj, BVH8Q):
        layout = "BVH8Q"
        arrays = dict(
            origin=obj.origin, scale=obj.scale, qbounds=obj.qbounds,
            child=obj.child, leaf_tris=obj.leaf_tris,
            leaf_prim=obj.leaf_prim,
        )
    elif isinstance(obj, TLAS8):
        layout = "TLAS8"
        arrays = dict(
            bounds=obj.bounds, child=obj.child,
            leaf_tris=obj.leaf_tris, leaf_prim=obj.leaf_prim,
            inst_inv=obj.inst_inv, inst_mask=obj.inst_mask,
            inst_root=obj.inst_root,
            n_leaf_rows=np.asarray(obj.n_leaf_rows),
        )
    else:
        raise TypeError(f"cannot serialize {type(obj)}")
    np.savez(
        path, __tag__=np.asarray(_tag(layout), np.int64),
        **{k: np.asarray(v) for k, v in arrays.items()},
    )


def load_bvh(path: str):
    """Returns the deserialized structure, or None on version/layout
    mismatch or corruption (≙ Load returning false, tiny_bvh.h:1778-1787).
    """
    from tinybvh_tpu.layouts.bvh2 import BVH2
    from tinybvh_tpu.layouts.cwbvh import BVH8Q
    from tinybvh_tpu.layouts.mbvh import BVH8
    from tinybvh_tpu.tlas.instance import TLAS8

    try:
        data = np.load(path)
        tag = int(data["__tag__"])
    except Exception:
        return None
    if tag & 0xFFFFFF != CACHE_VERSION:
        return None
    layout = tag >> 24
    j = lambda k: jnp.asarray(data[k])
    if layout == _LAYOUTS["BVH2"]:
        return BVH2(
            node_min=j("node_min"), node_max=j("node_max"),
            left_first=j("left_first"), count=j("count"),
            prim_idx=j("prim_idx"), n_nodes=j("n_nodes"),
        )
    if layout == _LAYOUTS["BVH8"]:
        return BVH8(
            bounds=j("bounds"), child=j("child"),
            leaf_tris=j("leaf_tris"), leaf_prim=j("leaf_prim"),
        )
    if layout == _LAYOUTS["BVH8Q"]:
        return BVH8Q(
            origin=j("origin"), scale=j("scale"), qbounds=j("qbounds"),
            child=j("child"), leaf_tris=j("leaf_tris"),
            leaf_prim=j("leaf_prim"),
        )
    if layout == _LAYOUTS["TLAS8"]:
        return TLAS8(
            bounds=j("bounds"), child=j("child"),
            leaf_tris=j("leaf_tris"), leaf_prim=j("leaf_prim"),
            inst_inv=j("inst_inv"), inst_mask=j("inst_mask"),
            inst_root=j("inst_root"),
            n_leaf_rows=int(data["n_leaf_rows"]),
        )
    return None


def geometry_hash(tris) -> str:
    """Stable key for the build cache."""
    a = np.ascontiguousarray(np.asarray(tris, np.float32))
    return hashlib.sha1(a.tobytes()).hexdigest()[:16]


def cached_build(tris, builder, cache_dir: str = "./cache", suffix: str = ""):
    """Load-or-build-then-save (≙ the per-mesh ./cache/<file>.bvh pattern,
    tiny_scene.h:2035-2113). The cache key hashes the geometry AND the
    builder's identity (module.qualname + repr of any functools.partial
    args), so the same mesh built with different builders or parameters
    never aliases; `suffix` remains for extra caller-side discrimination."""
    os.makedirs(cache_dir, exist_ok=True)
    key = geometry_hash(tris)
    import functools

    b = builder
    params = ""
    if isinstance(b, functools.partial):
        params = repr((b.args, sorted(b.keywords.items())))
        b = b.func
    ident = f"{getattr(b, '__module__', '')}.{getattr(b, '__qualname__', repr(b))}{params}"
    bkey = hashlib.sha1(ident.encode()).hexdigest()[:8]
    path = os.path.join(cache_dir, f"{key}-{bkey}{suffix}.npz")
    if os.path.exists(path):
        got = load_bvh(path)
        if got is not None:
            return got
    built = builder(tris)
    save_bvh(path, built)
    return built
