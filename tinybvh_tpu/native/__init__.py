"""Native (C) runtime components, loaded through ctypes.

The reference's builders are native C++ (tiny_bvh.h); the latency-bound
host-side build here is likewise native. The shared library is compiled
from builder.c on first use and cached next to the source; if no C
compiler is available the callers fall back to the numpy builder.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "builder.c")
_LIB = os.path.join(_DIR, "libtinybvh.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["cc", "-O3", "-march=native", "-shared", "-fPIC",
                 _SRC, "-o", _LIB + ".tmp"],
                check=True, capture_output=True,
            )
            os.replace(_LIB + ".tmp", _LIB)
        lib = ctypes.CDLL(_LIB)
        fn = lib.tinybvh_build_binned
        fn.restype = ctypes.c_int32
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        fc = lib.tinybvh_collapse_bvh8
        fc.restype = ctypes.c_int32
        fc.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def collapse_bvh8_native(host: dict, tris, width: int = 8,
                         combine: int = 4):
    """C 8-wide collapse with on-the-fly leaf combining (builder.c:
    tinybvh_collapse_bvh8) — ≙ CombineLeafs(4) + MBVH<8>::ConvertFrom
    (tiny_bvh.h:3099-3139, 4975-5048) fused into one native pass.

    host: dict from build_binned_native(return_host=True) (node_min/max,
    left_first, count, prim_idx, n_nodes). tris: (N, 3, 3) float32.
    combine: subtrees whose prims form a contiguous range of <= combine
    become single packed leaves (0 = plain collapse, python-twin parity).
    Returns dict(bounds, child, leaf_tris, leaf_prim) like
    collapse_bvh2(as_host=True), or None (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(np.asarray(tris, np.float32).reshape(-1, 9))
    n_tris = tris.shape[0]
    n_nodes = int(host["n_nodes"])
    node_min = np.ascontiguousarray(host["node_min"][:n_nodes], np.float32)
    node_max = np.ascontiguousarray(host["node_max"][:n_nodes], np.float32)
    left_first = np.ascontiguousarray(host["left_first"][:n_nodes], np.int32)
    count = np.ascontiguousarray(host["count"][:n_nodes], np.int32)
    prim_idx = np.ascontiguousarray(host["prim_idx"], np.int32)
    cap_n = max(n_nodes, 2)
    cap_l = n_tris + 8
    bounds = np.empty((cap_n, 48), np.float32)
    child = np.empty((cap_n, 8), np.int32)
    leaf_tris = np.empty((cap_l, 36), np.float32)
    leaf_prim = np.empty((cap_l, 4), np.int32)
    n_leaves = np.zeros(1, np.int32)

    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    pi = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    n_out = lib.tinybvh_collapse_bvh8(
        p(node_min), p(node_max), pi(left_first), pi(count), n_nodes,
        pi(prim_idx), p(tris), width, 4, combine,
        p(bounds), pi(child), p(leaf_tris), pi(leaf_prim), pi(n_leaves))
    if n_out < 0:
        return None
    nl = int(n_leaves[0])
    return dict(bounds=bounds[:n_out].copy(),
                child=child[:n_out].copy(),
                leaf_tris=leaf_tris[:nl].reshape(nl, 4, 3, 3).copy(),
                leaf_prim=leaf_prim[:nl].copy())


def build_binned_native(tris, max_leaf: int = 4, return_host: bool = False,
                        make_device: bool = True):
    """C binned-SAH build → BVH2 (same conventions as builders.binned).

    Returns None if the native library is unavailable. With return_host,
    returns (BVH2, host_arrays_dict) — device→host readbacks cost minutes
    through this environment's TPU tunnel, so callers should keep the host
    copies for metadata (leaf_max, root AABB, …). make_device=False skips
    the ~5-arrays H2D upload and returns (None, host): callers that only
    need the host tree (api.BVH materializes device arrays lazily) avoid
    paying tunnel time for arrays the packet engines never read.
    """
    import jax.numpy as jnp

    from tinybvh_tpu.layouts.bvh2 import BVH2

    lib = _load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(np.asarray(tris, np.float32).reshape(-1, 9))
    n = tris.shape[0]
    m = 2 * n + 2
    node_min = np.empty((m, 3), np.float32)
    node_max = np.empty((m, 3), np.float32)
    left_first = np.zeros(m, np.int32)
    count = np.zeros(m, np.int32)
    prim_idx = np.empty(n, np.int32)
    fmin = np.empty((n, 3), np.float32)
    fmax = np.empty((n, 3), np.float32)
    cent = np.empty((n, 3), np.float32)

    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    pi = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    n_used = lib.tinybvh_build_binned(
        p(tris), n, max_leaf or 0,
        p(node_min), p(node_max), pi(left_first), pi(count), pi(prim_idx),
        p(fmin), p(fmax), p(cent),
    )
    # unused pool slots: degenerate boxes (traversal never reaches them)
    node_min[n_used:] = 1e30
    node_max[n_used:] = -1e30
    node_min[1] = 1e30
    node_max[1] = -1e30
    host = dict(node_min=node_min, node_max=node_max, left_first=left_first,
                count=count, prim_idx=prim_idx, n_nodes=int(n_used))
    if not make_device:
        return (None, host) if return_host else None
    out = BVH2(
        node_min=jnp.asarray(node_min),
        node_max=jnp.asarray(node_max),
        left_first=jnp.asarray(left_first),
        count=jnp.asarray(count),
        prim_idx=jnp.asarray(prim_idx),
        n_nodes=jnp.asarray(int(n_used), jnp.int32),
    )
    return (out, host) if return_host else out
