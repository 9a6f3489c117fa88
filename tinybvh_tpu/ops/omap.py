"""Opacity micromaps: per-triangle S×S alpha bit grids.

Counterpart of the reference's opacity micromaps (SetOpacityMicroMaps,
tiny_bvh.h:822-826, consulted after the triangle hit at 8514-8522) and the
scene-side baker (tiny_scene.h:1682-1750, which rasterizes the alpha
texture over each triangle's barycentric grid).

The grid is indexed by floor(u·S), floor(v·S) over the barycentric domain
(cells with iu+iv ≥ S lie outside the triangle and are never queried).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def bake_omap(n_tris: int, alpha_fn, S: int = 8) -> jnp.ndarray:
    """Bake (N, S, S) bool maps. alpha_fn(prim, u, v) → bool opacity, where
    prim (K,), u, v (K,) are cell-center barycentrics; must be vectorized.
    """
    prim = np.repeat(np.arange(n_tris), S * S)
    iu, iv = np.meshgrid(np.arange(S), np.arange(S), indexing="ij")
    u = ((iu.reshape(-1) + 0.5) / S).astype(np.float32)
    v = ((iv.reshape(-1) + 0.5) / S).astype(np.float32)
    u = np.tile(u, n_tris)
    v = np.tile(v, n_tris)
    bits = np.asarray(alpha_fn(prim, u, v), bool).reshape(n_tris, S, S)
    return jnp.asarray(bits)


def bake_omap_texture(uv_tri, alpha, S: int = 8,
                      thresh: float = 0.5) -> jnp.ndarray:
    """Bake (N, S, S) opacity maps from an alpha texture threaded over each
    triangle's UVs (≙ the reference's texture-driven baker,
    tiny_scene.h:1682-1750: rasterize the alpha channel into S² bits/tri).

    uv_tri: (N, 3, 2) per-corner texture coordinates (wrap addressing);
    alpha: (H, W) array in [0, 1]; a micro-cell is opaque when the texel at
    its barycentric center has alpha >= thresh.
    """
    uv_tri = np.asarray(uv_tri, np.float32)
    a = np.asarray(alpha, np.float32)
    H, W = a.shape

    def alpha_fn(prim, u, v):
        uvs = uv_tri[prim]                                   # (K, 3, 2)
        w = 1.0 - u - v
        uv = (w[:, None] * uvs[:, 0] + u[:, None] * uvs[:, 1]
              + v[:, None] * uvs[:, 2])
        x = np.clip(((uv[:, 0] % 1.0) * W).astype(np.int64), 0, W - 1)
        y = np.clip(((uv[:, 1] % 1.0) * H).astype(np.int64), 0, H - 1)
        return a[y, x] >= thresh

    return bake_omap(uv_tri.shape[0], alpha_fn, S)


def leaf_align(omap, bvh8, leaf_prim_host=None) -> jnp.ndarray:
    """Reindex (N, S, S) per-primitive maps into the (L, 4, S, S) layout the
    BVH8 leaf loop consumes; padding lanes (prim -1) become opaque=False
    (they never hit anyway).

    leaf_prim_host: optional numpy copy (api.BVH._bvh8_host['leaf_prim'])
    — without it the reindex reads leaf_prim back from device, which is
    slow through tunneled backends."""
    lp = (np.asarray(leaf_prim_host) if leaf_prim_host is not None
          else np.asarray(bvh8.leaf_prim))
    om = np.asarray(omap)
    out = np.zeros((lp.shape[0], 4) + om.shape[1:], bool)
    valid = lp >= 0
    out[valid] = om[lp[valid]]
    return jnp.asarray(out)
