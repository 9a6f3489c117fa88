"""On-device texture atlas + bilinear sampling for the path tracer.

Counterpart of the reference's texture pipeline: tiny_scene.h's Texture
objects (tiny_scene.h:660-695, 2688-2911) are uploaded and sampled in the
GPU renderer (raytracer.cl's material shading). On TPU, per-texture
variable shapes would force one XLA program per texture, so all textures
are packed into ONE (H, W, 3) atlas array resident in HBM; a (T, 4) rect
table maps texture id -> pixel region. Sampling is wrap-addressed bilinear
via four row gathers — all jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def build_atlas(images):
    """Pack a list of (H, W, 3) float32 images into one atlas.

    Returns dict(atlas=(AH, AW, 3) jnp.float32,
                 rects=(T, 4) jnp.float32 rows of [x0, y0, w, h] in pixels).
    Packing is a simple vertical shelf (textures are few and pre-mipped in
    the reference too, tiny_scene.h:2726-2753); atlas width = max width.
    """
    if not images:
        atlas = np.ones((1, 1, 3), np.float32)
        rects = np.zeros((1, 4), np.float32)
        rects[0] = [0, 0, 1, 1]
        return dict(atlas=jnp.asarray(atlas), rects=jnp.asarray(rects))
    imgs = []
    for im in images:
        a = np.asarray(im, np.float32)
        if a.ndim == 2:
            a = a[..., None].repeat(3, axis=-1)
        if a.shape[-1] == 4:
            a = a[..., :3]
        imgs.append(a)
    aw = max(i.shape[1] for i in imgs)
    ah = sum(i.shape[0] for i in imgs)
    atlas = np.zeros((ah, aw, 3), np.float32)
    rects = np.zeros((len(imgs), 4), np.float32)
    y = 0
    for t, im in enumerate(imgs):
        h, w = im.shape[:2]
        atlas[y:y + h, :w] = im
        rects[t] = [0, y, w, h]
        y += h
    return dict(atlas=jnp.asarray(atlas), rects=jnp.asarray(rects))


def sample_atlas(tex, tex_id, uv):
    """Bilinear-sample the atlas. tex_id (R,) int32 (<0 -> white),
    uv (R, 2) float32 wrap-addressed. Returns (R, 3) float32."""
    atlas, rects = tex["atlas"], tex["rects"]
    tid = jnp.maximum(tex_id, 0)
    r = rects[tid]  # (R, 4)
    x0, y0, w, h = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    u = jnp.mod(uv[:, 0], 1.0)
    v = jnp.mod(uv[:, 1], 1.0)
    # texel-center addressing within the rect
    fx = u * w - 0.5
    fy = v * h - 0.5
    ix = jnp.floor(fx)
    iy = jnp.floor(fy)
    ax = (fx - ix)[:, None]
    ay = (fy - iy)[:, None]

    def fetch(px, py):
        # wrap within this texture's rect, then offset into the atlas
        qx = (x0 + jnp.mod(px, w)).astype(jnp.int32)
        qy = (y0 + jnp.mod(py, h)).astype(jnp.int32)
        return atlas[qy, qx]

    c00 = fetch(ix, iy)
    c10 = fetch(ix + 1, iy)
    c01 = fetch(ix, iy + 1)
    c11 = fetch(ix + 1, iy + 1)
    col = ((1 - ax) * (1 - ay) * c00 + ax * (1 - ay) * c10
           + (1 - ax) * ay * c01 + ax * ay * c11)
    return jnp.where((tex_id >= 0)[:, None], col, 1.0)


def sample_sky(sky, d):
    """Equirectangular sky lookup, jitted (≙ SkyDome sampling,
    tiny_scene.h:1024-1079). sky (H, W, 3); d (R, 3) unit directions."""
    h, w = sky.shape[:2]
    u = jnp.mod(jnp.arctan2(d[:, 2], d[:, 0]) / (2 * jnp.pi), 1.0)
    v = jnp.arccos(jnp.clip(d[:, 1], -1, 1)) / jnp.pi
    x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    return sky[y, x]
