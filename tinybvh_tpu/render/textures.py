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


def srgb_to_linear(img):
    """sRGB → linear transfer (≙ the reference's sRGB conversion on texture
    load, tiny_scene.h Texture flags/2688-2760). Accepts any (..., C)
    float array in [0, 1]."""
    img = np.asarray(img, np.float32)
    lo = img / 12.92
    hi = ((img + 0.055) / 1.055) ** 2.4
    return np.where(img <= 0.04045, lo, hi).astype(np.float32)


def build_mip_chain(img, max_levels: int = 16):
    """Box-filtered MIP chain (≙ Texture::ConstructMIPmaps,
    tiny_scene.h:2726-2753). Returns [level0, level1, ...] down to 1x1;
    odd dimensions are truncated like the reference's >>1."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    chain = [img]
    while len(chain) < max_levels and min(img.shape[0], img.shape[1]) > 1:
        h2, w2 = max(img.shape[0] // 2, 1), max(img.shape[1] // 2, 1)
        img = img[: h2 * 2, : w2 * 2]
        img = img.reshape(h2, 2, w2, 2, img.shape[-1]).mean(axis=(1, 3))
        chain.append(img.astype(np.float32))
    return chain


def bump_to_normal(height, strength: float = 1.0):
    """Height/bump map → tangent-space normal map (≙ the reference's
    bump-to-normal conversion, tiny_scene.h:2862-2911): central differences
    with wrap addressing, normals encoded in [0, 1]."""
    h = np.asarray(height, np.float32)
    if h.ndim == 3:
        h = h.mean(axis=-1)
    dx = (np.roll(h, -1, axis=1) - np.roll(h, 1, axis=1)) * 0.5 * strength
    dy = (np.roll(h, -1, axis=0) - np.roll(h, 1, axis=0)) * 0.5 * strength
    n = np.stack([-dx, -dy, np.ones_like(h)], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return (n * 0.5 + 0.5).astype(np.float32)


def build_atlas_mipped(images, max_levels: int = 8):
    """Atlas whose rect table carries a full MIP pyramid per texture:
    rects is (T, L, 4) and `sample_atlas_mip` selects the level per ray.
    Missing levels repeat the last (1x1-ish) one so the table is dense."""
    if not images:
        base = build_atlas(images)
        return dict(atlas=base["atlas"],
                    rects=base["rects"][:, None, :].repeat(max_levels, 1))
    chains = [build_mip_chain(im, max_levels) for im in images]
    flat = []
    index = []
    for ch in chains:
        index.append((len(flat), len(ch)))
        flat.extend(ch)
    packed = build_atlas(flat)
    T = len(images)
    rects = np.zeros((T, max_levels, 4), np.float32)
    pr = np.asarray(packed["rects"])
    for t, (off, n) in enumerate(index):
        for l in range(max_levels):
            rects[t, l] = pr[off + min(l, n - 1)]
    return dict(atlas=packed["atlas"], rects=jnp.asarray(rects))


def sample_atlas_mip(tex, tex_id, uv, level):
    """Bilinear sample at an integer MIP level per ray. tex from
    build_atlas_mipped; level (R,) int32 clamped to the table."""
    rects = tex["rects"]                      # (T, L, 4)
    L = rects.shape[1]
    lvl = jnp.clip(level, 0, L - 1)
    tid = jnp.maximum(tex_id, 0)
    flat = dict(atlas=tex["atlas"],
                rects=rects.reshape(-1, 4))
    return sample_atlas(flat, jnp.where(tex_id >= 0, tid * L + lvl, -1), uv)


def sample_sky(sky, d):
    """Equirectangular sky lookup, jitted (≙ SkyDome sampling,
    tiny_scene.h:1024-1079). sky (H, W, 3); d (R, 3) unit directions."""
    h, w = sky.shape[:2]
    u = jnp.mod(jnp.arctan2(d[:, 2], d[:, 0]) / (2 * jnp.pi), 1.0)
    v = jnp.arccos(jnp.clip(d[:, 1], -1, 1)) / jnp.pi
    x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    return sky[y, x]
