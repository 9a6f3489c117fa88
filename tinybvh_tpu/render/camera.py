"""Pinhole camera → primary ray generation (batched, jit-friendly)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tinybvh_tpu.core.rays import Rays, make_rays
from tinybvh_tpu.core.vecmath import normalize


def look_at(eye, target, up=(0.0, 1.0, 0.0)):
    eye = np.asarray(eye, np.float32)
    fwd = np.asarray(target, np.float32) - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float32))
    right = right / np.linalg.norm(right)
    upv = np.cross(right, fwd)
    return eye, fwd, right, upv


def primary_rays(eye, fwd, right, up, width, height, fov_scale=0.9,
                 jitter=None) -> Rays:
    """Generate width×height primary rays (row-major). jitter: optional
    (H, W, 2) subpixel offsets in [0,1) for antialiasing/path tracing."""
    xs = (np.arange(width) + 0.5) / width - 0.5
    ys = (np.arange(height) + 0.5) / height - 0.5
    gx, gy = np.meshgrid(xs, ys)
    gx = jnp.asarray(gx)
    gy = jnp.asarray(gy)
    if jitter is not None:
        gx = gx + (jitter[..., 0] - 0.5) / width
        gy = gy + (jitter[..., 1] - 0.5) / height
    d = (
        jnp.asarray(fwd)[None, None]
        + fov_scale * gx[..., None] * jnp.asarray(right)[None, None]
        + fov_scale * gy[..., None] * jnp.asarray(up)[None, None]
    ).reshape(-1, 3)
    d = normalize(d)
    o = jnp.broadcast_to(jnp.asarray(eye, jnp.float32), d.shape)
    return make_rays(o, d)


def auto_camera(scene_min, scene_max, offset=(0.6, 0.35, 1.1), dist=1.2):
    """Frame a scene AABB the way the reference demos do."""
    lo = np.asarray(scene_min, np.float32)
    hi = np.asarray(scene_max, np.float32)
    center = (lo + hi) * 0.5
    ext = float(np.max(hi - lo))
    eye = center + np.asarray(offset, np.float32) * ext * dist
    return look_at(eye, center)
