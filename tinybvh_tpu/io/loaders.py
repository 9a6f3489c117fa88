"""Geometry loaders and procedural test scenes.

load_bin reads the reference's raw triangle-soup format (int32 tri count +
3·count float4 vertices — the format consumed at e.g.
tiny_bvh_anim.cpp:70-82). Procedural generators give deterministic scenes
for tests and benchmarks without large data files.
"""

from __future__ import annotations

import struct

import numpy as np


def load_bin(path: str) -> np.ndarray:
    """Read a .bin triangle soup → (N, 3, 3) float32."""
    with open(path, "rb") as f:
        (n,) = struct.unpack("<i", f.read(4))
        data = np.frombuffer(f.read(n * 3 * 16), dtype=np.float32)
    return data.reshape(n, 3, 4)[:, :, :3].copy()


def random_tris(n: int, seed: int = 0, extent: float = 10.0,
                size: float = 0.3) -> np.ndarray:
    """N random small triangles in a cube — the reference's minimal-demo
    scene recipe (tiny_bvh_minimal.cpp:24-35)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, extent, (n, 1, 3)).astype(np.float32)
    offs = rng.uniform(-size, size, (n, 3, 3)).astype(np.float32)
    return base + offs


def sphere_tris(n_lat: int = 16, n_lon: int = 32, radius: float = 1.0,
                center=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Triangulated UV sphere — watertight-ish closed surface for occlusion
    tests."""
    c = np.asarray(center, np.float32)
    lats = np.linspace(0, np.pi, n_lat + 1)
    lons = np.linspace(0, 2 * np.pi, n_lon + 1)
    grid = np.zeros((n_lat + 1, n_lon + 1, 3), np.float32)
    grid[..., 0] = radius * np.sin(lats)[:, None] * np.cos(lons)[None, :]
    grid[..., 1] = radius * np.cos(lats)[:, None]
    grid[..., 2] = radius * np.sin(lats)[:, None] * np.sin(lons)[None, :]
    grid += c
    tris = []
    for i in range(n_lat):
        for j in range(n_lon):
            a, b = grid[i, j], grid[i, j + 1]
            d, e = grid[i + 1, j], grid[i + 1, j + 1]
            if i > 0:
                tris.append([a, b, d])
            if i < n_lat - 1:
                tris.append([b, e, d])
    return np.asarray(tris, np.float32)


def load_blue_noise(path: str = None) -> np.ndarray:
    """Load the 128x128x8 blue-noise tile set the reference's GPU path
    tracers sample (blue_noise_128x128x8_2d.raw, uploaded as uint32s at
    tiny_bvh_gpu.cpp:63). Returns (8, 128, 128) float32 in [0, 1) from the
    packed byte channels."""
    path = path or "/root/reference/testdata/blue_noise_128x128x8_2d.raw"
    raw = np.fromfile(path, dtype=np.uint32).reshape(8, 128, 128)
    # packed channels; take the low informative byte
    return (((raw >> 8) & 0xFF).astype(np.float32) + 0.5) / 256.0


def blue_noise_jitter(bn: np.ndarray, width: int, height: int,
                      sample: int) -> np.ndarray:
    """(H, W, 2) subpixel jitter from tiled blue noise (layer pairs rotate
    with the sample index) — drop-in for the `jitter` arg of
    render.camera.primary_rays."""
    l0 = bn[(2 * sample) % bn.shape[0]]
    l1 = bn[(2 * sample + 1) % bn.shape[0]]
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    return np.stack([l0[ys % 128, xs % 128], l1[ys % 128, xs % 128]],
                    axis=-1).astype(np.float32)
