"""MIP chain / sRGB / bump→normal texture pipeline tests
(≙ tiny_scene.h:2688-2911)."""

import numpy as np
import jax.numpy as jnp

from tinybvh_tpu.render.textures import (
    build_atlas_mipped, build_mip_chain, bump_to_normal, sample_atlas_mip,
    srgb_to_linear,
)


def test_srgb_roundtrip_anchors():
    assert np.isclose(srgb_to_linear(0.0), 0.0)
    assert np.isclose(srgb_to_linear(1.0), 1.0)
    # mid-gray sRGB 0.5 -> ~0.2140 linear
    assert np.isclose(srgb_to_linear(np.float32(0.5)), 0.2140, atol=2e-3)


def test_mip_chain_preserves_mean():
    rng = np.random.default_rng(2)
    img = rng.random((16, 32, 3)).astype(np.float32)
    chain = build_mip_chain(img)
    assert [c.shape[:2] for c in chain] == [
        (16, 32), (8, 16), (4, 8), (2, 4), (1, 2)]
    for c in chain:
        np.testing.assert_allclose(c.mean(), img.mean(), atol=1e-5)


def test_bump_to_normal_flat_and_slope():
    flat = bump_to_normal(np.zeros((8, 8), np.float32))
    np.testing.assert_allclose(flat, np.broadcast_to([0.5, 0.5, 1.0],
                                                     flat.shape), atol=1e-6)
    ramp = bump_to_normal(np.tile(np.arange(8, dtype=np.float32), (8, 1)))
    # interior: dh/dx = 1 -> normal tilts toward -x
    assert (ramp[2:-2, 2:-2, 0] < 0.5).all()


def test_mipped_atlas_levels():
    rng = np.random.default_rng(5)
    imgs = [rng.random((8, 8, 3)).astype(np.float32),
            rng.random((16, 4, 3)).astype(np.float32)]
    tex = build_atlas_mipped(imgs, max_levels=4)
    assert tex["rects"].shape == (2, 4, 4)
    uv = jnp.array([[0.5, 0.5], [0.5, 0.5]], jnp.float32)
    tid = jnp.array([0, 1], jnp.int32)
    # coarsest level ~= image mean
    c = np.asarray(sample_atlas_mip(tex, tid, uv, jnp.array([3, 3])))
    np.testing.assert_allclose(c[0], imgs[0].mean(axis=(0, 1)), atol=0.15)
    # level 0 equals direct bilinear at the same spot (smoke: finite, [0,1])
    c0 = np.asarray(sample_atlas_mip(tex, tid, uv, jnp.array([0, 0])))
    assert np.isfinite(c0).all() and (c0 >= 0).all() and (c0 <= 1).all()
    # negative tex id -> white
    w = np.asarray(sample_atlas_mip(tex, jnp.array([-1, -1]), uv,
                                    jnp.array([0, 0])))
    np.testing.assert_allclose(w, 1.0)
