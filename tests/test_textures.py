"""Texture atlas + sky sampling, and the textured path-tracer pipeline
(parity target: raytracer.cl's textured material shading and the SkyDome
lookup of tiny_scene.h:1024-1079)."""

import jax.numpy as jnp
import numpy as np

from tinybvh_tpu.render.textures import build_atlas, sample_atlas, sample_sky


def test_atlas_pack_roundtrip():
    t0 = np.zeros((4, 8, 3), np.float32)
    t0[..., 0] = 1.0  # red
    t1 = np.zeros((2, 2, 3), np.float32)
    t1[..., 1] = 1.0  # green
    tex = build_atlas([t0, t1])
    assert tex["atlas"].shape == (6, 8, 3)
    # sample each texture's center
    uv = jnp.array([[0.5, 0.5], [0.5, 0.5]], jnp.float32)
    tid = jnp.array([0, 1], jnp.int32)
    c = np.asarray(sample_atlas(tex, tid, uv))
    np.testing.assert_allclose(c[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(c[1], [0, 1, 0], atol=1e-6)


def test_atlas_bilinear_and_untextured():
    # 1x2 texture: black | white -> u=0.5 lands exactly between texel
    # centers -> 0.5 grey
    t = np.zeros((1, 2, 3), np.float32)
    t[0, 1] = 1.0
    tex = build_atlas([t])
    uv = jnp.array([[0.5, 0.5], [0.25, 0.5], [0.2, 0.9]], jnp.float32)
    tid = jnp.array([0, 0, -1], jnp.int32)
    c = np.asarray(sample_atlas(tex, tid, uv))
    np.testing.assert_allclose(c[0], [0.5] * 3, atol=1e-6)
    np.testing.assert_allclose(c[1], [0.0] * 3, atol=1e-6)  # texel 0 center
    np.testing.assert_allclose(c[2], [1.0] * 3, atol=1e-6)  # tid -1 = white


def test_sky_equirect_directions():
    sky = np.zeros((4, 8, 3), np.float32)
    sky[0] = [1, 0, 0]   # zenith row
    sky[-1] = [0, 0, 1]  # nadir row
    d = jnp.array([[0, 1, 0], [0, -1, 0]], jnp.float32)
    c = np.asarray(sample_sky(jnp.asarray(sky), d))
    np.testing.assert_allclose(c[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(c[1], [0, 0, 1], atol=1e-6)


def test_pathtracer_textured_sky():
    """Lambertian floor with a 0.5-grey texture under a uniform unit sky:
    cosine-sampled single bounce integrates exactly to albedo*texture."""
    import jax

    import tinybvh_tpu as tb
    from tinybvh_tpu.render.pathtracer import make_scene_arrays, trace_paths

    quad = np.array([
        [[-1, 0, -1], [1, 0, -1], [1, 0, 1]],
        [[-1, 0, -1], [1, 0, 1], [-1, 0, 1]],
    ], np.float32)
    tex = [np.full((2, 2, 3), 0.5, np.float32)]
    uvs = np.array([
        [[0, 0], [1, 0], [1, 1]],
        [[0, 0], [1, 1], [0, 1]],
    ], np.float32)
    scene = make_scene_arrays(
        quad, albedo=np.ones((2, 3), np.float32),
        uvs=uvs, tex_id=np.array([0, 0], np.int32), textures=tex,
        sky=np.ones((2, 4, 3), np.float32))
    bvh = tb.BVH(quad, layout="bvh8")

    R = 64
    o = np.stack([np.linspace(-0.8, 0.8, R), np.full(R, 2.0),
                  np.zeros(R)], -1).astype(np.float32)
    d = np.tile([[0, -1, 0]], (R, 1)).astype(np.float32)
    rays = tb.make_rays(o, d)
    rad = np.asarray(trace_paths(bvh.bvh8, scene, rays,
                                 jax.random.PRNGKey(0), bounces=2)[0])
    # every sample: hit floor (throughput 1*0.5), bounce up, sample sky=1
    np.testing.assert_allclose(rad, 0.5, atol=1e-3)

    # rays that miss see the sky directly
    o2 = o + np.array([0, 0, 5], np.float32)
    rays2 = tb.make_rays(o2, d)
    rad2 = np.asarray(trace_paths(bvh.bvh8, scene, rays2,
                                  jax.random.PRNGKey(0), bounces=2)[0])
    np.testing.assert_allclose(rad2, 1.0, atol=1e-3)
