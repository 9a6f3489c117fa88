"""Path tracer tests: energy sanity on a Cornell-style box."""

import jax
import jax.numpy as jnp
import numpy as np

from tinybvh_tpu.builders.binned import build_binned
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.layouts.mbvh import collapse_bvh2
from tinybvh_tpu.render.pathtracer import make_scene_arrays, trace_paths


def _quad(a, b, c, d):
    a, b, c, d = (np.asarray(x, np.float32) for x in (a, b, c, d))
    return np.stack([[a, b, c], [a, c, d]])


def cornell():
    """A 2-unit box with a ceiling light patch."""
    tris = []
    # floor y=0, ceiling y=2, back z=2, left x=0 (red), right x=2 (green)
    tris.append(_quad([0, 0, 0], [2, 0, 0], [2, 0, 2], [0, 0, 2]))  # floor
    tris.append(_quad([0, 2, 2], [2, 2, 2], [2, 2, 0], [0, 2, 0]))  # ceiling
    tris.append(_quad([0, 0, 2], [2, 0, 2], [2, 2, 2], [0, 2, 2]))  # back
    tris.append(_quad([0, 0, 0], [0, 0, 2], [0, 2, 2], [0, 2, 0]))  # left
    tris.append(_quad([2, 0, 2], [2, 0, 0], [2, 2, 0], [2, 2, 2]))  # right
    # light: small patch just below ceiling
    tris.append(_quad([0.7, 1.98, 1.3], [1.3, 1.98, 1.3],
                      [1.3, 1.98, 0.7], [0.7, 1.98, 0.7]))
    tris = np.concatenate(tris)
    n = tris.shape[0]
    albedo = np.full((n, 3), 0.7, np.float32)
    albedo[6:8] = [0.8, 0.2, 0.2]   # left wall red
    albedo[8:10] = [0.2, 0.8, 0.2]  # right wall green
    emissive = np.zeros((n, 3), np.float32)
    emissive[10:12] = 8.0
    albedo[10:12] = 0.0
    return tris, albedo, emissive


def _setup():
    tris, albedo, emissive = cornell()
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    scene = make_scene_arrays(tris, albedo, emissive)
    return bvh8, scene


def test_direct_light_visible():
    bvh8, scene = _setup()
    # ray straight up at the light → sees emission directly
    r = make_rays([[1.0, 1.0, 1.0]], [[0.0, 1.0, 0.0]])
    rad, _ = trace_paths(bvh8, scene, r, jax.random.PRNGKey(0), bounces=1)
    assert float(rad[0].sum()) >= 8.0 * 3 - 1e-3


def test_indirect_illumination_positive_and_finite():
    bvh8, scene = _setup()
    rng = np.random.default_rng(3)
    n = 256
    o = np.tile(np.array([[1.0, 1.0, 0.2]], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2])  # into the box
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    rad = np.zeros((n, 3), np.float32)
    key = jax.random.PRNGKey(1)
    for s in range(8):
        key, k = jax.random.split(key)
        rad += np.asarray(trace_paths(bvh8, scene, rays, k, bounces=3)[0])
    rad /= 8
    assert np.isfinite(rad).all()
    assert rad.mean() > 0.01  # the box is lit
    assert rad.mean() < 8.0  # and not exploding


def test_color_bleeding():
    """Rays toward the red wall should come back redder than green."""
    bvh8, scene = _setup()
    n = 128
    o = np.tile(np.array([[1.0, 1.0, 1.0]], np.float32), (n, 1))
    d = np.tile(np.array([[-1.0, 0.0, 0.0]], np.float32), (n, 1))
    rays = make_rays(o, d)
    acc = np.zeros((n, 3), np.float32)
    key = jax.random.PRNGKey(2)
    for s in range(16):
        key, k = jax.random.split(key)
        acc += np.asarray(trace_paths(bvh8, scene, rays, k, bounces=2)[0])
    mean = acc.mean(axis=0) / 16
    assert mean[0] > mean[1] * 1.5  # red wall dominates


def test_occlusion_darkens():
    """A point under the light vs a point in the corner shadowed by
    geometry distance: direct NEE should differ."""
    bvh8, scene = _setup()
    r_mid = make_rays([[1.0, 1.9, 1.0]], [[0.0, -1.0, 0.0]])
    r_corner = make_rays([[0.05, 0.05, 0.05]], [[0.0, -1.0, 0.0]])
    acc_m = acc_c = 0.0
    key = jax.random.PRNGKey(5)
    for s in range(32):
        key, k1, k2 = jax.random.split(key, 3)
        acc_m += float(np.asarray(
            trace_paths(bvh8, scene, r_mid, k1, bounces=1)[0]).sum())
        acc_c += float(np.asarray(
            trace_paths(bvh8, scene, r_corner, k2, bounces=1)[0]).sum())
    assert acc_m > acc_c  # floor under the light is brighter


def test_smooth_vertex_normals_change_shading():
    """NEE shading must use the interpolated vertex normal: tilting the
    floor's vertex normals changes the cosine term deterministically
    (same RNG key), while flat geometric shading is unaffected."""
    import jax

    import tinybvh_tpu as tb
    from tinybvh_tpu.render.pathtracer import (
        add_vertex_normals, make_scene_arrays, trace_paths,
    )

    # floor + small emissive quad high above (NEE light)
    floor = np.array([
        [[-2, 0, -2], [2, 0, -2], [2, 0, 2]],
        [[-2, 0, -2], [2, 0, 2], [-2, 0, 2]],
    ], np.float32)
    light = (floor[:, ::-1] * np.array([0.1, 1, 0.1], np.float32)
             + np.array([0, 4, 0], np.float32))
    tris = np.concatenate([floor, light])
    emis = np.zeros((4, 3), np.float32)
    emis[2:] = 10.0
    bvh = tb.BVH(tris, layout="bvh8")
    base = make_scene_arrays(tris, albedo=np.ones((4, 3), np.float32),
                             emissive=emis)
    tilt = np.tile(np.array([0, 1, 1], np.float32) / np.sqrt(2), (4, 3, 1))
    smooth = add_vertex_normals(
        make_scene_arrays(tris, albedo=np.ones((4, 3), np.float32),
                          emissive=emis), tilt)

    R = 64
    o = np.stack([np.linspace(-1.5, 1.5, R), np.full(R, 2.0),
                  np.zeros(R)], -1).astype(np.float32)
    rays = tb.make_rays(o, np.tile([[0, -1, 0]], (R, 1)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    r_flat = np.asarray(trace_paths(bvh.bvh8, base, rays, key, bounces=1)[0])
    r_smooth = np.asarray(trace_paths(bvh.bvh8, smooth, rays, key,
                                      bounces=1)[0])
    assert np.isfinite(r_flat).all() and np.isfinite(r_smooth).all()
    lit = r_flat.sum(axis=1) > 1e-4
    assert lit.any()
    # same key -> same light sample; only the cosine term changed
    assert np.abs(r_flat[lit] - r_smooth[lit]).max() > 1e-4


def test_mis_matches_brute_force_on_area_light():
    """MIS-weighted NEE and the plain path integral are two estimators of
    the same integral: their means must agree on a scene with a LARGE
    nearby light (where naive NEE-only or emission-only estimators
    diverge most). Pins the 1/(lightPDF+brdfPDF)-style weights
    (≙ wavefront.cl:166-240)."""
    bvh8, scene = _setup()
    n = 512
    rng = np.random.default_rng(11)
    o = np.tile(np.array([[1.0, 0.5, 1.0]], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    acc_mis = np.zeros(3, np.float64)
    acc_bf = np.zeros(3, np.float64)
    key = jax.random.PRNGKey(7)
    spp = 48
    for _ in range(spp):
        key, k1, k2 = jax.random.split(key, 3)
        # NEE extends each path by one connection segment, so MIS with B
        # bounces covers paths of length B+1 — match the brute-force
        # estimator's horizon with B+1 bounces
        acc_mis += np.asarray(
            trace_paths(bvh8, scene, rays, k1, bounces=2)[0]).mean(0)
        acc_bf += np.asarray(
            trace_paths(bvh8, scene, rays, k2, bounces=3,
                        brute_force=True)[0]).mean(0)
    mis = acc_mis / spp
    bf = acc_bf / spp
    assert mis.sum() > 0.01
    # brute force is noisy: generous but real tolerance
    np.testing.assert_allclose(mis.sum(), bf.sum(), rtol=0.15)


def test_specular_mirror_reflects_light_deterministically():
    """A mirror floor under a ceiling light: camera ray reflects off the
    mirror straight into the light; radiance = mirror_albedo * emission
    with NO noise (delta path, emission weight 1 on specular vertices)."""
    floor = np.array([
        [[-2, 0, -2], [2, 0, -2], [2, 0, 2]],
        [[-2, 0, -2], [2, 0, 2], [-2, 0, 2]],
    ], np.float32)
    light = (floor[:, ::-1] + np.array([0, 4, 0], np.float32))
    tris = np.concatenate([floor, light])
    albedo = np.array([[0.9, 0.8, 0.7]] * 2 + [[0, 0, 0]] * 2, np.float32)
    emissive = np.zeros((4, 3), np.float32)
    emissive[2:] = 5.0
    specular = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
    from tinybvh_tpu.builders.binned import build_binned
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2

    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    scene = make_scene_arrays(tris, albedo, emissive, specular=specular)
    # straight down at the mirror from just below the light plane
    r = make_rays([[0.3, 2.0, 0.3]], [[0.0, -1.0, 0.0]])
    rad1, _ = trace_paths(bvh8, scene, r, jax.random.PRNGKey(0), bounces=2)
    rad2, _ = trace_paths(bvh8, scene, r, jax.random.PRNGKey(9), bounces=2)
    want = albedo[0] * 5.0
    np.testing.assert_allclose(np.asarray(rad1)[0], want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rad2)[0], want, rtol=1e-5)


def test_analytic_lights_closed_form():
    """Point/spot/directional delta lights (≙ tiny_scene.h:701-766,
    sampled like the reference renderers' light loop): single bounce on a
    white floor has radiance albedo/pi * I * cos/d^2 — check against the
    closed form, plus spot cutoff and a shadowing blocker."""
    import jax

    from tinybvh_tpu.builders.binned import build_binned
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2
    from tinybvh_tpu.render.pathtracer import (
        make_scene_arrays, pack_analytic_lights, trace_paths,
    )
    from tinybvh_tpu.scene.graph import Light

    floor = np.array([
        [[-10, 0, -10], [10, 0, -10], [-10, 0, 10]],
        [[10, 0, 10], [-10, 0, 10], [10, 0, -10]],
    ], np.float32)
    bvh8 = collapse_bvh2(build_binned(floor, max_leaf=4), floor)
    scene = make_scene_arrays(floor, albedo=np.ones((2, 3), np.float32))

    # camera ray straight down onto the origin
    rays = make_rays([[0, 3.0, 0]], [[0, -1.0, 0]])
    key = jax.random.PRNGKey(0)

    # point light at height h, directly above: L = albedo/pi * I / h^2
    h = 2.0
    lights = pack_analytic_lights(
        [Light(kind="point", position=np.array([0, h, 0], np.float32),
               intensity=4.0)])
    rad, _ = trace_paths(bvh8, scene, rays, key, bounces=1,
                         analytic=lights)
    expect = 1.0 / np.pi * 4.0 / h**2
    np.testing.assert_allclose(np.asarray(rad)[0], expect, rtol=1e-4)

    # directional light straight down: L = albedo/pi * I
    lights = pack_analytic_lights(
        [Light(kind="directional",
               direction=np.array([0, -1.0, 0], np.float32),
               intensity=2.0)])
    rad, _ = trace_paths(bvh8, scene, rays, key, bounces=1,
                         analytic=lights)
    np.testing.assert_allclose(np.asarray(rad)[0], 2.0 / np.pi, rtol=1e-4)

    # spot aimed away: inside-cone point lit, outside-cone point dark
    lights = pack_analytic_lights(
        [Light(kind="spot", position=np.array([0, h, 0], np.float32),
               direction=np.array([0, -1.0, 0], np.float32),
               intensity=4.0, cos_inner=0.95, cos_outer=0.9)])
    r_in = make_rays([[0, 3.0, 0]], [[0, -1.0, 0]])
    rad_in, _ = trace_paths(bvh8, scene, r_in, key, bounces=1,
                            analytic=lights)
    # point far out to the side: angle way outside the cone
    r_out = make_rays([[8.0, 3.0, 0]], [[0, -1.0, 0]])
    rad_out, _ = trace_paths(bvh8, scene, r_out, key, bounces=1,
                             analytic=lights)
    assert float(np.asarray(rad_in)[0, 0]) > 0.1
    np.testing.assert_allclose(np.asarray(rad_out)[0], 0.0, atol=1e-6)

    # small blocker between the point light and the floor -> shadow
    # (camera comes in at an angle so it sees the floor, not the blocker)
    b = 0.3
    blocker = np.array([
        [[-b, 1.0, -b], [b, 1.0, -b], [-b, 1.0, b]],
        [[b, 1.0, b], [-b, 1.0, b], [b, 1.0, -b]],
    ], np.float32)
    world = np.concatenate([floor, blocker])
    bvh8b = collapse_bvh2(build_binned(world, max_leaf=4), world)
    sceneb = make_scene_arrays(world, albedo=np.ones((4, 3), np.float32))
    lights = pack_analytic_lights(
        [Light(kind="point", position=np.array([0, h, 0], np.float32),
               intensity=4.0)])
    do = np.array([[0, 0, 0]], np.float32) - np.array([[2, 3, 0]], np.float32)
    do = do / np.linalg.norm(do)
    rays_side = make_rays([[2.0, 3.0, 0.0]], do)
    radb, _ = trace_paths(bvh8b, sceneb, rays_side, key, bounces=1,
                          analytic=lights)
    np.testing.assert_allclose(np.asarray(radb)[0], 0.0, atol=1e-6)


def test_trace_paths_packet_engine_matches_wavefront():
    """aux= routes every PT traversal through the packet engines; both
    engines are exact, the RNG stream is identical, so radiance must agree
    to float tolerance."""
    import jax

    from tinybvh_tpu.builders.binned import build_binned
    from tinybvh_tpu.layouts.mbvh import collapse_bvh2
    from tinybvh_tpu.render.camera import look_at, primary_rays
    from tinybvh_tpu.render.pathtracer import make_scene_arrays, trace_paths
    from tinybvh_tpu.traverse.packet2 import build_packet_aux

    from tinybvh_tpu.io.loaders import random_tris

    tris = np.concatenate([
        random_tris(120, seed=11),              # cluster in [0,10]^3
        # emissive ceiling quad above the cluster
        np.array([[[0, 14, 0], [10, 14, 0], [0, 14, 10]],
                  [[10, 14, 10], [0, 14, 10], [10, 14, 0]]], np.float32),
        # floor below it
        np.array([[[-5, -2, -5], [15, -2, -5], [-5, -2, 15]],
                  [[15, -2, 15], [-5, -2, 15], [15, -2, -5]]], np.float32),
    ])
    emissive = np.zeros((124, 3), np.float32)
    emissive[120:122] = 6.0
    bvh8 = collapse_bvh2(build_binned(tris, max_leaf=4), tris)
    scene = make_scene_arrays(tris, emissive=emissive)
    aux = build_packet_aux(bvh8)

    eye, fwd, right, up = look_at(np.array([5.0, 6.0, 22.0]),
                                  np.array([5.0, 4.0, 5.0]))
    rays = primary_rays(eye, fwd, right, up, 32, 16)  # 512 rays (2 tiles)
    key = jax.random.PRNGKey(3)
    r_wf, _ = trace_paths(bvh8, scene, rays, key, bounces=2)
    r_pk, _ = trace_paths(bvh8, scene, rays, key, bounces=2, aux=aux)
    np.testing.assert_allclose(np.asarray(r_pk), np.asarray(r_wf),
                               rtol=1e-3, atol=1e-4)
    assert float(np.asarray(r_wf).max()) > 0  # scene actually lit
