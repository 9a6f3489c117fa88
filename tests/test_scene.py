"""Scene layer tests: OBJ/glTF loading, node graph, animation, per-frame
BVH update, end-to-end tracing through Scene."""

import os

import numpy as np
import pytest

from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.scene.graph import Animation, Node, Scene
from tinybvh_tpu.scene.mesh import Mesh, load_gltf, load_obj

OBJ = "/root/reference/testdata/legocar.obj"
GLTF = "/root/reference/testdata/balloon/scene.gltf"
DRONE = "/root/reference/testdata/drone/scene.gltf"


@pytest.mark.skipif(not os.path.exists(OBJ), reason="no testdata")
def test_load_obj_legocar():
    mesh = load_obj(OBJ)
    assert mesh.tris.shape[0] > 1000
    assert mesh.tris.shape[1:] == (3, 3)
    assert np.isfinite(mesh.tris).all()
    assert mesh.normals.shape == mesh.tris.shape


@pytest.mark.skipif(not os.path.exists(GLTF), reason="no testdata")
def test_load_gltf_balloon():
    data = load_gltf(GLTF)
    assert len(data["meshes"]) == 37
    n = sum(m.tris.shape[0] for m in data["meshes"])
    assert n > 1000
    assert len(data["materials"]) == 37


@pytest.mark.skipif(not os.path.exists(GLTF), reason="no testdata")
def test_scene_from_gltf_traces():
    s = Scene.from_gltf(GLTF)
    s.update(0.0)
    # aim at the scene's TLAS bounds
    b = s.tlas.bounds[0].reshape(6, 8)
    lo = np.asarray(b[:3]).min(axis=1)
    hi = np.asarray(b[3:]).max(axis=1)
    center = (lo + hi) / 2
    ext = float((hi - lo).max())
    eye = center + np.array([0, 0, ext * 2], np.float32)
    n = 64
    rng = np.random.default_rng(0)
    d = center[None] + rng.uniform(-0.3, 0.3, (n, 3)) * ext - eye[None]
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    rays = make_rays(np.tile(eye[None], (n, 1)).astype(np.float32), d)
    hits = s.intersect(rays)
    assert (np.asarray(hits.prim) >= 0).mean() > 0.3  # most rays hit


def test_node_animation_moves_geometry():
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    s = Scene()
    mid = s.add_mesh(Mesh(tris=tri))
    nid = s.add_instance(mid)
    s.nodes[nid].matrix = None
    # animate translation 0 → +10x over 1s
    s.animations.append(Animation([dict(
        node=nid, path="translation",
        times=np.array([0.0, 1.0]),
        values=np.array([[0, 0, 0], [10, 0, 0]], np.float32),
        interp="LINEAR",
    )]))
    ray0 = make_rays([[0.2, 0.2, -5.0]], [[0, 0, 1.0]])
    ray1 = make_rays([[5.2, 0.2, -5.0]], [[0, 0, 1.0]])

    s.update(0.0)
    assert int(s.intersect(ray0).prim[0]) == 0
    assert int(s.intersect(ray1).prim[0]) == -1

    s.update(0.5)  # mesh now at x+5
    assert int(s.intersect(ray0).prim[0]) == -1
    assert int(s.intersect(ray1).prim[0]) == 0


def test_cubic_spline_animation():
    """CUBICSPLINE samplers (≙ tiny_scene.h:2389-2686): Hermite
    interpolation must pass through keyframe values, respect tangents at
    the midpoint, and reduce to LINEAR when tangents are zero... (zero
    tangents give the smoothstep blend, not linear — check midpoint)."""
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    s = Scene()
    mid = s.add_mesh(Mesh(tris=tri))
    nid = s.add_instance(mid)
    s.nodes[nid].matrix = None
    # (K, 3, D): in-tangent, value, out-tangent per key
    vals = np.zeros((2, 3, 3), np.float32)
    vals[0, 1] = [0, 0, 0]
    vals[1, 1] = [10, 0, 0]
    s.animations.append(Animation([dict(
        node=nid, path="translation",
        times=np.array([0.0, 1.0]),
        values=vals, interp="CUBICSPLINE",
    )]))
    s.update(0.0)
    assert np.allclose(s.nodes[nid].translation, [0, 0, 0])
    s.update(1.0 - 1e-6)
    assert np.allclose(s.nodes[nid].translation, [10, 0, 0], atol=1e-3)
    s.update(0.5)  # smoothstep(0.5) = 0.5 with zero tangents
    assert np.allclose(s.nodes[nid].translation, [5, 0, 0], atol=1e-4)
    s.update(0.25)  # smoothstep(0.25) = 0.15625
    assert np.allclose(s.nodes[nid].translation, [1.5625, 0, 0], atol=1e-3)
    # non-zero out-tangent bends the start of the curve upward
    vals2 = vals.copy()
    vals2[0, 2] = [20, 0, 0]
    s.animations[0] = Animation([dict(
        node=nid, path="translation", times=np.array([0.0, 1.0]),
        values=vals2, interp="CUBICSPLINE")])
    s.update(0.25)
    # h3(0.25)·dt·b0 = (s³-2s²+s)·20 = (0.015625-0.125+0.25)·20 = 2.8125
    assert np.allclose(s.nodes[nid].translation,
                       [1.5625 + 2.8125, 0, 0], atol=1e-3)


def test_morph_targets_deform():
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    m = Mesh(tris=tri)
    m.base_tris = tri.copy()
    m.morph_targets = np.array([[[[0, 0, 2], [0, 0, 2], [0, 0, 2]]]],
                               np.float32)  # push +z
    s = Scene()
    mid = s.add_mesh(m, policy="dynamic")
    nid = s.add_instance(mid)
    s.nodes[nid].morph_weights = np.array([0.0], np.float32)
    s.update(0.0)
    r = make_rays([[0.2, 0.2, -5.0]], [[0, 0, 1.0]])
    t0 = float(s.intersect(r).t[0])
    s.nodes[nid].morph_weights = np.array([1.0], np.float32)
    s.update(0.0)
    t1 = float(s.intersect(r).t[0])
    np.testing.assert_allclose(t1 - t0, 2.0, atol=1e-4)


def test_skinning_two_joints():
    """Two-triangle strip skinned to two joints; rotating joint 1 moves
    only the verts weighted to it."""
    tris = np.array([
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
        [[2, 0, 0], [3, 0, 0], [2, 1, 0]],
    ], np.float32)
    m = Mesh(tris=tris)
    m.base_tris = tris.copy()
    m.joints = np.zeros((2, 3, 4), np.int32)
    m.joints[1] = 1  # second triangle bound to joint 1
    m.weights = np.zeros((2, 3, 4), np.float32)
    m.weights[:, :, 0] = 1.0
    s = Scene()
    mid = s.add_mesh(m, policy="dynamic")
    j0 = s.add_node(Node(name="j0"))
    j1 = s.add_node(Node(name="j1"))
    inst = s.add_node(Node(mesh=mid, skin=0))
    from tinybvh_tpu.scene.graph import Skin

    s.skins.append(Skin(joints=[j0, j1],
                        inverse_bind=np.stack([np.eye(4), np.eye(4)]).astype(np.float32)))
    s.update(0.0)
    r0 = make_rays([[0.2, 0.2, -5.0]], [[0, 0, 1.0]])
    r1 = make_rays([[2.2, 0.2, -5.0]], [[0, 0, 1.0]])
    assert int(s.intersect(r0).prim[0]) >= 0
    assert int(s.intersect(r1).prim[0]) >= 0
    # move joint 1 by +5z: triangle 1 shifts, triangle 0 stays
    s.nodes[j1].translation = np.array([0, 0, 5], np.float32)
    s.update(0.0)
    h0 = s.intersect(r0)
    h1 = s.intersect(r1)
    np.testing.assert_allclose(float(h0.t[0]), 5.0, atol=1e-4)
    np.testing.assert_allclose(float(h1.t[0]), 10.0, atol=1e-4)


def test_add_quad_and_skydome():
    from tinybvh_tpu.scene.graph import Scene, SkyDome

    s = Scene()
    mid = s.add_quad([1.0, 0.0, 1.0], 2.0, normal_axis=1)
    s.add_instance(mid)
    s.update(0.0)
    r = make_rays([[1.0, 5.0, 1.0]], [[0.0, -1.0, 0.0]])
    h = s.intersect(r)
    np.testing.assert_allclose(float(h.t[0]), 5.0, rtol=1e-5)

    img = np.zeros((4, 8, 3), np.float32)
    img[0] = [1, 0, 0]   # zenith red
    img[-1] = [0, 0, 1]  # nadir blue
    sky = SkyDome(img)
    up = sky.sample([0.0, 1.0, 0.0])
    dn = sky.sample([0.0, -1.0, 0.0])
    assert up[0] == 1.0 and dn[2] == 1.0


def test_scene_shading_tables_feed_textured_tracer():
    """Scene.shading_tables glues materials/textures/UVs to the textured
    TLAS tracer: a 0.5-grey textured floor exactly halves NEE radiance."""
    import jax
    import jax.numpy as jnp

    from tinybvh_tpu.core.rays import make_rays
    from tinybvh_tpu.render.pathtracer_tlas import trace_paths_tlas
    from tinybvh_tpu.scene.graph import Scene
    from tinybvh_tpu.scene.mesh import Material, Mesh, Texture

    sc = Scene()
    sc.textures.append(Texture(data=np.full((2, 2, 3), 0.5, np.float32)))
    grey_mat = sc.add_material(Material(texture=0))
    floor = np.array([
        [[-2, 0, -2], [2, 0, -2], [2, 0, 2]],
        [[-2, 0, -2], [2, 0, 2], [-2, 0, 2]],
    ], np.float32)
    uvs = np.array([
        [[0, 0], [1, 0], [1, 1]],
        [[0, 0], [1, 1], [0, 1]],
    ], np.float32)
    light = floor[:, ::-1] * np.array([0.25, 1, 0.25], np.float32) \
        + np.array([0, 3, 0], np.float32)
    fid = sc.add_mesh(Mesh(tris=floor, uvs=uvs,
                           mat_id=np.full(2, grey_mat, np.int32)))
    lid = sc.add_mesh(Mesh(tris=light))
    sc.add_instance(fid)
    sc.add_instance(lid)
    sc.update(0.0)
    leaf_uvs, leaf_tex, atlas = sc.shading_tables()

    inst_albedo = np.array([[1, 1, 1], [0, 0, 0]], np.float32)
    inst_emissive = np.array([[0, 0, 0], [5, 5, 5]], np.float32)
    R = 32
    o = np.stack([np.linspace(-1.5, 1.5, R), np.full(R, 2.0),
                  np.zeros(R)], -1).astype(np.float32)
    rays = make_rays(o, np.tile([[0, -1, 0]], (R, 1)).astype(np.float32))
    key = jax.random.PRNGKey(5)
    args = (sc.tlas, inst_albedo, inst_emissive, jnp.asarray(light),
            jnp.asarray(inst_emissive[1])[None].repeat(2, 0), rays, key)
    rad_white = np.asarray(trace_paths_tlas(*args, bounces=1)[0])
    rad_grey = np.asarray(trace_paths_tlas(
        *args, bounces=1, leaf_uvs=leaf_uvs, leaf_tex=leaf_tex,
        tex=atlas)[0])
    lit = rad_white.sum(axis=1) > 1e-4
    assert lit.any()
    np.testing.assert_allclose(rad_grey[lit], 0.5 * rad_white[lit],
                               rtol=1e-5, atol=1e-6)


def test_multi_file_composition_and_collapse():
    """≙ Scene::AddScene multi-file composition with base offsets +
    an extra root transform node (tiny_scene.h:3016-3166) and
    CollapseMeshes (tiny_scene.h:3456-3524)."""
    s = Scene()
    r1 = s.add_gltf(GLTF)
    n_nodes1 = len(s.nodes)
    n_meshes1 = len(s.meshes)
    shift = np.eye(4, dtype=np.float32)
    shift[0, 3] = 100.0
    r2 = s.add_gltf(GLTF, transform=shift)
    assert len(s.meshes) == 2 * n_meshes1
    assert r2 > r1 and len(s.roots) == 2
    # second copy's nodes reference second copy's meshes
    second_meshes = {s.nodes[i].mesh for i in range(n_nodes1, len(s.nodes))
                     if s.nodes[i].mesh >= 0}
    assert all(m >= n_meshes1 for m in second_meshes)
    s.update(0.0)
    # world center of copy 1 from a single-file reference scene
    s1 = Scene.from_gltf(GLTF)
    s1.update(0.0)
    b = s1.tlas.bounds[0].reshape(6, 8)
    lo = np.asarray(b[:3]).min(axis=1)
    hi = np.asarray(b[3:]).max(axis=1)
    center = ((lo + hi) / 2).astype(np.float32)
    ext = float((hi - lo).max())

    rng = np.random.default_rng(0)
    from tinybvh_tpu.core.rays import make_rays

    def hit_fraction(target):
        eye = target + np.array([0, 0, 2 * ext], np.float32)
        d = (target[None] + rng.uniform(-0.2, 0.2, (64, 3)) * ext
             - eye[None])
        d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
        h = s.intersect(make_rays(
            np.tile(eye[None], (64, 1)).astype(np.float32), d))
        return (np.asarray(h.prim) >= 0).mean()

    # both copies must be hittable, the second shifted by +100x
    assert hit_fraction(center) > 0.3
    shifted = center + np.array([100, 0, 0], np.float32)
    assert hit_fraction(shifted) > 0.3

    # collapse the shifted copy into one static mesh — still hittable
    mid = s.collapse_meshes(r2)
    assert s.meshes[mid].tris.shape[0] > 0
    s.update(0.0)
    assert hit_fraction(shifted) > 0.3


def test_texture_dedup_by_origin():
    s = Scene()
    img = np.random.default_rng(0).random((4, 4, 3)).astype(np.float32)
    t1 = s.add_texture(img, origin="foo.png")
    t2 = s.add_texture(img * 0.5, origin="foo.png")  # same origin: dedup
    t3 = s.add_texture(img, origin="bar.png")
    assert t1 == t2 and t3 != t1 and len(s.textures) == 2
