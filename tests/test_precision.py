"""Pin the r5 precision regression class: no dot_general on ray paths.

TPU f32 `dot_general` (einsum / @ / jnp.dot without an explicit
precision) multiplies in bf16 by default — measured 0.125 absolute
error at 40-unit coordinates, which displaced instanced-frame ray
origins ~0.5 units and failed the reference-style 1% hit-t checksum
gate at 512-instance scale (BENCH_r04 -> fixed in r5). CPU tests can't
catch the rounding (CPU f32 dots are exact), so these tests assert the
STRUCTURE instead: the ray-precision transforms and triangle tests must
not contain a dot_general primitive at all (vecmath.mat3_apply's
explicit multiply-sums lower to mul+reduce, never to the MXU path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinybvh_tpu.core.rays import Rays, make_rays
from tinybvh_tpu.core.vecmath import mat3_apply, safe_rcp


# string scan: jaxpr pretty-printing names every primitive, including
# those inside nested sub-jaxprs (scan/cond/pjit bodies), and is stable
# across jax versions where the jax.core jaxpr classes are not
def _scan_dot(jaxpr) -> bool:
    return "dot_general" in str(jaxpr)


def test_mat3_apply_no_dot_general():
    m = jnp.eye(3)[None]
    v = jnp.ones((4, 3))
    jx = jax.make_jaxpr(mat3_apply)(m, v)
    assert not _scan_dot(jx.jaxpr)


def test_tlas_xform_ray_no_dot_general():
    from tinybvh_tpu.tlas.instance import _xform_ray

    inv = jnp.tile(jnp.eye(4)[None], (5, 1, 1))
    o = jnp.ones((5, 3))
    d = jnp.ones((5, 3))
    jx = jax.make_jaxpr(_xform_ray)(inv, o, d)
    assert not _scan_dot(jx.jaxpr)


def test_tlas_packet_xform_no_dot_general():
    from tinybvh_tpu.tlas.packet import _xform_batch

    inv = jnp.eye(4)
    o = jnp.ones((8, 3))
    d = jnp.ones((8, 3))
    jx = jax.make_jaxpr(_xform_batch)(inv, o, d)
    assert not _scan_dot(jx.jaxpr)


def test_moller_trumbore_no_dot_general():
    from tinybvh_tpu.core.intersect import moller_trumbore

    o = jnp.zeros((4, 3))
    d = jnp.ones((4, 3))
    v0 = jnp.zeros((4, 3))
    e1 = jnp.ones((4, 3))
    e2 = jnp.ones((4, 3))
    t = jnp.full((4,), 1e30)
    jx = jax.make_jaxpr(moller_trumbore)(o, d, v0, e1, e2, t)
    assert not _scan_dot(jx.jaxpr)


def test_tile_frusta_no_dot_general():
    """The cull's plane thresholds feed conservative box tests — bf16
    rounding there can wrongly cull boundary-grazing segments."""
    from tinybvh_tpu.traverse.packet import _tile_planes

    o = jnp.zeros((2, 3))
    d = jnp.ones((2, 256, 3))
    jx = jax.make_jaxpr(_tile_planes)(o, d)
    assert not _scan_dot(jx.jaxpr)


def test_mat3_apply_matches_reference():
    rng = np.random.default_rng(7)
    m = rng.normal(size=(6, 3, 3)).astype(np.float32)
    v = rng.normal(size=(6, 3)).astype(np.float32)
    got = np.asarray(mat3_apply(jnp.asarray(m), jnp.asarray(v)))
    want = np.einsum("bij,bj->bi", m.astype(np.float64),
                     v.astype(np.float64))
    assert np.allclose(got, want, rtol=1e-5, atol=1e-6)
