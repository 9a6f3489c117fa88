"""Config system + ray validation gate (≙ the reference's flag tiers,
tiny_bvh.h:56-177, and VALIDATE_RAY, tiny_bvh.h:1663-1665)."""

import numpy as np
import pytest

from tinybvh_tpu.api import BVH
from tinybvh_tpu.config import Config, get_config, use_config
from tinybvh_tpu.core.rays import make_rays
from tinybvh_tpu.io.loaders import random_tris


def test_config_scoping():
    assert get_config().bins == 8
    with use_config(bins=16, max_leaf=8) as c:
        assert c.bins == 16 and get_config().max_leaf == 8
    assert get_config().bins == 8


def test_config_drives_bvh_defaults():
    # 64 identical triangles: SAH cannot separate them, so leaves are
    # forced-split only down to the configured max_leaf
    tris = np.broadcast_to(random_tris(1, seed=0), (64, 3, 3)).copy()
    with use_config(max_leaf=16):
        b = BVH(tris)
        assert 4 < b.leaf_max <= 16
        assert b.bvh8 is None  # >4-wide leaves: no bvh8 layout
    b4 = BVH(tris)
    assert b4.leaf_max <= 4 and b4.bvh8 is not None


def test_validate_rays_gate():
    o = np.zeros((4, 3), np.float32)
    d = np.tile([[0, 0, 1.0]], (4, 1)).astype(np.float32)
    make_rays(o * np.nan, d)  # default: no validation, silently accepted
    with use_config(validate_rays=True):
        make_rays(o, d)  # fine
        with pytest.raises(ValueError, match="non-finite"):
            make_rays(o * np.nan, d)
        with pytest.raises(ValueError, match="zero-length"):
            make_rays(o, d * 0.0)


def test_debug_nans_gate():
    """config.debug_nans flips jax's NaN tripwire (the sanitizer analog:
    pure-functional code has no races, so NaN detection is the remaining
    runtime-poison check)."""
    import jax
    import jax.numpy as jnp

    with use_config(debug_nans=True):
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.zeros(4) - 1.0).block_until_ready()
    assert not jax.config.jax_debug_nans
    jnp.log(jnp.zeros(4) - 1.0).block_until_ready()  # silent again
