"""Frozen runtime configuration (≙ the reference's three-tier flag system,
tiny_bvh.h:56-177 compile-time defines + BVHBase runtime members
c_trav/c_int/hqbvhbins + the scene policy enums).

Compile-time #defines become fields on one frozen dataclass consumed at
trace time; `use_config` scopes an override (jit caches key on the static
values that reach it, so switching configs recompiles exactly like the
reference's recompile-on-#define)."""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, replace


@dataclass(frozen=True)
class Config:
    # builders (≙ BVHBINS / HQBVHBINS, C_TRAV / C_INT, tiny_bvh.h:105-140)
    bins: int = 8
    hq_bins: int = 8
    c_trav: float = 1.0
    c_int: float = 1.0
    max_leaf: int = 4
    # pack subtrees of <= this many prims into one wide-layout leaf during
    # the native collapse (≙ CombineLeafs(4) before BVH8_CPU conversion,
    # tiny_bvh.h:5463-5465); 0 = keep the raw SAH leaves (~2 tris/leaf)
    leaf_combine: int = 4
    sbvh_slack: float = 0.5        # spatial-split fragment pool headroom
    # traversal
    # leaf triangle test for the lockstep/wavefront engines: "mt",
    # "watertight" (Woop — shared edges never leak) or "baldwin"
    # (Baldwin–Weber precomputed rows). ≙ WATERTIGHT_TRITEST
    # (tiny_bvh.h:131, 8486-8507). packet2 keeps its MXU triple-product
    # MT formulation regardless (the dense-matmul design is the engine).
    tri_test: str = "mt"
    stack_depth: int = 128         # ≥ the builders' max depth
    wavefront_cap: int = 3         # frontier = cap * R pairs
    packet_k: int = 256            # packet leaf-list capacity
    # debug (≙ VALIDATE_RAY / PARANOID, tiny_bvh.h:100-101, 1663-1665)
    validate_rays: bool = False
    # jax-level NaN tripwire (the sanitizer analog — the reference has no
    # TSAN; races vanish in the pure-functional design, NaNs don't)
    debug_nans: bool = False


DEFAULT = Config()
_current = DEFAULT


def get_config() -> Config:
    return _current


def set_config(cfg: Config) -> None:
    global _current
    if cfg.debug_nans != _current.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", cfg.debug_nans)
    _current = cfg


@contextlib.contextmanager
def use_config(**overrides):
    """Scoped override: `with use_config(validate_rays=True): ...`."""
    prev = _current
    set_config(replace(prev, **overrides))
    try:
        yield _current
    finally:
        set_config(prev)
