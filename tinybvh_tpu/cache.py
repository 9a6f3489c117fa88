"""Persistent XLA compilation cache setup.

Through this environment's device tunnel every jit compile is a REMOTE
compile: round-3's bench measured 577 s of wall just warming the bunny
primary phase, and ~10 min extra for the wavefront-retrace branch. The
persistent compilation cache (serialized executables keyed on HLO +
compile options) makes every repeat compile a ~0.3 s disk read, so
rehearsal runs amortize the cost for the real benchmark run and the
retrace branch becomes affordable to keep enabled.

Counterpart of the reference's binary-cache discipline (tiny_ocl.h
caches compiled OpenCL binaries keyed on source hash + device name);
ours is the JAX-native mechanism.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `path`.

    Default: `<repo>/.jax_cache`, overridable via TINYBVH_CACHE_DIR;
    set TINYBVH_CACHE=0 to disable. Safe to call multiple times and
    before or after backend init (must precede the first compile to
    have any effect on it). Returns the cache dir, or None if disabled.
    """
    if os.environ.get("TINYBVH_CACHE", "1") == "0":
        return None
    if path is None:
        path = os.environ.get(
            "TINYBVH_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: through the tunnel even "fast" compiles cost
        # seconds, and entry sizes are trivial next to the compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - old jax without the flags
        return None
    return path
