"""Per-TPU-generation kernel tuning tables.

TPU-native counterpart of the reference's vendor-specific kernel
specialization (#define ISNVIDIA/ISAMD/ISINTEL propagated into kernel
source, tiny_ocl.h:366-369, consumed by e.g. SIMD_AABBTEST in
traverse.cl:26-38): one place that maps the detected device generation to
the packet-pipeline parameters that are hardware-dependent — leaf-budget
capacity, cull worklist depth, and the MT precision mode.

The v5e row is MEASURED (round-3 probes on the bench machine); the other
rows are projections from published per-chip VMEM/HBM ratios and are
expected to be re-measured when hardware is available — they differ only
where a resource actually differs (v5p/v6e carry 2x the HBM bandwidth
and >=1.3x clock of v5e, so deeper worklists amortize; the 16 MB scoped
VMEM ceiling that bounds the K1b compaction scratch is the same, which
pins max_blocks at 512).

Callers that pass explicit values win; `None` parameters in the
convenience layer (api.BVH.intersect) resolve through get_tuning().
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass


@dataclass(frozen=True)
class Tuning:
    """Packet-pipeline parameters for one device generation."""

    max_leaves: int      # K: per-tile leaf-key budget (k_cap)
    max_blocks: int      # cull worklist depth per tile group
    mt_precision: str    # "highest" (MXU 6-pass f32) | "vpu" (exact f32)
    wf_cap_factor: int   # wavefront frontier cap multiplier
    measured: bool = True   # False = projected row, never validated on HW


_TABLES = {
    # measured: bunny/grid4/grid16 probes, 2026-08 (this machine)
    "v5e": Tuning(max_leaves=512, max_blocks=256,
                  mt_precision="highest", wf_cap_factor=8),
    # PROJECTED (measured=False): same scoped-VMEM ceiling, more HBM
    # bandwidth -> deeper worklists pay off; MXU f32 throughput scales
    # the same way as v5e. get_tuning warns once when resolving these.
    "v5p": Tuning(max_leaves=512, max_blocks=512,
                  mt_precision="highest", wf_cap_factor=8, measured=False),
    "v6e": Tuning(max_leaves=512, max_blocks=512,
                  mt_precision="highest", wf_cap_factor=8, measured=False),
    # CPU/interpret: small budgets keep test wall time down
    "cpu": Tuning(max_leaves=256, max_blocks=128,
                  mt_precision="highest", wf_cap_factor=8),
}

_warned: set[str] = set()


def detect_generation() -> str:
    """Map jax's device_kind to a table key ('cpu' fallback)."""
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover - no backend at all
        return "cpu"
    for key in ("v6e", "v6", "v5p", "v5e", "v5 lite", "v5lite"):
        if key in kind:
            return {"v6": "v6e", "v5 lite": "v5e", "v5lite": "v5e"}.get(
                key, key)
    if "tpu" in kind or "v5" in kind:
        return "v5e"
    return "cpu"


def get_tuning(generation: str | None = None) -> Tuning:
    gen = generation or detect_generation()
    tun = _TABLES[gen]
    if not tun.measured and gen not in _warned:
        _warned.add(gen)
        warnings.warn(
            f"tuning row for {gen!r} is a projection (never measured on "
            "hardware); pass explicit kernel parameters to override",
            stacklevel=2)
    return tun
