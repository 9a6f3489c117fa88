"""tinybvh_tpu — a TPU-native ray-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jbikker/tinybvh (reference: /root/reference/tiny_bvh.h): BVH construction
(binned SAH, LBVH, SBVH), wide SoA node layouts, batched wavefront traversal,
TLAS/BLAS instancing, refit, a reinsertion optimizer, and an end-to-end
jitted path tracer — designed for the TPU memory/compute model rather than
translated from the reference's pointer-chasing C++.

Conventions:
  * All geometry/ray/hit state is struct-of-arrays JAX pytrees with static
    shapes.
  * The canonical acceleration structure is a 2-wide SoA BVH (`layouts.bvh2`);
    every specialized layout converts from it (mirroring the reference's
    architecture invariant, tiny_bvh.h:857-866).
  * `BVH_FAR = 1e30` is the "miss" distance, as in the reference
    (tiny_bvh.h:653).
"""

from tinybvh_tpu.core.rays import Rays, Hits, make_rays
from tinybvh_tpu.core.vecmath import BVH_FAR
from tinybvh_tpu.api import BVH, TLAS
from tinybvh_tpu.config import Config, get_config, set_config, use_config

__version__ = "0.2.0"

__all__ = ["Rays", "Hits", "make_rays", "BVH", "TLAS", "BVH_FAR",
           "Config", "get_config", "set_config", "use_config",
           "__version__"]
