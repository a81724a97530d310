"""nns_tpu — a TPU-native exact nearest-neighbor-search engine.

Built from scratch in JAX/XLA/Pallas with the same capabilities as the CUDA
reference ladder sty-hhh/NNS-CUDA (see /root/reference and SURVEY.md):

- a uniform query API (``nns``) with a 15-version registry (v0..v13 mirroring
  the reference's optimization ladder + the v14 supercell flagship; reference:
  core.cu namespaces v0..v13, dispatch table main.cu:89-135),
- a brute-force family where the m x n distance computation is a fused Pallas
  kernel (distances live only in VMEM; reference analog: the fused
  shared-memory kernel of core.cu:216),
- a multi-chip family sharding the reference set over a `jax.sharding.Mesh`
  with an on-device (dist, idx) argmin merge (reference analog: the 4-GPU
  OpenMP data parallelism of core.cu:761-852),
- a spatial-tree family (KD-tree, octree) with flat device-resident tree
  arrays and stackless batched traversal (reference analog: core.cu v10-v13),
- a benchmark harness reproducing the reference's seeded (k, m, n) config
  grid and build/query timing split (reference: main.cu:38-51, 62-80).

Exactness contract: recall@1 = 1.0 — every version returns a true nearest
neighbor of the float32 inputs (verified against a float64 oracle).
"""

__version__ = "0.3.0"

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (opt out: NNS_TPU_NO_COMPILE_CACHE=1).

    Kernel compiles through remote-compile TPU runtimes can take minutes;
    the cache makes every process after the first start in seconds — the
    durable form of the reference's warm-up trick (core.cu:1900-1933)."""
    if _os.environ.get("NNS_TPU_NO_COMPILE_CACHE") == "1":
        return
    import jax

    try:
        if jax.config.jax_compilation_cache_dir is None:
            path = _os.path.expanduser("~/.cache/nns_tpu_jax")
            _os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never block import


_enable_compile_cache()

from nns_tpu.api import nns, get_version, list_versions, NNEngine  # noqa: F401
from nns_tpu.config import BenchConfig, REFERENCE_GRID, DEFAULT_SEED  # noqa: F401
from nns_tpu.kernels.topk import nns_topk  # noqa: F401
