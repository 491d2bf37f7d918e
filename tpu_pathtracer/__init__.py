"""tpu_pathtracer — a TPU-native global-illumination renderer.

Rebuild of the capabilities of the reference CUDA path tracer
(USharma002/CUDA-PathTracer, see SURVEY.md) as a JAX/XLA/Pallas wavefront
renderer: Monte-Carlo path tracing, a radiosity solver with MC form factors,
radiosity-guided path sampling (per-primitive directional CDFs + one-sample
MIS), grid filtering, OBJ/PBRT scene IO, and shard_map multi-chip tiling.
"""

import os

import jax

__version__ = "0.1.0"

# Persistent compilation cache: first XLA compile through the TPU tunnel is
# slow (minutes); cache compiled executables across processes.
_cache_dir = os.environ.get(
    "TPT_COMPILE_CACHE", os.path.expanduser("~/.cache/tpu_pathtracer/xla")
)
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

# Partitionable threefry: identical random streams regardless of sharding.
jax.config.update("jax_threefry_partitionable", True)
