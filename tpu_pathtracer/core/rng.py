"""Counter-based RNG key plumbing.

The reference carries a mutable curandState per pixel (seed 2023+pixel,
integrator.h:274-280) and per form-factor pair (seed 12345+idx,
form_factors.h:84-88). On TPU we use JAX's counter-based threefry instead:
keys are *derived*, never stored, by folding structured coordinates
(pixel, sample, bounce, purpose) into a base key. This is bitwise
reproducible, stateless, and shards trivially across chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stream identifiers so distinct consumers of randomness never collide.
STREAM_CAMERA = 0      # pixel-jitter for primary rays
STREAM_PATH = 1        # per-bounce sampling decisions in the integrator
STREAM_FORMFACTOR = 2  # MC form-factor surface samples
STREAM_MISC = 3


def base_key(seed: int = 2023) -> jax.Array:
    """Root key for a render; default seed mirrors the reference's 2023."""
    return jax.random.key(seed)


def stream_key(key: jax.Array, stream: int) -> jax.Array:
    return jax.random.fold_in(key, stream)


def pixel_key(key: jax.Array, pixel_index, sample_index) -> jax.Array:
    """Key for one (pixel, spp-sample) pair. Works under vmap: the
    pixel/sample indices may be traced arrays."""
    k = jax.random.fold_in(key, pixel_index)
    return jax.random.fold_in(k, sample_index)


def bounce_key(key: jax.Array, depth) -> jax.Array:
    """Key for one path vertex; depth may be traced (scan carry)."""
    return jax.random.fold_in(key, depth)


def uniforms(key: jax.Array, n: int, shape=()) -> jnp.ndarray:
    """n independent uniforms in [0, 1) with the given batch shape."""
    return jax.random.uniform(key, shape + (n,))
