"""Display transforms: Reinhard tone map + gamma, and radiosity-view gamma.

Matches the reference render kernels' output stages exactly:
  * path tracing: c/(1+c), gamma 1/2.2, u8 = 255.99*min(c,1)
    (integrator.h:396-407);
  * radiosity view: sqrt(min(c,1)), u8 (integrator.h:491-501).
"""

from __future__ import annotations

import jax.numpy as jnp


def tonemap_pt(linear):
    """(..., 3) linear radiance -> (..., 3) uint8."""
    c = linear / (linear + 1.0)
    c = jnp.power(jnp.maximum(c, 0.0), 1.0 / 2.2)
    return (255.99 * jnp.minimum(c, 1.0)).astype(jnp.uint8)


def tonemap_radiosity(linear):
    """(..., 3) radiosity -> (..., 3) uint8 via sqrt gamma."""
    c = jnp.sqrt(jnp.minimum(jnp.maximum(linear, 0.0), 1.0))
    return (255.99 * c).astype(jnp.uint8)


def tonemap_radiosity_legacy(linear):
    """(..., 3) radiosity -> (..., 3) uint8 via Reinhard + gamma 1/2.2.

    The display the reference's PUBLISHED sweep PNGs actually use
    (outputs/cbox_sub*_step*.png): forensically identified in round 3 —
    every sweep light pixel is u8=251 = Reinhard+gamma of c=25, and the
    emission-only sub4 step0 frame matches this transform EXACTLY while
    the current code's sqrt display (tonemap_radiosity) saturates at
    255. Unlike tonemap_radiosity the input here is B alone (emission
    already included by the solver), not Le + B."""
    return tonemap_pt(linear)
