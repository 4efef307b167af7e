"""Flat-field correction: divide out the median-along-Z illumination pattern.

Matches the reference kernel (reference: biahub/flat_field.py:37-54): the
static pattern is the per-(y, x) median over Z, and the output is rescaled so
the pattern's mean is preserved.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["flat_field_zyx"]


@partial(jax.jit, static_argnames=("axis",))
def flat_field_zyx(zyx_data: jax.Array, axis: int = 0) -> jax.Array:
    zyx_data = zyx_data.astype(jnp.float32)
    static_pattern = jnp.median(zyx_data, axis=axis)
    return zyx_data / static_pattern * jnp.mean(static_pattern)
