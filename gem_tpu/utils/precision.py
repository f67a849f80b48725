"""Exact-f32 matmul helpers.

The TPU MXU rounds f32 matmul inputs to bf16 by default — up to ~0.4 %
relative error, which on world coordinates means centimeters at window scale
and meters at global-map scale, dwarfing the sensor noise model
(min_radius = 1.8 cm).  Every coordinate- or covariance-bearing contraction
in the framework must therefore request Precision.HIGHEST (the 3-pass bf16
expansion, f32-exact); elementwise VPU math is unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def matmul(a, b):
    return jnp.matmul(a, b, precision=HIGHEST)


def einsum(subscripts, *operands):
    return jnp.einsum(subscripts, *operands, precision=HIGHEST)
