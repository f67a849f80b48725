"""Transcendentals missing from the Mosaic (Pallas TPU) lowering.

Mosaic implements exp/log/sqrt/sin/cos but not acos/asin/atan (verified on
this image's toolchain).  `acos` here is the Cephes asinf-style two-piece
polynomial — |error| < ~2e-7 over [-1, 1] in float32, i.e. ulp-level for the
slope/traversability math that consumes it.  Usable both inside Pallas
kernels and in plain XLA (where it simply matches jnp.arccos to f32
precision).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_PIO2 = math.pi / 2.0
_PI = math.pi


def _asin_core(x):
    """Cephes asinf polynomial for x in [0, 0.5]."""
    z = x * x
    p = ((((4.2163199048e-2 * z + 2.4181311049e-2) * z + 4.5470025998e-2)
          * z + 7.4953002686e-2) * z + 1.6666752422e-1)
    return x + x * z * p


def acos(x):
    """float32 arccos on [-1, 1] (clamped), Pallas-TPU lowerable."""
    x = jnp.clip(x, -1.0, 1.0)
    a = jnp.abs(x)
    # |x| > 0.5: acos(|x|) = 2*asin(sqrt((1-|x|)/2))
    big = 2.0 * _asin_core(jnp.sqrt(jnp.maximum((1.0 - a) * 0.5, 0.0)))
    # |x| <= 0.5: acos(x) = pi/2 - asin(x)
    small = _PIO2 - _asin_core(x)
    pos = jnp.where(a > 0.5, big, small)
    neg = jnp.where(a > 0.5, _PI - big, small)
    return jnp.where(x >= 0.0, pos, neg)
