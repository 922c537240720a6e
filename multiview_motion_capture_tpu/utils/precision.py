"""Matmul-precision control.

On TPU, f32 matmuls/einsums default to bf16 MXU passes; pixel-scale geometry
(coords ~1e3) then loses ~1px and chained FK composes drift by millimeters.
All small geometry/solver kernels in this framework are latency-bound, not
FLOP-bound, so they run at HIGHEST precision; only the keypoint CNN keeps the
default bf16 MXU path where the FLOPs actually live.
"""
from __future__ import annotations

import functools

import jax


def high_precision(fn):
    """Trace the wrapped function under full-f32 matmul precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
