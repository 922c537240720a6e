"""Fused batched linear solver for the LM normal equations.

`jax.lax.linalg.cholesky` + two triangular solves on (T, 68, 68) systems
dominate the IK cost (profiler: ~half the device program before the warm
single-stage change).  This kernel solves all T systems in ONE pallas call
by Gauss-Jordan elimination on the augmented [A | g] block:

- batch T rides the sublane dimension, the 69 augmented columns ride the
  (128-padded) lane dimension, so every elimination step is a full-width
  VPU op,
- the damped LM matrices are SPD with a ridge on the diagonal, so no
  pivoting is required,
- 68 sequential in-kernel steps of ~4 vector ops replace ~200 dispatched XLA
  ops worth of factorization.

Shapes are static: D (param dim) is a Python constant per instantiation.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _gj_kernel(aug_ref, x_ref, *, d: int):
    # one grid program per linear system; everything 2D in-kernel (Mosaic's
    # vector layouts want rank <= 2, and dynamic_slice with a traced index
    # doesn't lower — masked reductions extract the pivot row/column)
    aug = aug_ref[0]  # (D, D+1), lanes padded
    row_ids = jax.lax.broadcasted_iota(jnp.int32, aug.shape, 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, aug.shape, 1)

    def step(k, aug):
        is_row_k = row_ids == k
        is_col_k = col_ids == k
        pivot_row = jnp.sum(jnp.where(is_row_k, aug, 0.0), axis=0,
                            keepdims=True)                     # (1, D+1)
        piv_val = jnp.sum(jnp.where(is_col_k, pivot_row, 0.0), axis=1,
                          keepdims=True)                       # (1, 1)
        pivot_row = pivot_row / piv_val
        col_k = jnp.sum(jnp.where(is_col_k, aug, 0.0), axis=1,
                        keepdims=True)                         # (D, 1)
        elim = aug - col_k * pivot_row  # eliminate column k from every row
        aug = jnp.where(is_row_k, pivot_row, elim)
        return aug

    aug = jax.lax.fori_loop(0, d, step, aug)
    x_ref[0] = aug


def _gj_kernel_3d(aug_ref, x_ref, *, d: int):
    """All T systems in ONE program: the grid version pays its ~70-cycle
    per-step loop overhead T times over (xplane: 66 us per (8, 68) solve,
    ~2.5x the pure vector-op cost); operating on the full (T, D, D+1) block
    amortizes it once.  Same masked-reduction pivoting, one more axis."""
    aug = aug_ref[:]  # (T, D, D+1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, aug.shape, 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, aug.shape, 2)

    def step(k, aug):
        is_row_k = row_ids == k
        is_col_k = col_ids == k
        pivot_row = jnp.sum(jnp.where(is_row_k, aug, 0.0), axis=1,
                            keepdims=True)                     # (T, 1, D+1)
        piv_val = jnp.sum(jnp.where(is_col_k, pivot_row, 0.0), axis=2,
                          keepdims=True)                       # (T, 1, 1)
        pivot_row = pivot_row / piv_val
        col_k = jnp.sum(jnp.where(is_col_k, aug, 0.0), axis=2,
                        keepdims=True)                         # (T, D, 1)
        elim = aug - col_k * pivot_row
        return jnp.where(is_row_k, pivot_row, elim)

    x_ref[:] = jax.lax.fori_loop(0, d, step, aug)


@functools.partial(jax.jit, static_argnames=("interpret", "one_program"))
def batched_spd_solve(A: Array, g: Array, interpret: bool = False,
                      one_program: bool = True) -> Array:
    """Solve A[i] x[i] = g[i] for SPD A: (T, D, D), (T, D) -> (T, D)."""
    T, D = g.shape
    aug = jnp.concatenate([A, g[:, :, None]], axis=2)  # (T, D, D+1)
    # the reduced augmented block is the kernel output (a (1, D) block would
    # violate the TPU sublane-divisibility rule); the solution column is
    # sliced out in XLA
    if one_program:
        out = pl.pallas_call(
            functools.partial(_gj_kernel_3d, d=D),
            out_shape=jax.ShapeDtypeStruct((T, D, D + 1), A.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(aug)
    else:
        out = pl.pallas_call(
            functools.partial(_gj_kernel, d=D),
            grid=(T,),
            out_shape=jax.ShapeDtypeStruct((T, D, D + 1), A.dtype),
            in_specs=[pl.BlockSpec((1, D, D + 1), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, D, D + 1), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(aug)
    return out[:, :, D]
