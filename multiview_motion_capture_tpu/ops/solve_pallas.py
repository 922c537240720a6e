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


def _fused_normal_gj_kernel(jaug_ref, lam_ref, eyep_ref, fdp_ref, out_ref,
                            *, d: int, t_count: int):
    """Normal-equation ASSEMBLY + solve in one program (r4, the per-
    iteration LM fusion VERDICT r3 next #1c scoped):

      G_t   = Jaug_t^T Jaug_t          (one MXU dot per slot; Jaug = [J|r],
                                        so G's first d rows are [JtJ | Jt r])
      aug_t = G_t[:d] + (lam_t + ridge_t) * eye_pad + frozen_pad
      solve by the same masked-reduction Gauss-Jordan as `_gj_kernel_3d`.

    Slots unroll statically (small T); per-slot lam rides SMEM as true
    scalars (rank-1 vectors CHECK-crash Mosaic layout inference — see
    scripts/xla_repros/repro3).  The augmented-input trick keeps every
    in-kernel tensor rank-2 with a wide lane dim: no (D,1) column vectors
    anywhere (lane-1 layouts are the repro2 hazard class).
    """
    eye_pad = eyep_ref[:]     # (d, d+1): 1.0 on the JtJ diagonal, else 0
    fd_pad = fdp_ref[:]       # (d, d+1): frozen-param unit diagonal
    augs = []
    for t in range(t_count):
        Jt = jaug_ref[t]      # (R, d+1)
        G = jnp.dot(Jt.T, Jt, preferred_element_type=jnp.float32)
        A_blk = G[:d, :]      # (d, d+1) sublane slice (zero offset)
        tr = jnp.sum(A_blk * eye_pad)
        ridge = 1e-6 * (tr / d) + 1e-6
        lam_t = lam_ref[t, 0]
        augs.append((A_blk + (lam_t + ridge) * eye_pad + fd_pad)[None])
    aug = jnp.concatenate(augs, axis=0)  # (T, d, d+1)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, aug.shape, 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, aug.shape, 2)

    def step(k, aug):
        is_row_k = row_ids == k
        is_col_k = col_ids == k
        pivot_row = jnp.sum(jnp.where(is_row_k, aug, 0.0), axis=1,
                            keepdims=True)
        piv_val = jnp.sum(jnp.where(is_col_k, pivot_row, 0.0), axis=2,
                          keepdims=True)
        pivot_row = pivot_row / piv_val
        col_k = jnp.sum(jnp.where(is_col_k, aug, 0.0), axis=2,
                        keepdims=True)
        elim = aug - col_k * pivot_row
        return jnp.where(is_row_k, pivot_row, elim)

    out_ref[:] = jax.lax.fori_loop(0, d, step, aug)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_normal_solve(Jaug: Array, lam: Array, frozen_diag: Array,
                       interpret: bool = False) -> Array:
    """Solve (J^T J + (lam + ridge) I + frozen_diag) x = J^T r for every
    slot, reading J only once.

    Jaug: (T, R, D+1) = [J | r] per slot (J pre-masked by the stage's
    free_mask in XLA — it fuses into the jacobian computation); lam: (T,);
    frozen_diag: (D,) 1.0 on frozen params.  Returns x (T, D) — the caller
    applies `dx = -x * free_mask`.

    vs the unfused path (two XLA einsums for JtJ/g + `batched_spd_solve`):
    the (T, D, D) normal matrices and gradients never round-trip HBM, and
    two dispatches disappear; J's read is mandatory either way.
    """
    T, R, D1 = Jaug.shape
    d = D1 - 1
    eye_pad = jnp.concatenate(
        [jnp.eye(d, dtype=Jaug.dtype), jnp.zeros((d, 1), Jaug.dtype)], axis=1)
    fd_pad = jnp.concatenate(
        [jnp.diag(frozen_diag.astype(Jaug.dtype)),
         jnp.zeros((d, 1), Jaug.dtype)], axis=1)
    out = pl.pallas_call(
        functools.partial(_fused_normal_gj_kernel, d=d, t_count=T),
        out_shape=jax.ShapeDtypeStruct((T, d, d + 1), Jaug.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Jaug, lam[:, None], eye_pad, fd_pad)
    return out[:, :, d]
