"""Repro 2 (r1): Mosaic layout CHECK on sublane-indivisible rank-3 Pallas
kernel outputs.

A rank-3 Pallas TPU kernel whose OUTPUT block's trailing (lane) dimension
is 1 — e.g. emitting just the solution column `(T, D, 1)` of a batched
Gauss-Jordan — CHECK-crashes Mosaic's layout assignment instead of being
rejected with a Python error.  Hit in r1 by the one-program batched LM
solver when it tried to write only the solution column.

Recorded signature (jaxlib of this image, TPU backend):

    F0000 ... check failed during mosaic lowering/layout assignment of the
    rank-3 output (vector layout for memref<...x1xf32>)
    *** Check failure stack trace: ***
      (process aborts during Pallas/Mosaic compilation)

Workaround (production: ops/solve_pallas.py `batched_spd_solve`): make the
full `(T, D, D+1)` augmented block the kernel output and slice the solution
column out in XLA — the slice fuses into the consumer for free.

Default mode runs the WORKAROUND (safe anywhere, interpret-mode off-TPU);
`--run` executes the failing pattern (expect an abort on TPU).
"""
import argparse
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, D = 8, 68


def _gj(aug, d):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, aug.shape, 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, aug.shape, 2)

    def step(k, aug):
        is_row_k = row_ids == k
        is_col_k = col_ids == k
        pivot_row = jnp.sum(jnp.where(is_row_k, aug, 0.0), axis=1, keepdims=True)
        piv_val = jnp.sum(jnp.where(is_col_k, pivot_row, 0.0), axis=2, keepdims=True)
        pivot_row = pivot_row / piv_val
        col_k = jnp.sum(jnp.where(is_col_k, aug, 0.0), axis=2, keepdims=True)
        return jnp.where(is_row_k, pivot_row, aug - col_k * pivot_row)

    return jax.lax.fori_loop(0, d, step, aug)


def _kernel_column_out(aug_ref, x_ref, *, d):   # crashing: (T, D, 1) output
    aug = _gj(aug_ref[:], d)
    x_ref[:] = aug[:, :, d:d + 1]


def _kernel_block_out(aug_ref, x_ref, *, d):    # workaround: full block out
    x_ref[:] = _gj(aug_ref[:], d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (this image's axon "
                         "sitecustomize ignores JAX_PLATFORMS=cpu)")
    ap.add_argument("--run", action="store_true",
                    help="execute the failing pattern (TPU; may abort)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.run:
        print(__doc__)
    interpret = jax.default_backend() != "tpu"
    key = jax.random.PRNGKey(0)
    M = jax.random.normal(key, (T, D, D))
    A = jnp.einsum("tij,tkj->tik", M, M) + 10.0 * jnp.eye(D)
    g = jax.random.normal(jax.random.PRNGKey(1), (T, D))
    aug = jnp.concatenate([A, g[:, :, None]], axis=2)

    if args.run:
        out = pl.pallas_call(
            functools.partial(_kernel_column_out, d=D),
            out_shape=jax.ShapeDtypeStruct((T, D, 1), A.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(aug)
        x = out[:, :, 0]
    else:
        out = pl.pallas_call(
            functools.partial(_kernel_block_out, d=D),
            out_shape=jax.ShapeDtypeStruct((T, D, D + 1), A.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(aug)
        x = out[:, :, D]
    err = float(jnp.max(jnp.abs(jnp.einsum("tij,tj->ti", A, x) - g)))
    print(f"{'failing' if args.run else 'workaround'} pattern ran: "
          f"max |Ax-g| = {err:.2e} backend={jax.default_backend()}")
    if args.run and not interpret:
        print("no crash — the compiler bug may be fixed in this jaxlib",
              file=sys.stderr)


if __name__ == "__main__":
    main()
