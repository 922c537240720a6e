"""Repro 3 (r3): Mosaic vector-layout inference CHECK on rank-1 elementwise
ops inside a Pallas TPU kernel.

Carrying per-cluster bookkeeping as a rank-1 `(C,)` vector inside a kernel
and doing ANY elementwise arithmetic on it CHECK-crashes Mosaic's layout
inference instead of raising a Python error.  Hit in r3 by the batched
multi-cluster ALS kernel's first draft (mu / residual / stable-counter
state as `(C,)` vectors).

Recorded signature (jaxlib of this image, TPU backend):

    F0000 ... layout.h:320] Check failed: arr.size() >= layout_rank
    *** Check failure stack trace: ***
      (process aborts during Pallas/Mosaic compilation)

Workaround (production: ops/als_pallas.py `_als_kernel_batched`): keep C
separate TRUE SCALARS (Python-level unrolled over the small static cluster
count) — scalars have no vector layout to infer, and scalar-broadcast 2D
ops lower cleanly.

Default mode runs the WORKAROUND (safe anywhere, interpret-mode off-TPU);
`--run` executes the failing pattern (expect an abort on TPU).
"""
import argparse
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, P = 4, 128


def _kernel_rank1(w_ref, mu_ref, out_ref):      # crashing pattern
    mu = mu_ref[:]               # (C,) rank-1 vector state
    mu = mu * 1.5 + 1.0          # rank-1 elementwise op -> layout.h:320 CHECK
    acc = w_ref[:]
    for c in range(C):
        acc = acc.at[c].set(acc[c] * mu[c])
    out_ref[:] = acc


def _kernel_scalars(w_ref, mu_ref, out_ref):    # workaround pattern
    acc = w_ref[:]
    outs = []
    for c in range(C):
        mu_c = mu_ref[c, 0]      # true scalar per cluster
        mu_c = mu_c * 1.5 + 1.0  # scalar arithmetic: no vector layout
        outs.append((acc[c] * mu_c)[None])
    out_ref[:] = jnp.concatenate(outs, axis=0)


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
    W = jax.random.normal(jax.random.PRNGKey(0), (C, P, P))
    if args.run:
        mu = jnp.arange(1.0, C + 1.0)          # (C,)
        out = pl.pallas_call(
            _kernel_rank1,
            out_shape=jax.ShapeDtypeStruct((C, P, P), W.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(W, mu)
    else:
        mu = jnp.arange(1.0, C + 1.0)[:, None]  # (C, 1): scalar-indexable
        out = pl.pallas_call(
            _kernel_scalars,
            out_shape=jax.ShapeDtypeStruct((C, P, P), W.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(W, mu)
    expect = W * (jnp.arange(1.0, C + 1.0) * 1.5 + 1.0)[:, None, None]
    err = float(jnp.max(jnp.abs(out - expect)))
    print(f"{'failing' if args.run else 'workaround'} pattern ran: "
          f"max err = {err:.2e} backend={jax.default_backend()}")
    if args.run and not interpret:
        print("no crash — the compiler bug may be fixed in this jaxlib",
              file=sys.stderr)


if __name__ == "__main__":
    main()
