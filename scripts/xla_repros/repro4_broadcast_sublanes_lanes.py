"""Repro 4 (r3): Mosaic `NotImplemented` on rank-3 broadcasts spanning both
sublanes and lanes inside a Pallas TPU kernel.

Broadcasting a `(C, 1, 1)` per-cluster scalar block against a `(C, P, P)`
state block inside a kernel fails to lower: Mosaic raises
"Broadcast in both sublanes and lanes" (a NotImplementedError surfaced as a
lowering failure) instead of emitting the obvious splat.  Hit in r3 by the
batched multi-cluster ALS kernel (per-cluster `mu` applied to the dual
update).

Recorded signature (jaxlib of this image, TPU backend):

    jax._src.pallas.mosaic.lowering ... NotImplementedError:
      Broadcast in both sublanes and lanes
      (raised while lowering vector.broadcast / shape_cast of
       vector<Cx1x1xf32> to vector<CxPxPxf32>)

Workaround (production: ops/als_pallas.py `_als_kernel_batched`): unroll
over the small static cluster count and apply each cluster's value as a
TRUE SCALAR against its 2D slice — scalar-times-2D lowers to a plain
splat-multiply.

Default mode runs the WORKAROUND (safe anywhere, interpret-mode off-TPU);
`--run` executes the failing pattern (on TPU expect the NotImplementedError;
unlike repros 1-3 this one usually surfaces as a Python exception, not an
abort).
"""
import argparse
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, P = 4, 128


def _kernel_broadcast(w_ref, mu_ref, out_ref):   # crashing pattern
    mu = mu_ref[:]                    # (C, 1, 1)
    out_ref[:] = w_ref[:] / mu        # (C,1,1) -> (C,P,P) broadcast


def _kernel_scalars(w_ref, mu_ref, out_ref):     # workaround pattern
    acc = w_ref[:]
    outs = []
    for c in range(C):
        outs.append((acc[c] / mu_ref[c, 0])[None])
    out_ref[:] = jnp.concatenate(outs, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (this image's axon "
                         "sitecustomize ignores JAX_PLATFORMS=cpu)")
    ap.add_argument("--run", action="store_true",
                    help="execute the failing pattern (TPU; expect an error)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.run:
        print(__doc__)
    interpret = jax.default_backend() != "tpu"
    W = jax.random.normal(jax.random.PRNGKey(0), (C, P, P))
    mu_vals = jnp.arange(1.0, C + 1.0)
    if args.run:
        out = pl.pallas_call(
            _kernel_broadcast,
            out_shape=jax.ShapeDtypeStruct((C, P, P), W.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(W, mu_vals[:, None, None])
    else:
        out = pl.pallas_call(
            _kernel_scalars,
            out_shape=jax.ShapeDtypeStruct((C, P, P), W.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(W, mu_vals[:, None])
    expect = W / mu_vals[:, None, None]
    err = float(jnp.max(jnp.abs(out - expect)))
    print(f"{'failing' if args.run else 'workaround'} pattern ran: "
          f"max err = {err:.2e} backend={jax.default_backend()}")
    if args.run and not interpret:
        print("no error — the lowering gap may be fixed in this jaxlib",
              file=sys.stderr)


if __name__ == "__main__":
    main()
