"""Repro 1 (r1): XLA TPU algebraic-simplifier CHECK-fail on vmapped
small-matrix dots.

Chained batched 3x3 matmuls expressed as dot_general (jnp.matmul / einsum)
crash the TPU compiler once vmap stacks enough batch dimensions on them
(rank-5 operands, f32[B, L, 3, 3]): the algebraic simplifier rewrites the
transpose-of-dot into a dot with swapped operands and CHECK-fails on the
layout mismatch.  Hit in r1 by the FK chain (per-joint rotation products
under vmap over tracklets).

Recorded signature (jaxlib of this image, TPU backend, non-deterministic in
which fusion triggers it):

    F0000 ... algebraic_simplifier.cc:* Check failed: ...
      dot dimension numbers ... transpose ... f32[16,18,3,3]{...}
    *** Check failure stack trace: ***
      (process aborts during XLA compilation)

Workaround (production: ops/fk.py `mm3`/`mv3`): express tiny matmuls as
VPU multiply-sums — `jnp.sum(a[..., :, :, None] * b[..., None, :, :], -2)`
— which also avoids wasting MXU tiles on 3x3 operands.

Default mode runs the WORKAROUND (safe anywhere); `--run` executes the
failing pattern (expect an abort on TPU; see README hazard note).
"""
import argparse
import sys

import jax
import jax.numpy as jnp

B, L = 16, 18


def chain_dot(R):           # the crashing pattern
    # cumulative rotation chain as explicit matmuls (rank-4 per call,
    # rank-5 dot_general after the outer vmap)
    out = R
    for _ in range(4):
        out = jnp.matmul(jnp.swapaxes(out, -1, -2), R)
    return out


def chain_mulsum(R):        # the workaround (ops/fk.py mm3)
    def mm3(a, b):
        return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)

    out = R
    for _ in range(4):
        out = mm3(jnp.swapaxes(out, -1, -2), R)
    return out


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
    key = jax.random.PRNGKey(0)
    R = jax.random.normal(key, (B, L, 3, 3), dtype=jnp.float32)
    fn = chain_dot if args.run else chain_mulsum
    out = jax.jit(jax.vmap(fn))(R)  # vmap adds the extra batch rank
    out.block_until_ready()
    print(f"{'failing' if args.run else 'workaround'} pattern compiled and "
          f"ran: out.shape={out.shape} backend={jax.default_backend()}")
    if args.run:
        print("no crash — the compiler bug may be fixed in this jaxlib",
              file=sys.stderr)


if __name__ == "__main__":
    main()
