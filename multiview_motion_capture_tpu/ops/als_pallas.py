"""Fused Pallas TPU kernel for the ALS multi-way matcher.

The XLA version (ops/association.match_als) spends its time in per-iteration
dispatch latency: each of the ~100-1000 ADMM iterations issues ~15 tiny ops
(two small Cholesky solves, matmuls, elementwise projections).  This kernel
runs the *entire* ADMM loop inside one `pallas_call`:

- all state (W, X, Z, Y, A, B) lives in VMEM for the whole solve,
- matrices are zero-padded to the 128-lane MXU tile, which is mathematically
  exact here: padded rows/columns of W and init_A are zero, so every padded
  entry of every iterate stays zero (the ridge term keeps the padded normal
  equations trivially solvable),
- the ridge solves (A^T A + lam I)^-1 RHS become Newton-Schulz iterations —
  pure 128x128 matmuls on the MXU — with the ||M||_1 * ||M||_inf scaled
  initialization that guarantees convergence for SPD M,
- the same reference semantics as match_als: block-diagonal suppression,
  forced diagonal, [0,1] clipping, adaptive mu, residual + stable-binarization
  stopping (ref:src/mv_association.py:222-318).

Masks are precomputed host-side:
  keep  = 1 off the block-diagonal, off the true diagonal, inside the valid
          N x N region (entries that survive the Z projection),
  eye_t = 1 on the valid diagonal (forced to 1 by pSelect=1).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

TILE = 128
N_SCHULZ = 14


def _pad_to(x: np.ndarray, rows: int, cols: int) -> np.ndarray:
    out = np.zeros((rows, cols), dtype=np.float32)
    out[: x.shape[0], : x.shape[1]] = x
    return out


def build_masks(n: int, diag_mask: np.ndarray, pad: int = TILE):
    """(keep, eye_t) f32 mask matrices for the padded kernel."""
    keep = np.zeros((pad, pad), dtype=np.float32)
    keep[:n, :n] = 1.0
    keep[:n, :n] -= diag_mask[:n, :n].astype(np.float32)
    np.fill_diagonal(keep[:n, :n], 0.0)
    keep = np.clip(keep, 0.0, 1.0)
    eye_t = np.zeros((pad, pad), dtype=np.float32)
    eye_t[np.arange(n), np.arange(n)] = 1.0
    return keep, eye_t


def _schulz_inverse(M: Array) -> Array:
    """Newton-Schulz inverse of SPD M (128x128), MXU matmuls only."""
    r1 = jnp.max(jnp.sum(jnp.abs(M), axis=0))
    rinf = jnp.max(jnp.sum(jnp.abs(M), axis=1))
    X = M.T / (r1 * rinf)
    eye2 = 2.0 * jnp.eye(TILE, dtype=M.dtype)

    def body(i, X):
        return jnp.dot(X, eye2 - jnp.dot(M, X, preferred_element_type=jnp.float32),
                       preferred_element_type=jnp.float32)

    return jax.lax.fori_loop(0, N_SCHULZ, body, X)


def _als_kernel(w_ref, keep_ref, eye_ref, inita_ref, params_ref,
                x_out_ref, iters_ref):
    W = w_ref[:]
    keep = keep_ref[:]
    eye_t = eye_ref[:]
    A0 = inita_ref[:]
    alpha = params_ref[0]
    beta = params_ref[1]
    mu0 = params_ref[2]
    tol = params_ref[3]
    max_iter = params_ref[4].astype(jnp.int32)
    stable_iters = params_ref[5].astype(jnp.int32)
    n_true = params_ref[6]

    W = 0.5 * (W + W.T)
    eye128 = jnp.eye(TILE, dtype=W.dtype)

    def ridge_solve(G, lam, RHS):
        # (G + lam I)^-1 RHS; lam on the full padded diagonal keeps it SPD
        return jnp.dot(_schulz_inverse(G + lam * eye128), RHS,
                       preferred_element_type=jnp.float32)

    def project_Z(X, Y, mu):
        Z = X + Y / mu
        Z = Z * keep + eye_t
        return jnp.clip(Z, 0.0, 1.0)

    def cond(state):
        X, Z, Y, A, mu, it, stable, done = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def body(state):
        X, Z, Y, A, mu, it, stable, _ = state
        X0 = X
        bin0 = X > 0.5
        X = Z - (Y - W + beta) / mu
        lam = alpha / mu
        AtA = jnp.dot(A.T, A, preferred_element_type=jnp.float32)
        B = ridge_solve(AtA, lam, jnp.dot(A.T, X, preferred_element_type=jnp.float32)).T
        BtB = jnp.dot(B.T, B, preferred_element_type=jnp.float32)
        A = ridge_solve(BtB, lam, jnp.dot(B.T, X.T, preferred_element_type=jnp.float32)).T
        X = jnp.dot(A, B.T, preferred_element_type=jnp.float32)
        Z = project_Z(X, Y, mu)
        Y = Y + mu * (X - Z)

        p_res = jnp.sqrt(jnp.sum((X - Z) ** 2)) / n_true
        d_res = mu * jnp.sqrt(jnp.sum((X - X0) ** 2)) / n_true
        done = jnp.logical_and(p_res < tol, d_res < tol)
        stable = jnp.where(jnp.all((X > 0.5) == bin0), stable + 1, 0)
        done = jnp.logical_or(
            done, jnp.logical_and(stable_iters > 0, stable >= stable_iters)
        )
        mu = jnp.where(p_res > 10 * d_res, 2 * mu,
                       jnp.where(d_res > 10 * p_res, mu / 2, mu))
        return X, Z, Y, A, mu, it + 1, stable, done

    state0 = (W, W, jnp.zeros_like(W), A0, mu0,
              jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
              jnp.asarray(False))
    X, Z, Y, A, mu, it, stable, done = jax.lax.while_loop(cond, body, state0)
    x_out_ref[:] = 0.5 * (X + X.T)
    iters_ref[0] = it


@functools.partial(
    jax.jit,
    static_argnames=("alpha", "beta", "mu0", "tol", "max_iter", "stable_iters",
                     "interpret"),
)
def match_als_pallas(
    W_pad: Array,        # (128, 128) zero-padded similarity
    keep: Array,         # (128, 128) f32 mask
    eye_t: Array,        # (128, 128) f32 true-diagonal
    init_A_pad: Array,   # (128, 128) zero-padded init factor
    n_true: int | Array,
    alpha: float = 50.0,
    beta: float = 0.1,
    mu0: float = 64.0,
    tol: float = 1e-4,
    max_iter: int = 1000,
    stable_iters: int = 10,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Returns (x_bin (128,128) bool, n_iters ())."""
    params = jnp.asarray(
        [alpha, beta, mu0, tol, float(max_iter), float(stable_iters), 0.0],
        dtype=jnp.float32,
    )
    params = params.at[6].set(jnp.asarray(n_true, jnp.float32))
    X, iters = pl.pallas_call(
        _als_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((TILE, TILE), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(W_pad, keep, eye_t, init_A_pad, params)
    return X > 0.5, iters[0]


class PallasAlsContext(NamedTuple):
    """Precomputed padded constants for a fixed (n, group_sizes) layout."""

    keep: Array
    eye_t: Array
    init_A: Array
    n_true: int

    @classmethod
    def build(cls, n: int, diag_mask: np.ndarray, init_A: np.ndarray) -> "PallasAlsContext":
        keep, eye_t = build_masks(n, np.asarray(diag_mask))
        return cls(
            keep=jnp.asarray(keep),
            eye_t=jnp.asarray(eye_t),
            init_A=jnp.asarray(_pad_to(np.asarray(init_A, dtype=np.float32), TILE, TILE)),
            n_true=n,
        )


def pad_similarity(W: Array) -> Array:
    n = W.shape[0]
    return jnp.zeros((TILE, TILE), dtype=jnp.float32).at[:n, :n].set(W)
