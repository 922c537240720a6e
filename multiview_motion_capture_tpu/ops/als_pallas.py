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
- the ridge solves (A^T A + lam I)^-1 RHS exploit that only the leading
  rank x rank block of the padded normal matrix is non-trivial: a statically
  unrolled Gauss-Jordan on the (rank_pad, rank_pad + 128) augmented block
  (~rank_pad steps of 3 VPU ops) replaces the earlier Newton-Schulz scheme
  (28 full 128x128 MXU matmuls per solve) at better accuracy,
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
# largest padded matrix the fused kernel accepts: 3x3 MXU tiles (a 384-wide
# association matrix covers a 32-cam x 10-people rig at N = 336).  All six
# live (pad, pad) f32 state matrices plus the rank-row GJ workspace fit
# VMEM with room to spare (~4.5 MB at 384); beyond this the XLA while-loop
# path takes over.
MAX_PAD = 384


def pad_for(n: int) -> int:
    """Smallest 128-multiple >= n (the kernel's padded matrix side)."""
    return max(TILE, -(-n // TILE) * TILE)


def max_als_batch(pad: int) -> int:
    """Largest C the batched kernel fits in scoped VMEM at this pad.

    The batched program keeps every cluster's ADMM state resident for the
    whole solve; the compiler's measured stack need at (C=4, pad=384) was
    16.25 MB against the 16 MB scoped-vmem limit (128-cam bench, r5).
    That calibrates to ~6.5 live (pad, pad) f32 buffers per cluster
    (X/Z/Y/A + update temporaries) plus ~2.5 shared (keep, eye_t, B
    workspace).  Budgeted at 15 MB for headroom; callers chunk batches
    larger than this into sequential pallas_calls (tracker
    _clustered_association)."""
    per = 6.5 * pad * pad * 4
    shared = 2.5 * pad * pad * 4
    return max(1, int((15 * 1024 * 1024 - shared) // per))


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


def _ridge_solve_gj(G: Array, lam: Array, RHS: Array, rank_pad: int) -> Array:
    """(G + lam I)^-1 RHS where only G's leading (rank_pad, rank_pad) block
    is populated (A's padded columns are zero).  Statically-unrolled
    Gauss-Jordan on the augmented block; rows >= rank_pad of the result are
    exactly zero (matching RHS_pad / lam = 0 of the full padded solve).

    G: (rtile, rtile); RHS: (rtile, pad).  Returns (rtile, pad).
    (rtile is the factor's padded column count — one 128-lane tile for any
    true rank <= 128; pad is the padded matrix side.)
    """
    # Only the leading rank-block of the system is real: A's columns past
    # rank_pad are zero, so G's rows/cols and RHS's ROWS past rank_pad are
    # zero, and the solution rows there are zero too (lam x = 0).  The
    # elimination therefore runs on an 8-aligned (rb, rb + pad) slice — a
    # 4-8x smaller working set per VPU step than the full (pad, 2 pad)
    # augmented block (zero-offset slices keep Mosaic's layout rules happy;
    # the lane dim is padded to a tile internally either way, but the
    # sublane height is what each masked-select step pays for).
    rtile, pad = G.shape[0], RHS.shape[1]
    rb = min(rtile, max(32, rank_pad))  # 8-aligned block height
    eye_full = (
        jax.lax.broadcasted_iota(jnp.int32, (rb, rtile), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (rb, rtile), 1)
    ).astype(G.dtype)
    # rows only (sublane dim): lanes stay at the full tile width — a 32-lane
    # slice forces per-step relayouts that explode Mosaic compile time
    A_blk = G[:rb, :] + lam * eye_full           # (rb, rtile)
    aug = jnp.concatenate([A_blk, RHS[:rb, :]], axis=1)  # (rb, rtile + pad)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, aug.shape, 0)
    for k in range(rank_pad):  # static unroll: SPD + ridge needs no pivoting
        pivot_row = aug[k : k + 1, :] / aug[k, k]
        col = aug[:, k : k + 1]
        # eliminate column k everywhere, then restore row k as the pivot row
        # (masked select instead of .at[].set — scatter updates capture index
        # constants the pallas tracer rejects)
        aug = jnp.where(row_ids == k, pivot_row, aug - col * pivot_row)
    sol = aug[:, rtile:]  # (rb, pad); rows in [rank_pad, rb) are exactly zero
    return jnp.concatenate(
        [sol, jnp.zeros((rtile - rb, pad), dtype=G.dtype)], axis=0
    )


def _als_kernel(w_ref, keep_ref, eye_ref, inita_ref, params_ref,
                x_out_ref, iters_ref, *, rank_pad: int):
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
    # A0 is (pad, rtile) — the factor keeps only one-lane-tile-aligned
    # columns (rtile = 128 for any true rank <= 128).  At pad = 384 this
    # cuts the per-iteration matmul FLOPs ~3.3x vs the earlier square
    # (pad, pad) factor: A^T A and B^T B contract to (rtile, rtile), and
    # A B^T is (pad, rtile) x (rtile, pad).  Exact-math identical — the
    # dropped columns are structurally zero through every iterate.

    def ridge_solve(G, lam, RHS):
        return _ridge_solve_gj(G, lam, RHS, rank_pad)

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
                     "rank", "interpret"),
)
def match_als_pallas(
    W_pad: Array,        # (pad, pad) zero-padded similarity (pad = 128*k)
    keep: Array,         # (pad, pad) f32 mask
    eye_t: Array,        # (pad, pad) f32 true-diagonal
    init_A_pad: Array,   # (pad, rtile) zero-padded init factor (rtile = 128*j)
    n_true: int | Array,
    alpha: float = 50.0,
    beta: float = 0.1,
    mu0: float = 64.0,
    tol: float = 1e-4,
    max_iter: int = 1000,
    stable_iters: int = 10,
    rank: int = TILE,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Returns (x_bin (pad,pad) bool, n_iters ()).  `rank` is the true ALS
    factor rank (init_A's column count before padding); the ridge solves run
    on its 8-aligned block only."""
    pad = W_pad.shape[0]
    rank_pad = min(pad, max(8, -(-int(rank) // 8) * 8))
    params = jnp.asarray(
        [alpha, beta, mu0, tol, float(max_iter), float(stable_iters), 0.0],
        dtype=jnp.float32,
    )
    params = params.at[6].set(jnp.asarray(n_true, jnp.float32))
    X, iters = pl.pallas_call(
        functools.partial(_als_kernel, rank_pad=rank_pad),
        out_shape=(
            jax.ShapeDtypeStruct((pad, pad), jnp.float32),
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


def _ridge_solve_gj_batched(G: Array, lams, RHS: Array,
                            rank_pad: int) -> Array:
    """Batched `_ridge_solve_gj`: G (C, rtile, rtile), lams = C traced
    scalars, RHS (C, rtile, pad) -> (C, rtile, pad).  Same
    statically-unrolled elimination; the C problems ride the leading
    (major) dimension, so the ~rank_pad-step sequential dependency chain —
    the kernel's measured per-iteration latency floor — is paid ONCE for
    all C clusters instead of per cluster (the same amortization that took
    the LM Gauss-Jordan solve from grid to one-program,
    ops/solve_pallas.py).  lam rides as per-cluster scalars because Mosaic
    cannot broadcast a (C, 1, 1) vector across both sublanes and lanes."""
    C, rtile = G.shape[0], G.shape[1]
    pad = RHS.shape[2]
    rb = min(rtile, max(32, rank_pad))
    eye_full = (
        jax.lax.broadcasted_iota(jnp.int32, (rb, rtile), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (rb, rtile), 1)
    ).astype(G.dtype)
    A_blk = jnp.concatenate(
        [(G[c, :rb, :] + lams[c] * eye_full)[None] for c in range(C)],
        axis=0)                                          # (C, rb, rtile)
    aug = jnp.concatenate([A_blk, RHS[:, :rb, :]], axis=2)  # (C, rb, rtile+pad)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, aug.shape, 1)
    for k in range(rank_pad):  # static unroll: SPD + ridge needs no pivoting
        pivot_row = aug[:, k : k + 1, :] / aug[:, k : k + 1, k : k + 1]
        col = aug[:, :, k : k + 1]
        aug = jnp.where(row_ids == k, pivot_row, aug - col * pivot_row)
    sol = aug[:, :, rtile:]                               # (C, rb, pad)
    return jnp.concatenate(
        [sol, jnp.zeros((C, rtile - rb, pad), dtype=G.dtype)], axis=1
    )


def _als_kernel_batched(w_ref, keep_ref, eye_ref, inita_ref, params_ref,
                       x_out_ref, iters_ref, *, rank_pad: int):
    """C independent ALS solves (same layout, different W) in ONE program.

    Identical per-cluster semantics to `_als_kernel`: each cluster's state
    freezes the moment ITS stop test fires (residuals or stable
    binarization), so a cluster's result is bit-equal to its own
    single-problem solve; the loop runs until every cluster is done.  What
    batching buys is the ridge-GJ dependency chain and the per-iteration
    loop overhead amortized across clusters — the xplane profile shows the
    384-pad kernel at a ~13.7 us/iteration latency floor that the
    narrow-factor matmul reduction did not move (docs/PERF.md).

    Matmuls and transposes are statically unrolled over the (small, 2-4)
    cluster count — per-slice 2D ops keep Mosaic's layout rules happy.
    Per-cluster bookkeeping (mu, residuals, stability counters, done
    flags) is carried as C separate TRUE SCALARS, never rank-1 (C,)
    vectors: Mosaic's vector-layout inference CHECK-crashes on rank-1
    elementwise ops inside this kernel (layout.h:320 `arr.size() >=
    layout_rank`), the same class of crash as r1's rank-3 output issue.
    """
    W = w_ref[:]           # (C, pad, pad)
    keep = keep_ref[:]     # (pad, pad) shared across clusters
    eye_t = eye_ref[:]
    A0 = inita_ref[:]      # (pad, rtile) shared
    alpha = params_ref[0]
    beta = params_ref[1]
    mu0 = params_ref[2]
    tol = params_ref[3]
    max_iter = params_ref[4].astype(jnp.int32)
    stable_iters = params_ref[5].astype(jnp.int32)
    n_true = params_ref[6]
    C = W.shape[0]

    def per_c(fn):
        return jnp.concatenate([fn(c)[None] for c in range(C)], axis=0)

    W = 0.5 * (W + per_c(lambda c: W[c].T))
    A_init = per_c(lambda c: A0)

    def cond(state):
        it = state[4]
        done = state[7]
        done_all = done[0]
        for c in range(1, C):
            done_all = jnp.logical_and(done_all, done[c])
        return jnp.logical_and(it < max_iter, jnp.logical_not(done_all))

    def body(state):
        X, Z, Y, A, it, mu, stable, done, iters = state
        X0 = X
        bin0 = X > 0.5
        lams = [alpha / m for m in mu]
        # scalar-broadcast elementwise ops run per cluster (2D x scalar):
        # Mosaic rejects broadcasting a (C,1,1) across sublanes AND lanes
        Xn = per_c(lambda c: Z[c] - (Y[c] - W[c] + beta) / mu[c])
        AtA = per_c(lambda c: jnp.dot(A[c].T, A[c],
                                      preferred_element_type=jnp.float32))
        R1 = per_c(lambda c: jnp.dot(A[c].T, Xn[c],
                                     preferred_element_type=jnp.float32))
        Bs = _ridge_solve_gj_batched(AtA, lams, R1, rank_pad)
        B = per_c(lambda c: Bs[c].T)                      # (C, pad, rtile)
        BtB = per_c(lambda c: jnp.dot(B[c].T, B[c],
                                      preferred_element_type=jnp.float32))
        R2 = per_c(lambda c: jnp.dot(B[c].T, Xn[c].T,
                                     preferred_element_type=jnp.float32))
        As = _ridge_solve_gj_batched(BtB, lams, R2, rank_pad)
        An = per_c(lambda c: As[c].T)                     # (C, pad, rtile)
        Xn = per_c(lambda c: jnp.dot(An[c], Bs[c],
                                     preferred_element_type=jnp.float32))
        Zn = per_c(lambda c: jnp.clip(
            (Xn[c] + Y[c] / mu[c]) * keep + eye_t, 0.0, 1.0))
        Yn = per_c(lambda c: Y[c] + mu[c] * (Xn[c] - Zn[c]))

        # per-cluster scalar bookkeeping + frozen-state selection
        Xs, Zs, Ys, As_, = [], [], [], []
        mu_o, stable_o, done_o, iters_o = [], [], [], []
        for c in range(C):
            upd = jnp.logical_not(done[c])
            p_res = jnp.sqrt(jnp.sum((Xn[c] - Zn[c]) ** 2)) / n_true
            d_res = mu[c] * jnp.sqrt(jnp.sum((Xn[c] - X0[c]) ** 2)) / n_true
            same = jnp.all((Xn[c] > 0.5) == bin0[c])
            stable_n = jnp.where(same, stable[c] + 1, 0)
            done_n = jnp.logical_or(
                jnp.logical_and(p_res < tol, d_res < tol),
                jnp.logical_and(stable_iters > 0, stable_n >= stable_iters),
            )
            mu_n = jnp.where(p_res > 10 * d_res, 2 * mu[c],
                             jnp.where(d_res > 10 * p_res, mu[c] / 2, mu[c]))
            Xs.append(jnp.where(upd, Xn[c], X[c])[None])
            Zs.append(jnp.where(upd, Zn[c], Z[c])[None])
            Ys.append(jnp.where(upd, Yn[c], Y[c])[None])
            As_.append(jnp.where(upd, An[c], A[c])[None])
            mu_o.append(jnp.where(upd, mu_n, mu[c]))
            stable_o.append(jnp.where(upd, stable_n, stable[c]))
            done_o.append(jnp.where(upd, done_n, done[c]))
            iters_o.append(jnp.where(upd, it + 1, iters[c]))
        return (jnp.concatenate(Xs, axis=0), jnp.concatenate(Zs, axis=0),
                jnp.concatenate(Ys, axis=0), jnp.concatenate(As_, axis=0),
                it + 1, tuple(mu_o), tuple(stable_o), tuple(done_o),
                tuple(iters_o))

    state0 = (
        W, W, jnp.zeros_like(W), A_init,
        jnp.asarray(0, jnp.int32),
        tuple(mu0 * jnp.ones((), jnp.float32) for _ in range(C)),
        tuple(jnp.asarray(0, jnp.int32) for _ in range(C)),
        tuple(jnp.asarray(False) for _ in range(C)),
        tuple(jnp.asarray(0, jnp.int32) for _ in range(C)),
    )
    out = jax.lax.while_loop(cond, body, state0)
    X, iters = out[0], out[8]
    x_out_ref[:] = 0.5 * (X + per_c(lambda c: X[c].T))
    for c in range(C):
        iters_ref[c] = iters[c]


@functools.partial(
    jax.jit,
    static_argnames=("alpha", "beta", "mu0", "tol", "max_iter", "stable_iters",
                     "rank", "interpret"),
)
def match_als_pallas_batched(
    W_pad: Array,        # (C, pad, pad) zero-padded similarities
    keep: Array,         # (pad, pad) f32 mask (shared layout)
    eye_t: Array,        # (pad, pad) f32 true-diagonal
    init_A_pad: Array,   # (pad, rtile) zero-padded init factor
    n_true: int | Array,
    alpha: float = 50.0,
    beta: float = 0.1,
    mu0: float = 64.0,
    tol: float = 1e-4,
    max_iter: int = 1000,
    stable_iters: int = 10,
    rank: int = TILE,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Batched `match_als_pallas` over C same-layout problems.  Returns
    (x_bin (C, pad, pad) bool, n_iters (C,)).  Per-problem results equal
    the single-problem kernel's (each problem freezes at its own stop
    test); used by the hierarchical-cluster association, where the C
    per-cluster solves otherwise run sequentially."""
    C, pad = W_pad.shape[0], W_pad.shape[1]
    rank_pad = min(pad, max(8, -(-int(rank) // 8) * 8))
    params = jnp.asarray(
        [alpha, beta, mu0, tol, float(max_iter), float(stable_iters), 0.0],
        dtype=jnp.float32,
    )
    params = params.at[6].set(jnp.asarray(n_true, jnp.float32))
    X, iters = pl.pallas_call(
        functools.partial(_als_kernel_batched, rank_pad=rank_pad),
        out_shape=(
            jax.ShapeDtypeStruct((C, pad, pad), jnp.float32),
            jax.ShapeDtypeStruct((C,), jnp.int32),
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
    return X > 0.5, iters


class PallasAlsContext(NamedTuple):
    """Precomputed padded constants for a fixed (n, group_sizes) layout."""

    keep: Array
    eye_t: Array
    init_A: Array
    n_true: int
    rank: int = TILE
    pad: int = TILE

    @classmethod
    def build(cls, n: int, diag_mask: np.ndarray, init_A: np.ndarray) -> "PallasAlsContext":
        pad = pad_for(n)
        if pad > MAX_PAD:
            raise ValueError(
                f"association matrix n={n} exceeds the fused kernel's "
                f"MAX_PAD={MAX_PAD}; use the XLA backend"
            )
        keep, eye_t = build_masks(n, np.asarray(diag_mask), pad=pad)
        rank = int(np.asarray(init_A).shape[1])
        # factor columns padded to the next lane tile only (not the full
        # matrix side): rank <= 128 keeps the factor one tile wide, which
        # is what makes the multi-tile kernels' matmuls cheap
        rtile = min(pad, pad_for(rank))
        return cls(
            keep=jnp.asarray(keep),
            eye_t=jnp.asarray(eye_t),
            init_A=jnp.asarray(_pad_to(np.asarray(init_A, dtype=np.float32), pad, rtile)),
            n_true=n,
            rank=rank,
            pad=pad,
        )


def pad_similarity(W: Array, pad: int = TILE) -> Array:
    n = W.shape[0]
    if n == pad:
        return W.astype(jnp.float32)
    return jnp.zeros((pad, pad), dtype=jnp.float32).at[:n, :n].set(W)
