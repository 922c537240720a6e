"""Alternate multi-way matching solvers (the reference's commented-out
options at ref:src/motion_capture.py:757-760): SVT, spectral, and binary-LP.

`match_als` (ops/association.py) is the live solver; these are provided for
inventory parity and experimentation:

- `match_svt` — singular-value-thresholding ADMM with the doubly-stochastic
  projection (ref:src/mv_association.py:321-411 + `myproj2dpam` :15-61),
  fully jittable (fixed-iteration simplex projections, device SVD).
- `match_eig_np` — spectral rounding (ref:src/mv_association.py:187-219),
  host-side numpy + the native Hungarian (tiny matrices; eig of a
  non-symmetric matrix has no TPU-friendly form).
- `match_bip` — the reference's binary-LP matcher
  (ref:src/mv_association.py:124-176) builds an *unconstrained* maximization
  (its transitivity constraints are commented out at :156-157), whose exact
  optimum is simply x_ij = [cor_ij > 0.5]; implemented in closed form.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.utils.precision import high_precision

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# simplex projection (vectorized proj2pav, ref:src/mv_association.py:49-61)
# ---------------------------------------------------------------------------

def _project_rows_to_pav(X: Array) -> Array:
    """Row-wise projection used by the doubly-stochastic step: negatives
    clipped; rows with mass > 1 projected onto the probability simplex."""
    y = jnp.maximum(X, 0.0)
    n = y.shape[-1]
    u = jnp.sort(y, axis=-1)[..., ::-1]
    sv = jnp.cumsum(u, axis=-1)
    k = jnp.arange(1, n + 1, dtype=X.dtype)
    cond = u > (sv - 1.0) / k
    rho = jnp.sum(cond, axis=-1) - 1  # last index where cond holds
    sv_rho = jnp.take_along_axis(sv, rho[..., None].clip(0), axis=-1)[..., 0]
    theta = jnp.maximum(0.0, (sv_rho - 1.0) / (rho + 1.0))
    proj = jnp.maximum(y - theta[..., None], 0.0)
    needs = jnp.sum(y, axis=-1, keepdims=True) >= 1.0
    return jnp.where(needs, proj, y)


def doubly_stochastic_projection(X: Array, n_iters: int = 10) -> Array:
    """Alternating row/column simplex projections with Dykstra-style
    increments (ref:src/mv_association.py:15-61), fixed iteration count."""

    def body(carry, _):
        X0, I2 = carry
        X1 = _project_rows_to_pav(X0 + I2)
        I1 = X1 - (X0 + I2)
        X2 = _project_rows_to_pav((X0 + I1).T).T
        I2n = X2 - (X0 + I1)
        return (X2, I2n), None

    (Xf, _), _ = jax.lax.scan(body, (X, jnp.zeros_like(X)), None, length=n_iters)
    return Xf


# ---------------------------------------------------------------------------
# SVT matcher
# ---------------------------------------------------------------------------

@high_precision
@functools.partial(
    jax.jit,
    static_argnames=(
        "group_sizes", "alpha", "lam", "mu0", "tol", "max_iter", "dual_stochastic",
    ),
)
def match_svt(
    S: Array,
    diag_mask: Array,
    group_sizes: Tuple[int, ...] = (),
    alpha: float = 0.1,
    lam: float = 50.0,
    mu0: float = 64.0,
    tol: float = 5e-4,
    max_iter: int = 20,
    dual_stochastic: bool = True,
) -> Tuple[Array, Array]:
    """Singular-value-thresholding ADMM multi-way matcher
    (ref:src/mv_association.py:321-411).  Returns (x_bin, n_iters).

    The doubly-stochastic projection is applied per camera-pair block (a
    person may appear once *per view*, so whole-matrix row sums legitimately
    exceed 1; ref:mv_association.py:372-380).  Block boundaries come from the
    static `group_sizes`."""
    n = S.shape[0]
    eye = jnp.eye(n, dtype=bool)
    offs = np.cumsum((0,) + tuple(group_sizes)).tolist()

    def project_blocks(X):
        for i in range(len(group_sizes)):
            for j in range(len(group_sizes)):
                si, sj = slice(offs[i], offs[i + 1]), slice(offs[j], offs[j + 1])
                if offs[i + 1] > offs[i] and offs[j + 1] > offs[j]:
                    X = X.at[si, sj].set(doubly_stochastic_projection(X[si, sj]))
        return X
    S = jnp.where(eye, 0.0, S)
    S = 0.5 * (S + S.T)
    W = alpha - S

    def cond(state):
        X, Y, mu, it, done = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def body(state):
        X, Y, mu, it, _ = state
        X0 = X
        U, s, Vt = jnp.linalg.svd(Y / mu + X, full_matrices=False)
        s = jnp.maximum(s - lam / mu, 0.0)
        Q = (U * s[None, :]) @ Vt
        X = Q - (W + Y) / mu
        X = jnp.where(diag_mask, 0.0, X)
        X = jnp.where(eye, 1.0, X)
        X = jnp.clip(X, 0.0, 1.0)
        if dual_stochastic and group_sizes:
            X = project_blocks(X)
        X = 0.5 * (X + X.T)
        Y = Y + mu * (X - Q)
        p_res = jnp.linalg.norm(X - Q) / n
        d_res = mu * jnp.linalg.norm(X - X0) / n
        done = jnp.logical_and(p_res < tol, d_res < tol)
        mu = jnp.where(p_res > 10 * d_res, 2 * mu,
                       jnp.where(d_res > 10 * p_res, mu / 2, mu))
        return X, Y, mu, it + 1, done

    state0 = (S, jnp.zeros_like(S), jnp.asarray(mu0, S.dtype),
              jnp.asarray(0, jnp.int32), jnp.asarray(False))
    X, Y, mu, n_iters, _ = jax.lax.while_loop(cond, body, state0)
    X = 0.5 * (X + X.T)
    return X > 0.5, n_iters


# ---------------------------------------------------------------------------
# spectral matcher (host-side)
# ---------------------------------------------------------------------------

def match_eig_np(S: np.ndarray, group_sizes) -> np.ndarray:
    """Spectral multi-way matching (ref:src/mv_association.py:187-219):
    per-block Hungarian binarization, top-d eigen-embedding, per-block
    Hungarian rounding.  Host-side (tiny matrices)."""
    from multiview_motion_capture_tpu.utils.native import hungarian

    offs = np.cumsum([0] + list(group_sizes))
    n_groups = len(group_sizes)
    d = max(group_sizes)

    def biparti(block):
        rows, cols = hungarian(-block)
        P = np.zeros_like(block)
        P[rows, cols] = 1
        return P

    Z = np.zeros_like(S)
    for i in range(n_groups):
        for j in range(n_groups):
            bi, bj = slice(offs[i], offs[i + 1]), slice(offs[j], offs[j + 1])
            if offs[i + 1] > offs[i] and offs[j + 1] > offs[j]:
                Z[bi, bj] = biparti(S[bi, bj])

    vals, vecs = np.linalg.eig(Z)
    order = np.argsort(-vals.real)
    vals, vecs = vals[order[:d]], vecs[:, order[:d]]
    U = (vecs * np.sqrt(np.maximum(vals.real, 0.0))).real

    out = np.zeros_like(S)
    for i in range(n_groups):
        for j in range(n_groups):
            if i == j:
                continue
            bi, bj = slice(offs[i], offs[i + 1]), slice(offs[j], offs[j + 1])
            if offs[i + 1] > offs[i] and offs[j + 1] > offs[j]:
                blk = U[bi] @ U[bj].T
                blk[blk < 0] = 0
                out[bi, bj] = biparti(blk)
    return out > 0.5


# ---------------------------------------------------------------------------
# binary-"LP" matcher
# ---------------------------------------------------------------------------

def match_bip(cor_mat: np.ndarray, min_cor: float = 0.2) -> np.ndarray:
    """The reference's LP formulation maximizes sum_{ij} 2(c_ij - 0.5) x_ij
    over binary x with NO active constraints (transitivity is commented out,
    ref:src/mv_association.py:156-157), so the exact optimum is
    x_ij = [c_ij > 0.5] restricted to candidate edges c_ij > min_cor."""
    c = np.asarray(cor_mat, dtype=np.float64).copy()
    np.fill_diagonal(c, 0.0)
    x = (c > max(min_cor, 0.5))
    return np.triu(x, 1) | np.triu(x, 1).T
