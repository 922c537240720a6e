"""Device-resident multi-way matching: ALS factorization, transitive closure
and group extraction — all shape-static and jittable.

Re-designs ref:src/mv_association.py:

- `match_als` (ref:222-318): the numpy ADMM/ALS loop (min -<W,X> + a||X||_* +
  b||X||_1 over the multi-matching polytope) becomes a `lax.while_loop` with
  masked convergence, fixed-rank factors and on-device (rank x rank) solves.
- `transform_closure` (ref:99-121): the reference's triple loop overwrites its
  accumulator per k and thus only applies the *last* pivot; here we compute
  the true transitive closure by log2(N) boolean matrix squarings (the actual
  intent — ALS outputs are near-transitive so the two rarely differ).
- `parse_match_result` (ref:src/motion_capture.py:417-446): "columns with
  support >= 2, row argmax" becomes a representative array: each element's
  group representative is the first (lowest-index) member of its equivalence
  class, and an element participates only when its group has >= 2 members.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.utils.precision import high_precision

Array = jnp.ndarray


def block_diag_mask(group_sizes: Tuple[int, ...]) -> np.ndarray:
    """(N, N) bool mask which is True inside each group's diagonal block.

    Groups are the reference's `dimGroup` segments (one per camera, plus one
    for tracklets in the spatial-time matrix; ref:src/mv_association.py:284-286).
    """
    n = int(sum(group_sizes))
    mask = np.zeros((n, n), dtype=bool)
    off = 0
    for g in group_sizes:
        mask[off:off + g, off:off + g] = True
        off += g
    return mask


def default_init_factor(n: int, rank: int) -> np.ndarray:
    """Seeded uniform init, matching the reference's RandomState(0).rand
    (ref:src/mv_association.py:271) for the same shape."""
    return np.random.RandomState(0).rand(n, rank).astype(np.float32)


class AlsResult(NamedTuple):
    x_bin: Array       # (N, N) bool, symmetric binarized match matrix
    n_iters: Array     # () int32, iterations until convergence (or max)
    # continuous symmetrized X before binarization (diagnostics: |X - 0.5|
    # margins identify bistable near-threshold associations); None from the
    # fused Pallas kernel, which binarizes in VMEM and never writes X out
    x: Array = None


@high_precision
@functools.partial(
    jax.jit,
    static_argnames=("alpha", "beta", "mu0", "tol", "max_iter", "stable_iters"),
)
def match_als(
    W: Array,
    diag_mask: Array,
    init_A: Array,
    alpha: float = 50.0,
    beta: float = 0.1,
    mu0: float = 64.0,
    tol: float = 1e-4,
    max_iter: int = 1000,
    stable_iters: int = 0,
) -> AlsResult:
    """ALS low-rank multi-way matching (ref:src/mv_association.py:222-318).

    Args:
      W: (N, N) similarity matrix (will be symmetrized).
      diag_mask: (N, N) bool, True inside same-group blocks (self matches
        forbidden there).
      init_A: (N, rank) initial factor (see `default_init_factor`).
      stable_iters: practical early exit — in addition to the reference's
        ADMM residual test (which often never fires: the iteration cycles at
        ~1e-3 residuals while the *binarized* matrix is long settled), stop
        once `X > 0.5` has been unchanged for this many consecutive
        iterations.  0 disables (exact reference schedule).
    """
    n = W.shape[0]
    rank = init_A.shape[1]
    dtype = W.dtype
    eye_r = jnp.eye(rank, dtype=dtype)
    eye_n = jnp.eye(n, dtype=bool)

    W = 0.5 * (W + W.T)

    def project_Z(X, Y, mu):
        Z = X + Y / mu
        Z = jnp.where(diag_mask, 0.0, Z)      # no self-group matches
        Z = jnp.where(eye_n, 1.0, Z)          # pSelect == 1: diagonal forced on
        return jnp.clip(Z, 0.0, 1.0)

    def chol_solve(M, rhs, lam):
        # M + lam is SPD: Cholesky beats LU on TPU for these small systems
        L = jax.lax.linalg.cholesky(M + lam)
        y = jax.lax.linalg.triangular_solve(L, rhs, left_side=True, lower=True)
        return jax.lax.linalg.triangular_solve(
            L, y, left_side=True, lower=True, transpose_a=True
        )

    def cond(state):
        X, Z, Y, A, mu, it, stable, done = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def body(state):
        X, Z, Y, A, mu, it, stable, _ = state
        X0 = X
        bin0 = X > 0.5
        X = Z - (Y - W + beta) / mu
        lam = (alpha / mu) * eye_r
        B = chol_solve(A.T @ A, A.T @ X, lam).T
        A = chol_solve(B.T @ B, B.T @ X.T, lam).T
        X = A @ B.T
        Z = project_Z(X, Y, mu)
        Y = Y + mu * (X - Z)

        p_res = jnp.linalg.norm(X - Z) / n
        d_res = mu * jnp.linalg.norm(X - X0) / n
        done = jnp.logical_and(p_res < tol, d_res < tol)
        if stable_iters > 0:
            stable = jnp.where(jnp.all((X > 0.5) == bin0), stable + 1, 0)
            done = jnp.logical_or(done, stable >= stable_iters)
        mu = jnp.where(p_res > 10 * d_res, 2 * mu,
                       jnp.where(d_res > 10 * p_res, mu / 2, mu))
        return X, Z, Y, A, mu, it + 1, stable, done

    state0 = (W, W, jnp.zeros_like(W), init_A.astype(dtype),
              jnp.asarray(mu0, dtype), jnp.asarray(0, jnp.int32),
              jnp.asarray(0, jnp.int32), jnp.asarray(False))
    X, Z, Y, A, mu, n_iters, _, _ = jax.lax.while_loop(cond, body, state0)

    X = 0.5 * (X + X.T)
    return AlsResult(x_bin=X > 0.5, n_iters=n_iters, x=X)


def transitive_closure(x_bin: Array) -> Array:
    """Reflexive-transitive closure of a boolean relation by repeated boolean
    matrix squaring (O(log N) MXU matmuls instead of the reference's Python
    triple loop, ref:src/mv_association.py:99-110)."""
    n = x_bin.shape[0]
    reach = jnp.logical_or(x_bin, jnp.eye(n, dtype=bool))
    n_steps = max(1, int(np.ceil(np.log2(max(n, 2)))))
    for _ in range(n_steps):
        f = reach.astype(jnp.float32)
        reach = (f @ f) > 0.5
    return reach


class MatchGroups(NamedTuple):
    rep: Array          # (N,) int32 — lowest-index member of each element's group
    group_size: Array   # (N,) int32 — size of the group containing each element
    member: Array       # (N,) bool  — element belongs to a group of size >= 2


def associate_frame(kps, valid, cams, cfg=None):
    """Standalone single-frame cross-view association (the reference's
    `match_multiview_poses`, ref:src/mv_association.py:414-457): spatial
    epipolar affinity -> ALS -> groups of (view, detection) pairs.

    kps: (V, P, K, 3) numpy/jax; valid: (V, P) bool.
    Returns List[List[(view, det)]] for groups with >= 2 members.
    """
    import numpy as np

    from multiview_motion_capture_tpu.cameras import pairwise_fundamental_np
    from multiview_motion_capture_tpu.config import PipelineConfig
    from multiview_motion_capture_tpu.ops.geometry import (
        projected_distance_all_pairs,
    )

    V, P = kps.shape[0], kps.shape[1]
    cfg = cfg or PipelineConfig(n_views=V, max_people=P)
    F = jnp.asarray(
        pairwise_fundamental_np(np.asarray(cams.K, dtype=np.float64),
                                np.asarray(cams.Rt, dtype=np.float64)),
        dtype=jnp.float32,
    )
    d = projected_distance_all_pairs(jnp.asarray(kps), F)  # (V,P,V,P)
    same_view = jnp.eye(V, dtype=bool)[:, None, :, None]
    d = jnp.where(same_view, cfg.spatial_fill_distance, d)
    dst = d.reshape(V * P, V * P)
    dst = jnp.where(jnp.eye(V * P, dtype=bool), 0.0, dst)
    dv = jnp.asarray(valid).reshape(-1)
    both = dv[:, None] & dv[None, :]
    cnt = jnp.maximum(both.sum(), 1)
    mean = jnp.sum(jnp.where(both, dst, 0.0)) / cnt
    var = jnp.sum(jnp.where(both, (dst - mean) ** 2, 0.0)) / cnt
    sim = jnp.where(
        both,
        jax.nn.sigmoid(-cfg.affinity_sigmoid_scale * (dst - mean)
                       / jnp.maximum(jnp.sqrt(var), 1e-6)),
        0.0,
    )
    sizes = (P,) * V
    res = match_als(sim, jnp.asarray(block_diag_mask(sizes)),
                    jnp.asarray(default_init_factor(V * P, cfg.als_max_rank)),
                    alpha=cfg.als_alpha, beta=cfg.als_beta, mu0=cfg.als_mu,
                    tol=cfg.als_tol, max_iter=cfg.als_max_iter,
                    stable_iters=cfg.als_stable_iters)
    g = extract_groups(res.x_bin, dv)
    rep = np.asarray(g.rep)
    member = np.asarray(g.member)
    groups = {}
    for e in range(V * P):
        if member[e]:
            groups.setdefault(int(rep[e]), []).append((e // P, e % P))
    return [v for _, v in sorted(groups.items()) if len(v) >= 2]


def extract_groups(x_bin: Array, elem_valid: Array) -> MatchGroups:
    """Equivalence-class extraction from a binarized match matrix
    (semantics of ref:src/mv_association.py:112-121 +
    ref:src/motion_capture.py:417-425: groups are led by their first member,
    only groups supported by >= 2 elements survive).

    `elem_valid` masks out padded slots: their rows/columns are ignored and
    they are never members.
    """
    valid2 = elem_valid[:, None] & elem_valid[None, :]
    closure = transitive_closure(x_bin & valid2)  # no links through padding
    closure = closure & valid2
    n = x_bin.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.asarray(n, jnp.int32)
    # rep[j] = min{ i valid : closure[i, j] }
    cand = jnp.where(closure, idx[:, None], big)
    rep = jnp.min(cand, axis=0)
    rep = jnp.where(elem_valid, rep, big)
    group_size = jnp.sum(closure, axis=0).astype(jnp.int32)
    member = elem_valid & (group_size >= 2)
    return MatchGroups(rep=rep, group_size=group_size, member=member)
