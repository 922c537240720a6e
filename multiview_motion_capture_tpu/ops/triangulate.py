"""Batched masked DLT triangulation + Gauss-Newton reprojection refinement.

Re-designs ref:src/mv_math_util.py:152-240 for TPU:

- the per-keypoint Python loop with dynamic "which views are good enough"
  lists becomes a weighted 4x4 normal-equation eigendecomposition, batched
  over keypoints (and vmappable over people),
- float32 conditioning is handled by solving the DLT in intrinsics-normalized
  coordinates (A rows built from K^-1 P, which is O(1)-scaled) instead of raw
  pixel projections — the reference gets away with raw pixels because it runs
  float64 numpy,
- the scipy `least_squares(max_nfev=2)` polish (ref:mv_math_util.py:189-208)
  becomes two fixed Gauss-Newton steps on the score-weighted pixel
  reprojection residual.  The reference weights the residual *norm* by the
  score; weighting per-coordinate diffs gives the identical least-squares
  objective (sum s^2 ||d||^2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from multiview_motion_capture_tpu.ops.geometry import project_points
from multiview_motion_capture_tpu.utils.precision import high_precision

Array = jnp.ndarray


def _dlt_normal_equations(P_norm: Array, xy_norm: Array, w: Array) -> Array:
    """Solve one point's weighted DLT.

    P_norm: (V, 3, 4) normalized projections, xy_norm: (V, 2), w: (V,) weights.
    Returns (3,) euclidean point.
    """
    # A rows per view: x*P[2] - P[0], y*P[2] - P[1]   (2V, 4)
    rows = jnp.stack(
        [
            xy_norm[:, 0:1] * P_norm[:, 2, :] - P_norm[:, 0, :],
            xy_norm[:, 1:2] * P_norm[:, 2, :] - P_norm[:, 1, :],
        ],
        axis=1,
    )  # (V, 2, 4)
    wr = rows * w[:, None, None]
    A = rows.reshape(-1, 4)
    WA = wr.reshape(-1, 4)
    AtA = A.T @ WA  # (4, 4), symmetric since w is per-view
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[:, 0]  # eigenvector of the smallest eigenvalue
    denom = jnp.where(jnp.abs(h[3]) < 1e-12, 1e-12, h[3])
    return h[:3] / denom


@high_precision
def triangulate_points(
    P: Array,
    K_inv: Array,
    kps: Array,
    view_mask: Array,
    min_score: float,
    refine_iters: int = 2,
    eps: float = 1e-6,
) -> Array:
    """Triangulate a group of keypoints observed by masked views.

    Semantics of ref:src/mv_math_util.py:152-212: per keypoint, views with
    score >= min_score are used; if fewer than 2 qualify, *all* masked views
    are used instead.  The output score is the mean score over the used views
    (or over all masked views in the fallback).  A fixed number of
    Gauss-Newton steps then minimizes the score-weighted reprojection
    residual over all masked views.

    Args:
      P:        (V, 3, 4) pixel projection matrices.
      K_inv:    (V, 3, 3) inverse intrinsics (for conditioning only).
      kps:      (V, K, 3) observed (x, y, score).
      view_mask:(V,) bool — which views participate at all.
    Returns:
      (K, 4) triangulated (x, y, z, score).
    """
    V = P.shape[0]
    vm = view_mask.astype(P.dtype)
    scores = kps[..., 2] * vm[:, None]  # (V, K); masked views score 0

    good = (kps[..., 2] >= min_score) & view_mask[:, None]  # (V, K)
    n_good = good.sum(axis=0)  # (K,)
    use_fallback = n_good < 2
    w = jnp.where(use_fallback[None, :], vm[:, None], good.astype(P.dtype))  # (V, K)

    out_score = jnp.sum(scores * w, axis=0) / jnp.maximum(w.sum(axis=0), 1.0)

    # normalized coordinates: x' = K^-1 x_h,  P' = K^-1 P (O(1) magnitudes)
    P_norm = jnp.einsum("vab,vbc->vac", K_inv, P)
    homo = jnp.concatenate([kps[..., :2], jnp.ones_like(kps[..., :1])], axis=-1)
    xyn = jnp.einsum("vab,vkb->vka", K_inv, homo)
    xy_norm = xyn[..., :2] / (xyn[..., 2:3] + 1e-12)

    pts = jax.vmap(_dlt_normal_equations, in_axes=(None, 1, 1))(P_norm, xy_norm, w)  # (K, 3)

    # Gauss-Newton polish on pixel reprojection, weighted by score*view_mask.
    def gn_step(p3d, _):
        def resid(x, obs_xy, obs_s):
            proj = project_points(P, x[None, :], eps=eps)[..., 0, :]  # (V, 2)
            return ((proj - obs_xy) * obs_s[:, None]).reshape(-1)  # (2V,)

        def one_point(x, obs):
            obs_xy, obs_s = obs[..., :2], obs[..., 2] * vm
            r = resid(x, obs_xy, obs_s)
            J = jax.jacfwd(resid)(x, obs_xy, obs_s)  # (2V, 3)
            JtJ = J.T @ J + 1e-8 * jnp.eye(3, dtype=x.dtype)
            return x - jnp.linalg.solve(JtJ, J.T @ r)

        return jax.vmap(one_point)(p3d, jnp.swapaxes(kps, 0, 1)), None

    if refine_iters > 0:
        pts, _ = jax.lax.scan(gn_step, pts, None, length=refine_iters)

    return jnp.concatenate([pts, out_score[:, None]], axis=-1)
