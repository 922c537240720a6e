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
    # All K points in one batch per step; the projection jacobian is closed
    # form (duv/dX = (P[:2,:3] - uv (x) P[2,:3]) / w, the same expression the
    # IK solver uses) and the 3x3 normal equations solve by adjugate —
    # math-identical to the previous jacfwd + LU version (which cost 3 extra
    # residual evaluations and a generic factorization per point per step;
    # the refine loops were the largest op of the scaled assoc-only profile).
    obs_xy = jnp.swapaxes(kps[..., :2], 0, 1)          # (K, V, 2)
    obs_s = jnp.swapaxes(kps[..., 2] * vm[:, None], 0, 1)  # (K, V)

    def gn_step(p3d):
        homo_p = jnp.concatenate([p3d, jnp.ones_like(p3d[:, :1])], axis=-1)
        proj = jnp.einsum("vab,kb->kva", P, homo_p)    # (K, V, 3)
        wq = proj[..., 2:3] + eps
        uv = proj[..., :2] / wq
        r = (uv - obs_xy) * obs_s[..., None]           # (K, V, 2)
        # J[k,v,i,x] = s * (P[v,i,x] - uv_i * P[v,2,x]) / w
        J = (
            (P[None, :, :2, :3] - uv[..., None] * P[None, :, None, 2, :3])
            / wq[..., None]
        ) * obs_s[..., None, None]                     # (K, V, 2, 3)
        Jf = J.reshape(J.shape[0], -1, 3)              # (K, 2V, 3)
        rf = r.reshape(r.shape[0], -1)                 # (K, 2V)
        A = jnp.einsum("krx,kry->kxy", Jf, Jf) + 1e-8 * jnp.eye(3, dtype=p3d.dtype)
        g = jnp.einsum("krx,kr->kx", Jf, rf)
        # adjugate solve of the 3x3 SPD system
        a, b, c = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
        d, e, f = A[:, 1, 1], A[:, 1, 2], A[:, 2, 2]
        co00 = d * f - e * e
        co01 = c * e - b * f
        co02 = b * e - c * d
        co11 = a * f - c * c
        co12 = b * c - a * e
        co22 = a * d - b * b
        det = a * co00 + b * co01 + c * co02
        inv_det = 1.0 / det
        dx = jnp.stack(
            [
                co00 * g[:, 0] + co01 * g[:, 1] + co02 * g[:, 2],
                co01 * g[:, 0] + co11 * g[:, 1] + co12 * g[:, 2],
                co02 * g[:, 0] + co12 * g[:, 1] + co22 * g[:, 2],
            ],
            axis=-1,
        ) * inv_det[:, None]
        return p3d - dx

    for _ in range(refine_iters):
        pts = gn_step(pts)

    return jnp.concatenate([pts, out_score[:, None]], axis=-1)
