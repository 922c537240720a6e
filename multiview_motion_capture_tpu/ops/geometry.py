"""Batched epipolar / projective geometry kernels.

Everything here is shape-static, mask-driven and jit/vmap friendly; the
reference's per-pair Python loops and cv2 calls
(ref:src/mv_math_util.py:57-115,267-351) become einsums over all
(view-pair x detection x detection x keypoint) at once.

Conventions:
- points are pixel coordinates, homogeneous via an appended 1,
- epipolar lines are normalized so a^2 + b^2 = 1 (cv2.computeCorrespondEpilines
  semantics), making |l . x| the point-line distance in pixels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from multiview_motion_capture_tpu.utils.precision import high_precision

Array = jnp.ndarray


# --------------------------------------------------------------------------
# fundamental matrices
# --------------------------------------------------------------------------

@high_precision
def fundamental_from_projections(P1: Array, P2: Array) -> Array:
    """F from two 3x4 projection matrices via the minor/determinant
    construction (the formula behind ref:src/mv_math_util.py:57-77; see
    Hartley & Zisserman 9.2.2).  Batched over leading dims of P1/P2."""

    def _single(p1, p2):
        # x[j]: rows of p1 with row j deleted (in cyclic order), same for y.
        idx = jnp.asarray([[1, 2], [2, 0], [0, 1]])
        x = p1[idx]  # (3, 2, 4)
        y = p2[idx]  # (3, 2, 4)
        # F[i, j] = det([x[j]; y[i]])  (4x4)
        stacked = jnp.concatenate(
            [
                jnp.broadcast_to(x[None, :, :, :], (3, 3, 2, 4)),
                jnp.broadcast_to(y[:, None, :, :], (3, 3, 2, 4)),
            ],
            axis=2,
        )  # (i, j, 4, 4)
        return jnp.linalg.det(stacked)

    batch_dims = P1.shape[:-2]
    if batch_dims:
        flat1 = P1.reshape((-1, 3, 4))
        flat2 = P2.reshape((-1, 3, 4))
        out = jax.vmap(_single)(flat1, flat2)
        return out.reshape(batch_dims + (3, 3))
    return _single(P1, P2)


def _skew(v: Array) -> Array:
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


@high_precision
def pairwise_fundamental_mats(K: Array, Rt: Array) -> Array:
    """All-pairs fundamental tensor (V, V, 3, 3).

    Same closed form as the reference's per-pair torch lambda
    (ref:src/mv_math_util.py:267-285):
      F_ij = K_i^-T (R_i R_j^T) K_j^T [K_j R_j R_i^T (t_i - R_i R_j^T t_j)]_x
    computed for every ordered pair in one batch.  A tiny epsilon is added to
    all-zero diagonal entries to avoid NaNs downstream (ref:mv_math_util.py:282-283).
    """
    R = Rt[..., :3]      # (V, 3, 3)
    t = Rt[..., 3]       # (V, 3)
    K_inv_T = jnp.linalg.inv(K).transpose(0, 2, 1)

    Rij = jnp.einsum("iab,jcb->ijac", R, R)                      # R_i R_j^T
    rel_t = t[:, None, :] - jnp.einsum("ijab,jb->ija", Rij, t)   # t_i - R_i R_j^T t_j
    e = jnp.einsum("jab,ijcb->ijac", K, Rij.transpose(0, 1, 3, 2))  # K_j R_j R_i^T
    e = jnp.einsum("ijab,ijb->ija", e, rel_t)
    F = jnp.einsum("iab,ijbc,jdc,ijde->ijae", K_inv_T, Rij, K, _skew(e))
    # keep the diagonal finite (self-pair F is exactly zero)
    eye = jnp.eye(F.shape[0], dtype=bool)[:, :, None, None]
    return jnp.where(eye, F + 1e-12, F)


# --------------------------------------------------------------------------
# epipolar line distances
# --------------------------------------------------------------------------

def _normalize_lines(lines: Array) -> Array:
    n = jnp.sqrt(lines[..., 0] ** 2 + lines[..., 1] ** 2)
    return lines / (n[..., None] + 1e-12)


def epilines(F: Array, pts: Array, which: int) -> Array:
    """Epipolar lines for `pts`, cv2.computeCorrespondEpilines semantics:
    which=1: pts in image 1 -> lines in image 2 (l = F x);
    which=2: pts in image 2 -> lines in image 1 (l = F^T x).
    pts: (..., K, 2) keypoint sets; F: (..., 3, 3) broadcastable against the
    leading dims of pts (without the K axis).  Returns (..., K, 3) unit-normal
    lines.
    """
    homo = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    mat = F if which == 1 else jnp.swapaxes(F, -1, -2)
    lines = jnp.einsum("...ab,...kb->...ka", mat, homo)
    return _normalize_lines(lines)


@high_precision
def projected_distance_all_pairs(kps: Array, F: Array) -> Array:
    """Spatial-association distance block for every view pair at once.

    Re-designs ref:src/mv_math_util.py:288-317 (`projected_distance`, which is
    hard-coded to 17 kps and looped per pair at :329-343): for poses
    `kps[a, i]` of view a and `kps[b, j]` of view b,

      dist[a, i, b, j] = 0.5 * ( mean_k |l(F_ab^T x_aik) . x_bjk|
                               + mean_k |l(F_ba^T x_bjk) . x_aik| )

    matching the reference's symmetrization at :338-339 exactly (note the
    reference passes whichImage=2, i.e. lines come from F^T).

    kps: (V, P, K, >=2) pixel keypoints (scores ignored, as in the reference).
    F:   (V, V, 3, 3) pairwise fundamental tensor.
    Returns (V, P, V, P) distances.
    """
    xy = kps[..., :2]
    homo = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)  # (V,P,K,3)
    # lines in the *other* image for points of view a under pair (a,b):
    # l_abik = normalize(F_ab^T x_aik)
    lines = jnp.einsum("abyx,apky->abpkx", F, homo)  # note the transpose via index swap
    lines = _normalize_lines(lines)
    # d1[a,b,i,j] = mean_k |l_abik . x_bjk|
    d = jnp.abs(jnp.einsum("abpkx,bqkx->abpqk", lines, homo)).mean(axis=-1)
    sym = 0.5 * (d + jnp.transpose(d, (1, 0, 3, 2)))  # + d_ba[j,i]
    return jnp.transpose(sym, (0, 2, 1, 3))  # (V, P, V, P)


@high_precision
def masked_symmetric_epipolar_error(
    kps_a: Array, kps_b: Array, F_ab: Array, min_pair_score: float
) -> Array:
    """Score-gated symmetric epipolar error between two keypoint sets
    (ref:src/mv_math_util.py:80-115 `calc_epipolar_error`).

    kps_a, kps_b: (..., K, 3) with scores; F_ab maps image a points to lines
    in image b via l = F x (the reference builds F with
    `get_fundamental_matrix(cam_a.P, cam_b.P)` and uses whichImage=1 for a's
    points, 2 for b's).
    Returns (...) mean error over keypoints with score_a*score_b >
    min_pair_score, or NaN when no keypoint qualifies.
    """
    l_in_b = epilines(F_ab, kps_a[..., :2], which=1)
    l_in_a = epilines(F_ab, kps_b[..., :2], which=2)
    homo_a = jnp.concatenate([kps_a[..., :2], jnp.ones_like(kps_a[..., :1])], axis=-1)
    homo_b = jnp.concatenate([kps_b[..., :2], jnp.ones_like(kps_b[..., :1])], axis=-1)
    d_ab = jnp.abs(jnp.sum(l_in_b * homo_b, axis=-1))
    d_ba = jnp.abs(jnp.sum(l_in_a * homo_a, axis=-1))
    per_kp = 0.5 * (d_ab + d_ba)
    valid = (kps_a[..., 2] * kps_b[..., 2]) > min_pair_score
    cnt = valid.sum(axis=-1)
    total = jnp.where(valid, per_kp, 0.0).sum(axis=-1)
    return jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), jnp.nan)


# --------------------------------------------------------------------------
# projection / reprojection
# --------------------------------------------------------------------------

@high_precision
def project_points(P: Array, pts_3d: Array, eps: float = 0.0) -> Array:
    """(..., 3, 4) x (..., N, 3) -> (..., N, 2) pinhole projection
    (ref:src/mv_math_util.py:243-264)."""
    homo = jnp.concatenate([pts_3d, jnp.ones_like(pts_3d[..., :1])], axis=-1)
    uvw = jnp.einsum("...ab,...nb->...na", P, homo)
    return uvw[..., :2] / (uvw[..., 2:3] + eps)


@high_precision
def masked_reprojection_error(
    pts_3d: Array, scores_3d: Array, kps_2d: Array, P: Array,
    min_pair_score: float, eps: float = 1e-5,
) -> Array:
    """Mean pixel reprojection error over score-valid keypoints
    (ref:src/motion_capture.py:403-414): NaN if no keypoint has
    score_3d*score_2d > min_pair_score.

    pts_3d: (..., K, 3), scores_3d: (..., K), kps_2d: (..., K, 3), P: (..., 3, 4).
    """
    reproj = project_points(P, pts_3d, eps=eps)
    d = jnp.linalg.norm(reproj - kps_2d[..., :2], axis=-1)
    valid = (scores_3d * kps_2d[..., 2]) > min_pair_score
    cnt = valid.sum(axis=-1)
    total = jnp.where(valid, d, 0.0).sum(axis=-1)
    return jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), jnp.nan)


@high_precision
def unproject_to_rays(kps_2d: Array, Kr_inv: Array) -> Array:
    """Pixel -> unit world-space ray directions (ref:src/mv_math_util.py:11-21).
    kps_2d: (..., 2); Kr_inv: (..., 3, 3)."""
    homo = jnp.concatenate([kps_2d, jnp.ones_like(kps_2d[..., :1])], axis=-1)
    rays = jnp.einsum("...ab,...b->...a", Kr_inv, homo)
    return rays / (jnp.linalg.norm(rays, axis=-1, keepdims=True) + 1e-12)


def point_to_ray_distance(points: Array, origins: Array, rays: Array) -> Array:
    """Distance of 3D `points` to rays (origin, unit direction)
    (ref:src/mv_math_util.py:24-32)."""
    return jnp.linalg.norm(jnp.cross(points - origins, rays), axis=-1)
