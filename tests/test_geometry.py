"""Geometry kernels vs independent numpy oracles.

The oracles implement the textbook formulas (Hartley & Zisserman) directly
in numpy float64 — they are written from the math, not ported code — and the
batched JAX kernels must agree.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from multiview_motion_capture_tpu.cameras import CameraBank, synthetic_camera_ring
from multiview_motion_capture_tpu.ops import geometry as G
from multiview_motion_capture_tpu.ops.triangulate import triangulate_points


@pytest.fixture(scope="module")
def cams():
    return synthetic_camera_ring(4)


def _np_fundamental_det(p1, p2):
    """Minor-based F construction (H&Z 9.2.2), float64 oracle."""
    f = np.zeros((3, 3))
    cyc = [(1, 2), (2, 0), (0, 1)]
    for i in range(3):
        for j in range(3):
            rows = np.vstack([p1[list(cyc[j])], p2[list(cyc[i])]])
            f[i, j] = np.linalg.det(rows)
    return f


def _project(P, X):
    Xh = np.concatenate([X, np.ones((len(X), 1))], axis=1)
    uvw = Xh @ P.T
    return uvw[:, :2] / uvw[:, 2:3]


def test_fundamental_from_projections_epipolar_constraint(cams):
    P = np.asarray(cams.P, dtype=np.float64)
    F = np.asarray(G.fundamental_from_projections(jnp.asarray(P[0]), jnp.asarray(P[1])))
    # against float64 oracle
    F64 = _np_fundamental_det(P[0], P[1])
    np.testing.assert_allclose(F / np.linalg.norm(F), F64 / np.linalg.norm(F64), atol=1e-4)
    # epipolar constraint x2^T F x1 ~ 0 for corresponding projections
    rng = np.random.RandomState(0)
    X = rng.uniform(-1, 1, size=(20, 3)) + np.array([0, 0, 1.0])
    x1 = _project(P[0], X)
    x2 = _project(P[1], X)
    x1h = np.concatenate([x1, np.ones((20, 1))], axis=1)
    x2h = np.concatenate([x2, np.ones((20, 1))], axis=1)
    Fn = F64 / np.linalg.norm(F64)
    vals = np.abs(np.einsum("ni,ij,nj->n", x2h, Fn, x1h))
    assert vals.max() < 1e-6  # convention: lines for image-1 points live in image 2


def _np_fundamental_skew(K0, R0, t0, K1, R1, t1):
    """Skew/relative-pose F construction, float64 oracle."""

    def skew(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    Rrel = R0 @ R1.T
    e = K1 @ R1 @ R0.T @ (t0 - Rrel @ t1)
    return np.linalg.inv(K0).T @ Rrel @ K1.T @ skew(e)


def test_pairwise_fundamental_consistency(cams):
    """The host-precomputed f64 F tensors match independent oracles, and the
    epipolar point-line distances of true correspondences are sub-pixel even
    when the lines are evaluated in f32 on device."""
    from multiview_motion_capture_tpu.cameras import (
        pairwise_fundamental_np,
        pairwise_fundamental_det_np,
    )

    K = np.asarray(cams.K, dtype=np.float64)
    Rt = np.asarray(cams.Rt, dtype=np.float64)
    P = np.asarray(cams.P, dtype=np.float64)
    F = pairwise_fundamental_np(K, Rt)
    F_det = pairwise_fundamental_det_np(P)
    # the f32 device version agrees with the f64 host version up to f32 noise
    F_dev = np.asarray(G.pairwise_fundamental_mats(cams.K, cams.Rt))
    rng = np.random.RandomState(1)
    X = rng.uniform(-1, 1, size=(10, 3)) + np.array([0, 0, 1.0])
    for i in range(3):
        for j in range(3):
            if i == j:
                continue
            F64 = _np_fundamental_skew(
                K[i], Rt[i, :, :3], Rt[i, :, 3], K[j], Rt[j, :, :3], Rt[j, :, 3]
            )
            a = F[i, j]
            b = F64 / np.linalg.norm(F64)
            if np.sum(a * b) < 0:
                b = -b
            np.testing.assert_allclose(a, b, atol=1e-10)
            d = F_dev[i, j] / np.linalg.norm(F_dev[i, j])
            if np.sum(a * d) < 0:
                d = -d
            np.testing.assert_allclose(a, d, atol=5e-4)
            # distances of true correspondences via f32 line evaluation
            xi = _project(P[i], X)
            xj = _project(P[j], X)
            xjh = np.concatenate([xj, np.ones((10, 1))], axis=1).astype(np.float32)
            for Fmat, which in ((F[i, j], 2), (F_det[i, j], 1)):
                lines = np.asarray(
                    G.epilines(jnp.asarray(Fmat, dtype=jnp.float32),
                               jnp.asarray(xi, dtype=jnp.float32), which=which)
                )
                dist = np.abs(np.sum(lines * xjh, axis=-1))
                assert dist.max() < 0.05, (which, dist.max())


def test_projected_distance_all_pairs_zero_for_true_matches(cams):
    V = cams.n_views
    K = 17
    rng = np.random.RandomState(2)
    X = rng.uniform(-0.5, 0.5, size=(K, 3)) + np.array([0, 0, 1.2])
    P = np.asarray(cams.P, dtype=np.float64)
    kps = np.zeros((V, 2, K, 3), dtype=np.float32)
    for v in range(V):
        kps[v, 0, :, :2] = _project(P[v], X)
        kps[v, 1, :, :2] = _project(P[v], X + np.array([1.0, 0.4, 0.0]))
        kps[v, :, :, 2] = 1.0
    F = G.pairwise_fundamental_mats(cams.K, cams.Rt)
    d = np.asarray(G.projected_distance_all_pairs(jnp.asarray(kps), F))
    assert d.shape == (V, 2, V, 2)
    for a in range(V):
        for b in range(V):
            if a == b:
                continue
            # matching person pairs have (near) zero epipolar distance
            assert d[a, 0, b, 0] < 0.2
            assert d[a, 1, b, 1] < 0.2
            # mismatched pairs are clearly separated
            assert d[a, 0, b, 1] > 5 * max(d[a, 0, b, 0], 1e-3)
    # symmetry of the block structure
    np.testing.assert_allclose(d, np.transpose(d, (2, 3, 0, 1)), atol=1e-3)


def test_masked_symmetric_epipolar_error(cams):
    P = np.asarray(cams.P, dtype=np.float64)
    rng = np.random.RandomState(3)
    X = rng.uniform(-0.5, 0.5, size=(17, 3)) + np.array([0, 0, 1.2])
    a = np.zeros((17, 3), dtype=np.float32)
    b = np.zeros((17, 3), dtype=np.float32)
    a[:, :2] = _project(P[0], X)
    b[:, :2] = _project(P[1], X)
    a[:, 2] = b[:, 2] = 0.9
    F = G.fundamental_from_projections(jnp.asarray(P[0]), jnp.asarray(P[1]))
    err = float(G.masked_symmetric_epipolar_error(jnp.asarray(a), jnp.asarray(b), F, 0.1))
    assert err < 0.1
    # all scores below gate -> NaN (the reference's invalid sentinel)
    a0 = a.copy()
    a0[:, 2] = 0.0
    err_nan = float(G.masked_symmetric_epipolar_error(jnp.asarray(a0), jnp.asarray(b), F, 0.1))
    assert np.isnan(err_nan)


def test_reprojection_error(cams):
    P = np.asarray(cams.P, dtype=np.float64)
    rng = np.random.RandomState(4)
    X = rng.uniform(-0.5, 0.5, size=(17, 3)) + np.array([0, 0, 1.2])
    kps = np.zeros((17, 3), dtype=np.float32)
    kps[:, :2] = _project(P[0], X) + 2.0  # constant 2px offset in x and y
    kps[:, 2] = 1.0
    err = float(
        G.masked_reprojection_error(
            jnp.asarray(X, dtype=jnp.float32), jnp.ones(17), jnp.asarray(kps),
            cams.P[0], 0.05,
        )
    )
    np.testing.assert_allclose(err, np.sqrt(8.0), rtol=1e-3)


def test_triangulation_recovers_points(cams):
    V = cams.n_views
    rng = np.random.RandomState(5)
    X = rng.uniform(-0.5, 0.5, size=(17, 3)) + np.array([0, 0, 1.2])
    P = np.asarray(cams.P, dtype=np.float64)
    kps = np.zeros((V, 17, 3), dtype=np.float32)
    for v in range(V):
        kps[v, :, :2] = _project(P[v], X) + rng.normal(0, 0.5, size=(17, 2))
        kps[v, :, 2] = 0.9
    K_inv = jnp.linalg.inv(cams.K)
    out = np.asarray(
        triangulate_points(cams.P, K_inv, jnp.asarray(kps), jnp.ones(V, dtype=bool), 0.01)
    )
    assert out.shape == (17, 4)
    err = np.linalg.norm(out[:, :3] - X, axis=-1)
    assert err.max() < 0.01  # sub-cm with 0.5px noise and 4 cams
    np.testing.assert_allclose(out[:, 3], 0.9, atol=1e-5)


def test_triangulation_score_fallback(cams):
    """Keypoints with < 2 views above min_score fall back to all masked views
    (ref:src/mv_math_util.py:175-179)."""
    V = cams.n_views
    rng = np.random.RandomState(6)
    X = rng.uniform(-0.5, 0.5, size=(5, 3)) + np.array([0, 0, 1.2])
    P = np.asarray(cams.P, dtype=np.float64)
    kps = np.zeros((V, 5, 3), dtype=np.float32)
    for v in range(V):
        kps[v, :, :2] = _project(P[v], X)
        kps[v, :, 2] = 0.001  # below min_score
    out = np.asarray(
        triangulate_points(cams.P, jnp.linalg.inv(cams.K), jnp.asarray(kps),
                           jnp.ones(V, dtype=bool), 0.01)
    )
    err = np.linalg.norm(out[:, :3] - X, axis=-1)
    assert err.max() < 0.01
    np.testing.assert_allclose(out[:, 3], 0.001, atol=1e-6)


def test_triangulation_view_mask(cams):
    """Masked-out views must not influence the solution."""
    V = cams.n_views
    rng = np.random.RandomState(7)
    X = rng.uniform(-0.5, 0.5, size=(5, 3)) + np.array([0, 0, 1.2])
    P = np.asarray(cams.P, dtype=np.float64)
    kps = np.zeros((V, 5, 3), dtype=np.float32)
    for v in range(V):
        kps[v, :, :2] = _project(P[v], X)
        kps[v, :, 2] = 0.9
    kps[0, :, :2] += 500.0  # corrupt view 0
    mask = np.ones(V, dtype=bool)
    mask[0] = False
    out = np.asarray(
        triangulate_points(cams.P, jnp.linalg.inv(cams.K), jnp.asarray(kps),
                           jnp.asarray(mask), 0.01)
    )
    err = np.linalg.norm(out[:, :3] - X, axis=-1)
    assert err.max() < 0.01
