"""Similarity-matrix assembly vs an independent numpy oracle.

The oracle re-derives the reference's spatial-time matrix semantics
(nan-sentinels, masked max+1 replacement, (d-15)/30 sigmoid, 1e-3 floor;
ref:src/motion_capture.py:634-756) with plain python loops over a small
random scene, and the batched masked implementation must agree entry-wise.
"""
import numpy as np
import jax.numpy as jnp

from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
from multiview_motion_capture_tpu.tracker import (
    B18_COCO_OBS_IDX,
    B18_COCO_SKEL_IDX,
    TrackerContext,
    TrackerState,
    _spatial_similarity,
    _spatial_time_similarity,
)
from multiview_motion_capture_tpu.cameras import (
    pairwise_fundamental_det_np,
    pairwise_fundamental_np,
)


def _np_epi_error(kps_a, kps_b, F_ab, gate):
    ha = np.concatenate([kps_a[:, :2], np.ones((len(kps_a), 1))], 1)
    hb = np.concatenate([kps_b[:, :2], np.ones((len(kps_b), 1))], 1)

    def nl(L):
        return L / (np.linalg.norm(L[:, :2], axis=1, keepdims=True) + 1e-12)

    d = 0.5 * (np.abs(np.sum(nl(ha @ F_ab.T) * hb, 1)) +
               np.abs(np.sum(nl(hb @ F_ab) * ha, 1)))
    v = (kps_a[:, 2] * kps_b[:, 2]) > gate
    return float(d[v].mean()) if v.any() else np.nan


def _np_reproj_error(X, s3, kps2d, P, gate):
    homo = np.concatenate([X, np.ones((len(X), 1))], 1)
    uvw = homo @ P.T
    uv = uvw[:, :2] / (1e-5 + uvw[:, 2:3])
    d = np.linalg.norm(uv - kps2d[:, :2], axis=1)
    v = (s3 * kps2d[:, 2]) > gate
    return float(d[v].mean()) if v.any() else np.nan


def test_spatial_time_matrix_matches_oracle():
    cfg = PipelineConfig(n_views=3, max_people=4, max_tracks=3)
    seq = synthetic_sequence(n_frames=1, n_people=2, n_views=3, cfg=cfg,
                             drop_prob=0.0, seed=5)
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=True)
    kps = jnp.asarray(seq.batch.kps[0])
    det_valid = jnp.asarray(seq.batch.valid[0])

    # state with 2 live tracks at the GT poses (18-joint layout)
    rng = np.random.RandomState(0)
    state = TrackerState.zeros(cfg)
    pose3d = np.zeros((3, 18, 3), dtype=np.float32)
    pose3d[0, B18_COCO_SKEL_IDX] = seq.gt_3d[0, 0][[c for c in np.asarray(B18_COCO_OBS_IDX)]]
    pose3d[1, B18_COCO_SKEL_IDX] = seq.gt_3d[0, 1][[c for c in np.asarray(B18_COCO_OBS_IDX)]] + 0.05
    state = state.replace(
        active=jnp.asarray([2, 1, 0], jnp.int32),
        pose3d=jnp.asarray(pose3d),
        pose3d_score=jnp.ones((3, 18)),
    )

    sim, elem_valid, _d23 = _spatial_time_similarity(ctx, state, kps, det_valid)
    sim = np.asarray(sim)
    elem_valid = np.asarray(elem_valid)

    # ---- numpy oracle over the same layout ----
    T, V, P = 3, 3, 4
    N = T + V * P
    F_det = pairwise_fundamental_det_np(np.asarray(seq.cameras.P))
    Pmats = np.asarray(seq.cameras.P, dtype=np.float64)
    kps_np = seq.batch.kps[0]
    valid_np = seq.batch.valid[0]
    active = [True, True, False]

    dst = np.full((N, N), np.nan)
    def elem(i):
        if i < T:
            return ("3d", i)
        v, p = divmod(i - T, P)
        return ("2d", (v, p))

    valid_elem = np.zeros(N, bool)
    for i in range(N):
        k, x = elem(i)
        valid_elem[i] = active[x] if k == "3d" else valid_np[x]

    for i in range(N):
        for j in range(N):
            ki, xi = elem(i)
            kj, xj = elem(j)
            if i == j:
                dst[i, j] = 0.0
                continue
            if not (valid_elem[i] and valid_elem[j]):
                continue
            if ki == "2d" and kj == "2d":
                (vi, pi), (vj, pj) = xi, xj
                if vi == vj:
                    continue
                dst[i, j] = _np_epi_error(kps_np[vi, pi], kps_np[vj, pj],
                                          F_det[vi, vj], 0.1)
            elif ki == "2d" and kj == "3d":
                (vi, pi) = xi
                X = pose3d[xj][np.asarray(B18_COCO_SKEL_IDX)]
                obs = kps_np[vi, pi][np.asarray(B18_COCO_OBS_IDX)]
                dst[i, j] = _np_reproj_error(X, np.ones(15), obs, Pmats[vi], 0.1)
            elif ki == "3d" and kj == "2d":
                (vj, pj) = xj
                X = pose3d[xi][np.asarray(B18_COCO_SKEL_IDX)]
                obs = kps_np[vj, pj][np.asarray(B18_COCO_OBS_IDX)]
                dst[i, j] = _np_reproj_error(X, np.ones(15), obs, Pmats[vj], 0.1)
            # 3d-3d: stays nan

    # for invalid elements the oracle leaves nan; those rows must be sim 0
    both_valid = valid_elem[:, None] & valid_elem[None, :]
    finite = both_valid & ~np.isnan(dst)
    maxv = dst[finite].max()
    dstf = np.where(np.isnan(dst), maxv + 1.0, dst)
    s = 1.0 / (1.0 + np.exp(5 * (dstf - 15.0) / 30.0))
    s[s < 1e-3] = 0.0
    s = np.minimum(s, 1.0)
    s[~both_valid] = 0.0

    np.testing.assert_array_equal(elem_valid, valid_elem)
    np.testing.assert_allclose(sim, s, atol=2e-3)


def test_spatial_matrix_matches_oracle():
    cfg = PipelineConfig(n_views=3, max_people=4, max_tracks=3)
    seq = synthetic_sequence(n_frames=1, n_people=2, n_views=3, cfg=cfg,
                             drop_prob=0.0, seed=6)
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=True)
    sim, elem_valid = _spatial_similarity(
        ctx, jnp.asarray(seq.batch.kps[0]), jnp.asarray(seq.batch.valid[0]))
    sim = np.asarray(sim)

    F_sp = pairwise_fundamental_np(np.asarray(seq.cameras.K),
                                   np.asarray(seq.cameras.Rt))
    kps_np = seq.batch.kps[0]
    valid_np = seq.batch.valid[0]
    T, V, P = 3, 3, 4
    n2 = V * P
    dst = np.full((n2, n2), 50.0)

    def mean_epidist(a, F, b):
        ha = np.concatenate([a[:, :2], np.ones((len(a), 1))], 1)
        hb = np.concatenate([b[:, :2], np.ones((len(b), 1))], 1)
        L = ha @ F  # lines = F^T x_a (reference whichImage=2 usage)
        L = L / (np.linalg.norm(L[:, :2], axis=1, keepdims=True) + 1e-12)
        return np.abs(np.sum(L * hb, 1)).mean()

    for i in range(n2):
        for j in range(n2):
            vi, pi = divmod(i, P)
            vj, pj = divmod(j, P)
            if i == j:
                dst[i, j] = 0.0
            elif vi != vj and valid_np[vi, pi] and valid_np[vj, pj]:
                dst[i, j] = 0.5 * (
                    mean_epidist(kps_np[vi, pi], F_sp[vi, vj], kps_np[vj, pj])
                    + mean_epidist(kps_np[vj, pj], F_sp[vj, vi], kps_np[vi, pi])
                )
    dv = valid_np.reshape(-1)
    both = dv[:, None] & dv[None, :]
    mean = dst[both].mean()
    std = dst[both].std()
    s = 1.0 / (1.0 + np.exp(5 * (dst - mean) / std))
    s[~both] = 0.0

    np.testing.assert_allclose(sim[T:, T:], s, atol=2e-3)
    assert not np.asarray(elem_valid)[:T].any()
