"""Alternate matcher paths: SVT (device), spectral (host), BIP (closed form),
greedy seeded association, ray association, native runtime parity."""
import numpy as np
import jax.numpy as jnp
import pytest

from multiview_motion_capture_tpu.ops import association as A
from multiview_motion_capture_tpu.ops import association_alt as ALT
from multiview_motion_capture_tpu.ops.greedy import (
    GreedyGroup,
    match_greedy,
    tracklet_ray_association,
)
from multiview_motion_capture_tpu.cameras import (
    pairwise_fundamental_det_np,
    synthetic_camera_ring,
)
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
from multiview_motion_capture_tpu.config import PipelineConfig


def _make_similarity(groups, sizes, hi=0.9, lo=0.05, seed=0):
    rng = np.random.RandomState(seed)
    n = len(groups)
    W = np.zeros((n, n), dtype=np.float32)
    cam_of = np.concatenate([[c] * s for c, s in enumerate(sizes)])
    for i in range(n):
        for j in range(n):
            if i == j or cam_of[i] == cam_of[j]:
                continue
            base = hi if groups[i] == groups[j] else lo
            W[i, j] = np.clip(base + rng.uniform(-0.04, 0.04), 0, 1)
    return 0.5 * (W + W.T)


SIZES = (3, 3, 2, 3)
GROUPS = [0, 1, 2, 1, 0, 2, 0, 1, 2, 0, 1]


def test_match_svt_recovers_groups():
    W = _make_similarity(GROUPS, SIZES)
    mask = A.block_diag_mask(SIZES)
    x_bin, n_iters = ALT.match_svt(jnp.asarray(W), jnp.asarray(mask), SIZES)
    g = A.extract_groups(jnp.asarray(np.asarray(x_bin)), jnp.ones(len(GROUPS), dtype=bool))
    rep = np.asarray(g.rep)
    for i in range(len(GROUPS)):
        for j in range(len(GROUPS)):
            assert (rep[i] == rep[j]) == (GROUPS[i] == GROUPS[j]), (i, j)


def test_doubly_stochastic_projection():
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(6, 6).astype(np.float32) * 2)
    P = np.asarray(ALT.doubly_stochastic_projection(X))
    assert (P >= -1e-5).all()
    assert (P.sum(axis=1) <= 1.0 + 1e-3).all()
    assert (P.sum(axis=0) <= 1.0 + 1e-3).all()


def test_match_eig_recovers_groups():
    W = _make_similarity(GROUPS, SIZES)
    x_bin = ALT.match_eig_np(W, SIZES)
    g = A.extract_groups(jnp.asarray(x_bin), jnp.ones(len(GROUPS), dtype=bool))
    rep = np.asarray(g.rep)
    for i in range(len(GROUPS)):
        for j in range(len(GROUPS)):
            assert (rep[i] == rep[j]) == (GROUPS[i] == GROUPS[j]), (i, j)


def test_match_bip():
    W = _make_similarity(GROUPS, SIZES)
    x = ALT.match_bip(W)
    for i in range(len(GROUPS)):
        for j in range(len(GROUPS)):
            if i == j:
                continue
            expect = W[i, j] > 0.5
            assert x[i, j] == expect


def test_greedy_association_on_synthetic():
    cfg = PipelineConfig(n_views=4, max_people=6)
    seq = synthetic_sequence(n_frames=1, n_people=3, n_views=4, cfg=cfg,
                             drop_prob=0.0, seed=2)
    F_det = pairwise_fundamental_det_np(np.asarray(seq.cameras.P))
    groups = match_greedy(seq.batch.kps[0], seq.batch.valid[0], F_det,
                          match_threshold=50.0)
    full = [g for g in groups if len(g.views) == 4]
    assert len(full) == 3
    # each full group is identity-consistent
    for g in full:
        pids = {seq.gt_slot_person[0, v, p] for v, p in zip(g.views, g.dets)}
        assert len(pids) == 1


def test_tracklet_ray_association():
    cams = synthetic_camera_ring(3)
    rng = np.random.RandomState(3)
    pts = rng.uniform(-0.5, 0.5, (2, 5, 3)) + np.array([0, 0, 1.2])
    P0 = np.asarray(cams.P[0], dtype=np.float64)

    def project(X):
        h = np.concatenate([X, np.ones((len(X), 1))], 1) @ P0.T
        return h[:, :2] / h[:, 2:3]

    det = np.zeros((2, 5, 3))
    det[0, :, :2] = project(pts[1])  # detection 0 <- track 1
    det[1, :, :2] = project(pts[0])  # detection 1 <- track 0
    det[..., 2] = 1.0
    matches = tracklet_ray_association(
        pts, np.ones((2, 5)), det,
        np.asarray(cams.Kr_inv[0]), np.asarray(cams.cam_loc[0]), max_dst=0.05,
    )
    assert sorted(matches) == [(0, 1), (1, 0)]
