"""Synthetic multi-view sequences for tests and scaled benchmarks.

Generates plausible articulated 17-keypoint "people" moving through the
capture volume, projects them through a synthetic camera ring, and packs
them as a FrameBatch — the Panoptic-style 10+cam / 10+people stress config
of BASELINE.md (config 4).  Ground-truth 3D and identities are returned for
association/triangulation accuracy tests.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from multiview_motion_capture_tpu.cameras import CameraBank, synthetic_camera_ring
from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.ingest import FrameBatch

# A canonical standing COCO-17 skeleton (x right, y forward, z up; meters).
_CANONICAL_COCO = np.array([
    [0.00, 0.00, 1.70],   # nose
    [0.03, -0.03, 1.73],  # l eye
    [-0.03, -0.03, 1.73], # r eye
    [0.07, -0.06, 1.70],  # l ear
    [-0.07, -0.06, 1.70], # r ear
    [0.18, 0.00, 1.45],   # l shoulder
    [-0.18, 0.00, 1.45],  # r shoulder
    [0.25, 0.02, 1.20],   # l elbow
    [-0.25, 0.02, 1.20],  # r elbow
    [0.27, 0.05, 0.95],   # l wrist
    [-0.27, 0.05, 0.95],  # r wrist
    [0.10, 0.00, 0.95],   # l hip
    [-0.10, 0.00, 0.95],  # r hip
    [0.12, 0.03, 0.50],   # l knee
    [-0.12, 0.03, 0.50],  # r knee
    [0.13, 0.00, 0.05],   # l ankle
    [-0.13, 0.00, 0.05],  # r ankle
], dtype=np.float64)


@dataclasses.dataclass
class SyntheticSequence:
    batch: FrameBatch           # packed detections (with noise/occlusion)
    cameras: CameraBank
    gt_3d: np.ndarray           # (F, N_people, 17, 3) world coordinates
    gt_slot_person: np.ndarray  # (F, V, P) int, person id of each slot or -1


def _project(P: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """(3,4) @ (N,3) -> (N,2)."""
    homo = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
    uvw = homo @ P.T
    return uvw[:, :2] / uvw[:, 2:3]


def synthetic_sequence(
    n_frames: int = 20,
    n_people: int = 3,
    n_views: int = 5,
    cfg: PipelineConfig = None,
    noise_px: float = 1.0,
    drop_prob: float = 0.05,
    seed: int = 0,
    shuffle_slots: bool = True,
    min_person_distance: float = 0.0,
) -> SyntheticSequence:
    """`min_person_distance` > 0 rejection-samples start positions until all
    pairwise distances exceed it (image-space detection demos need people
    that don't permanently occlude each other)."""
    cfg = cfg or PipelineConfig(n_views=n_views)
    rng = np.random.RandomState(seed)
    cams = synthetic_camera_ring(n_views)
    Ps = np.asarray(cams.P, dtype=np.float64)

    # random smooth walks + limb jitter
    starts = rng.uniform(-1.5, 1.5, size=(n_people, 2))
    if min_person_distance > 0:
        for _ in range(1000):
            d = np.linalg.norm(starts[:, None] - starts[None, :], axis=-1)
            d[np.diag_indices(n_people)] = np.inf
            if d.min() >= min_person_distance:
                break
            starts = rng.uniform(-1.5, 1.5, size=(n_people, 2))
    vels = rng.uniform(-0.03, 0.03, size=(n_people, 2))
    phases = rng.uniform(0, 2 * np.pi, size=(n_people,))

    F, V, P, K = n_frames, n_views, cfg.max_people, 17
    gt_3d = np.zeros((F, n_people, K, 3))
    kps = np.zeros((F, V, P, K, 3), dtype=np.float32)
    valid = np.zeros((F, V, P), dtype=bool)
    slot_person = np.full((F, V, P), -1, dtype=np.int32)

    for f in range(F):
        for p in range(n_people):
            base = _CANONICAL_COCO.copy()
            # limb sway so poses aren't rigid
            sway = 0.05 * np.sin(0.3 * f + phases[p])
            base[[7, 9], 1] += sway
            base[[8, 10], 1] -= sway
            base[[13, 15], 1] += 0.08 * np.sin(0.5 * f + phases[p])
            base[[14, 16], 1] -= 0.08 * np.sin(0.5 * f + phases[p])
            ang = 0.2 * f * vels[p, 0]
            rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                            [np.sin(ang), np.cos(ang), 0],
                            [0, 0, 1.0]])
            # bounded walk: reflect at +-2.2 m so long sequences keep people
            # inside the camera ring's shared view (an unbounded f*vel drift
            # walks everyone out of frame by ~100 frames, which turns long
            # benchmarks into out-of-view churn instead of tracking).
            # Triangle-wave reflection; identity while |x| <= 2.2, so short
            # (<= 20-frame) sequences are bit-identical to the old walk.
            B = 2.2
            raw = starts[p] + f * vels[p]
            pos = B - np.abs(np.mod(raw + B, 4 * B) - 2 * B)
            pts = base @ rot.T
            pts[:, 0] += pos[0]
            pts[:, 1] += pos[1]
            gt_3d[f, p] = pts

        for v in range(V):
            order = rng.permutation(n_people) if shuffle_slots else np.arange(n_people)
            slot = 0
            for p in order:
                if slot >= P:
                    break
                if rng.rand() < drop_prob:
                    continue  # occluded in this view
                uv = _project(Ps[v], gt_3d[f, p])
                uv = uv + rng.normal(0, noise_px, size=uv.shape)
                score = np.clip(rng.uniform(0.55, 0.95, size=(K, 1)), 0, 1)
                kps[f, v, slot, :, :2] = uv
                kps[f, v, slot, :, 2:] = score
                valid[f, v, slot] = True
                slot_person[f, v, slot] = p
                slot += 1

    return SyntheticSequence(
        batch=FrameBatch(kps=kps, valid=valid),
        cameras=cams,
        gt_3d=gt_3d,
        gt_slot_person=slot_person,
    )
