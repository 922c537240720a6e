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
    # anthropometric ground truth (person_scale_std / bone_jitter_std > 0):
    gt_person_scale: np.ndarray = None   # (N_people,) global height factor
    gt_bone_factors: np.ndarray = None   # (N_people, 10) mirror-shared
                                         # per-bone-group length factors


# COCO-17 kinematic tree used for anthropometric variation.  Virtual joints:
# 17 = mid-hip (root), 18 = mid-shoulder.  Bone GROUPS are mirror-shared
# (one factor per left/right pair), mirroring the IK's 11 side-shared bone
# lengths (ops/fk.py) so the re-ID's bone-length discriminator sees the
# same kind of identity signal real skeletons carry.
_COCO_PARENT = {18: 17, 11: 17, 12: 17, 13: 11, 14: 12, 15: 13, 16: 14,
                5: 18, 6: 18, 7: 5, 8: 6, 9: 7, 10: 8,
                0: 18, 1: 0, 2: 0, 3: 0, 4: 0}
_COCO_BUILD_ORDER = (18, 11, 12, 13, 14, 15, 16, 5, 6, 7, 8, 9, 10,
                     0, 1, 2, 3, 4)
_BONE_GROUP = {18: 0,              # torso (mid-hip -> mid-shoulder)
               11: 1, 12: 1,       # pelvis half-width
               13: 2, 14: 2,       # upper leg
               15: 3, 16: 3,       # lower leg
               5: 4, 6: 4,         # clavicle
               7: 5, 8: 5,         # upper arm
               9: 6, 10: 6,        # forearm
               0: 7,               # neck/head
               1: 8, 2: 8,         # eyes
               3: 9, 4: 9}         # ears
N_BONE_GROUPS = 10


def _varied_skeleton(person_scale: float, bone_factors: np.ndarray) -> np.ndarray:
    """Rebuild the canonical COCO skeleton with per-bone-group length
    factors (and a global scale), feet re-grounded at the canonical ankle
    height.  All factors 1 reproduces `_CANONICAL_COCO` up to fp roundoff —
    callers skip this entirely for the unvaried (bit-exact) path."""
    base = np.concatenate([
        _CANONICAL_COCO,
        [0.5 * (_CANONICAL_COCO[11] + _CANONICAL_COCO[12])],   # 17 mid-hip
        [0.5 * (_CANONICAL_COCO[5] + _CANONICAL_COCO[6])],     # 18 mid-shldr
    ])
    pos = np.zeros_like(base)
    pos[17] = base[17]
    for j in _COCO_BUILD_ORDER:
        p = _COCO_PARENT[j]
        f = person_scale * bone_factors[_BONE_GROUP[j]]
        pos[j] = pos[p] + (base[j] - base[p]) * f
    # stand on the ground: ankles back at the canonical height
    pos[:, 2] += _CANONICAL_COCO[15:17, 2].min() - pos[15:17, 2].min()
    return pos[:17]


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
    person_scale_std: float = 0.0,
    bone_jitter_std: float = 0.0,
) -> SyntheticSequence:
    """`min_person_distance` > 0 rejection-samples start positions until all
    pairwise distances exceed it (image-space detection demos need people
    that don't permanently occlude each other).

    `person_scale_std` / `bone_jitter_std` > 0 gives every person their OWN
    skeleton — a global height factor ~N(1, person_scale_std^2) and
    mirror-shared per-bone-group factors ~N(1, bone_jitter_std^2) (clipped
    to [0.75, 1.3]), recorded in `gt_person_scale` / `gt_bone_factors`.
    Default 0 keeps the shared `_CANONICAL_COCO` skeleton BIT-IDENTICAL to
    the historical generator (variation draws come from a separate RNG so
    walks/noise/occlusion are unchanged either way).  Anthropometric
    variation is what makes bone-length identity evidence measurable: with
    a shared skeleton every identity study is trajectory-only by
    construction (VERDICT r3 weak #3)."""
    cfg = cfg or PipelineConfig(n_views=n_views)
    rng = np.random.RandomState(seed)
    cams = synthetic_camera_ring(n_views)
    Ps = np.asarray(cams.P, dtype=np.float64)

    varied = person_scale_std > 0 or bone_jitter_std > 0
    gt_person_scale = gt_bone_factors = None
    skeletons = None
    if varied:
        rng_anthro = np.random.RandomState(seed + 7919)
        gt_person_scale = np.clip(
            1.0 + person_scale_std * rng_anthro.randn(n_people), 0.75, 1.3)
        gt_bone_factors = np.clip(
            1.0 + bone_jitter_std * rng_anthro.randn(n_people, N_BONE_GROUPS),
            0.75, 1.3)
        skeletons = np.stack([
            _varied_skeleton(gt_person_scale[p], gt_bone_factors[p])
            for p in range(n_people)
        ])

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
            base = (skeletons[p] if varied else _CANONICAL_COCO).copy()
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
        gt_person_scale=gt_person_scale,
        gt_bone_factors=gt_bone_factors,
    )


def synthetic_appearance(
    seq: SyntheticSequence,
    dim: int = 16,
    noise: float = 0.25,
    seed: int = 0,
    shared_frac: float = 0.0,
) -> np.ndarray:
    """Idealized per-detection appearance embeddings for association studies.

    Each ground-truth person gets a random unit identity vector; each valid
    detection slot gets `unit(identity + noise * randn)`.  This is an ORACLE
    embedding — it measures what the tracker's appearance term can recover
    given embeddings of a stated quality, independent of any particular
    extractor (the production extractor is the PoseNet trunk feature path,
    data.detect).  `noise` controls quality: 0.25 keeps same-person cosine
    similarity ~0.97, cross-person ~0 in expectation.

    `shared_frac` mixes a COMMON component into every identity
    (emulating real extractors whose embeddings share domain structure —
    the keypoint-color-layout descriptor measures cross-person cos ~0.83,
    docs/PERF.md r4; shared_frac~0.83 reproduces that): identity_p =
    unit(sqrt(f) * shared + sqrt(1-f) * unique_p).  0 = fully distinct
    identities (cross-person cos ~0).

    Returns (F, V, P, dim) float32, zero rows for empty slots.
    """
    rng = np.random.RandomState(seed + 104729)
    F, V, P = seq.gt_slot_person.shape
    n_people = seq.gt_3d.shape[1]
    ident = rng.randn(n_people, dim)
    ident /= np.linalg.norm(ident, axis=1, keepdims=True)
    if shared_frac > 0:
        shared = rng.randn(dim)
        shared /= np.linalg.norm(shared)
        ident = (np.sqrt(shared_frac) * shared[None]
                 + np.sqrt(1.0 - shared_frac) * ident)
        ident /= np.linalg.norm(ident, axis=1, keepdims=True)
    app = np.zeros((F, V, P, dim), dtype=np.float32)
    person = seq.gt_slot_person  # (F, V, P)
    ok = person >= 0
    vecs = ident[np.clip(person, 0, None)] + noise * rng.randn(F, V, P, dim)
    vecs /= np.maximum(np.linalg.norm(vecs, axis=-1, keepdims=True), 1e-9)
    app[ok] = vecs[ok].astype(np.float32)
    return app
