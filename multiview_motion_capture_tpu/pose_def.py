"""Keypoint taxonomy and skeleton-format index tables.

All format relations are expressed as *static integer index arrays* so that
every conversion is a gather that can live inside a jitted function, instead
of dict-driven Python loops (ref:src/pose_def.py:262-298).

Formats (parity with ref:src/pose_def.py:54-58):
  COCO        17 keypoints  (OpenPose BODY_25 reduced; the detection format)
  OPENPOSE_25 25 keypoints  (raw OpenPose BODY_25 output)
  BASIC_18    18 joints     (the IK skeleton; ref:src/pose_def.py:183-228)
  COCO_SPINE  18 keypoints  (COCO + synthetic mid-spine appended; the IK
                             observation format, ref:src/inverse_kinematics.py:370-378)
"""
from __future__ import annotations

import enum
from typing import Dict, List, Tuple

import numpy as np


class KpsType(enum.IntEnum):
    """Canonical joint identities shared by every format."""

    Nose = 0
    L_Eye = 1
    R_Eye = 2
    L_Ear = 3
    R_Ear = 4
    Neck = 5
    L_Shoulder = 6
    R_Shoulder = 7
    L_Elbow = 8
    R_Elbow = 9
    L_Wrist = 10
    R_Wrist = 11
    L_Hip = 12
    R_Hip = 13
    Mid_Hip = 14
    L_Knee = 15
    R_Knee = 16
    L_Ankle = 17
    R_Ankle = 18
    Spine = 19
    L_BigToe = 20
    R_BigToe = 21
    L_SmallToe = 22
    R_SmallToe = 23
    L_Heel = 24
    R_Heel = 25
    # SMPL-X body joints (ref:src/pose_def.py:140-163)
    LowerBack = 26
    UpperBack = 27
    Chest = 28
    LowerNeck = 29
    UpperNeck = 30
    L_Clavicle = 31
    R_Clavicle = 32


class KpsFormat(enum.Enum):
    COCO = "coco"
    OPENPOSE_25 = "openpose_25"
    BASIC_18 = "basic_18"
    COCO_SPINE = "coco_spine"
    SMPLX_22 = "smplx_22"


T = KpsType

# COCO-17 order (matches the OpenPose->COCO reduction used by the reference
# pipeline, ref:src/pose_def.py:72-96).
COCO_ORDER: Tuple[KpsType, ...] = (
    T.Nose, T.L_Eye, T.R_Eye, T.L_Ear, T.R_Ear,
    T.L_Shoulder, T.R_Shoulder, T.L_Elbow, T.R_Elbow,
    T.L_Wrist, T.R_Wrist, T.L_Hip, T.R_Hip,
    T.L_Knee, T.R_Knee, T.L_Ankle, T.R_Ankle,
)

# OpenPose BODY_25 output order (ref:src/pose_def.py:111-137).
OPENPOSE_25_ORDER: Tuple[KpsType, ...] = (
    T.Nose, T.Neck, T.R_Shoulder, T.R_Elbow, T.R_Wrist,
    T.L_Shoulder, T.L_Elbow, T.L_Wrist, T.Mid_Hip,
    T.R_Hip, T.R_Knee, T.R_Ankle, T.L_Hip, T.L_Knee, T.L_Ankle,
    T.R_Eye, T.L_Eye, T.R_Ear, T.L_Ear,
    T.L_BigToe, T.L_SmallToe, T.L_Heel, T.R_BigToe, T.R_SmallToe, T.R_Heel,
)

# The 18-joint IK skeleton, topologically ordered (parent index < child
# index) so FK composes in a single forward sweep (ref:src/pose_def.py:183-228).
BASIC_18_ORDER: Tuple[KpsType, ...] = (
    T.Mid_Hip,
    T.L_Hip, T.L_Knee, T.L_Ankle,
    T.R_Hip, T.R_Knee, T.R_Ankle,
    T.Spine, T.Neck,
    T.L_Shoulder, T.L_Elbow, T.L_Wrist,
    T.R_Shoulder, T.R_Elbow, T.R_Wrist,
    T.Nose, T.L_Ear, T.R_Ear,
)

_BASIC_18_PARENT_TYPES: Dict[KpsType, KpsType] = {
    T.Mid_Hip: T.Mid_Hip,  # root
    T.L_Hip: T.Mid_Hip, T.L_Knee: T.L_Hip, T.L_Ankle: T.L_Knee,
    T.R_Hip: T.Mid_Hip, T.R_Knee: T.R_Hip, T.R_Ankle: T.R_Knee,
    T.Spine: T.Mid_Hip, T.Neck: T.Spine,
    T.L_Shoulder: T.Neck, T.L_Elbow: T.L_Shoulder, T.L_Wrist: T.L_Elbow,
    T.R_Shoulder: T.Neck, T.R_Elbow: T.R_Shoulder, T.R_Wrist: T.R_Elbow,
    T.Nose: T.Neck, T.L_Ear: T.Nose, T.R_Ear: T.Nose,
}

# COCO + synthetic mid-spine keypoint appended at index 17
# (ref:src/inverse_kinematics.py:370-378).
COCO_SPINE_ORDER: Tuple[KpsType, ...] = COCO_ORDER + (T.Spine,)

# SMPL-X 22-joint body (the AMASS/SMPL-X experiment format,
# ref:src/pose_def.py:140-163).
SMPLX_22_ORDER: Tuple[KpsType, ...] = (
    T.Mid_Hip, T.L_Hip, T.R_Hip, T.LowerBack,
    T.L_Knee, T.R_Knee, T.UpperBack, T.L_Ankle, T.R_Ankle,
    T.Chest, T.L_BigToe, T.R_BigToe, T.LowerNeck,
    T.L_Clavicle, T.R_Clavicle, T.UpperNeck,
    T.L_Shoulder, T.R_Shoulder, T.L_Elbow, T.R_Elbow,
    T.L_Wrist, T.R_Wrist,
)

SMPLX_22_BONES: Tuple[Tuple[KpsType, KpsType], ...] = (
    (T.Mid_Hip, T.L_Hip), (T.Mid_Hip, T.R_Hip),
    (T.Mid_Hip, T.LowerBack), (T.LowerBack, T.UpperBack),
    (T.L_Hip, T.L_Knee), (T.R_Hip, T.R_Knee),
    (T.L_Knee, T.L_Ankle), (T.R_Knee, T.R_Ankle),
    (T.UpperBack, T.Chest),
    (T.L_Ankle, T.L_BigToe), (T.R_Ankle, T.R_BigToe),
    (T.Chest, T.LowerNeck), (T.LowerNeck, T.UpperNeck),
    (T.Chest, T.R_Clavicle), (T.R_Clavicle, T.R_Shoulder),
    (T.R_Shoulder, T.R_Elbow), (T.R_Elbow, T.R_Wrist),
    (T.Chest, T.L_Clavicle), (T.L_Clavicle, T.L_Shoulder),
    (T.L_Shoulder, T.L_Elbow), (T.L_Elbow, T.L_Wrist),
)

_ORDERS: Dict[KpsFormat, Tuple[KpsType, ...]] = {
    KpsFormat.COCO: COCO_ORDER,
    KpsFormat.OPENPOSE_25: OPENPOSE_25_ORDER,
    KpsFormat.BASIC_18: BASIC_18_ORDER,
    KpsFormat.COCO_SPINE: COCO_SPINE_ORDER,
    KpsFormat.SMPLX_22: SMPLX_22_ORDER,
}


def kps_order(fmt: KpsFormat) -> Tuple[KpsType, ...]:
    return _ORDERS[fmt]


def kps_count(fmt: KpsFormat) -> int:
    return len(_ORDERS[fmt])


def kps_index(fmt: KpsFormat) -> Dict[KpsType, int]:
    return {t: i for i, t in enumerate(_ORDERS[fmt])}


def conversion_index(src: KpsFormat, dst: KpsFormat) -> np.ndarray:
    """Index array `idx` such that `dst_kps = src_kps[idx]`.

    Every joint of `dst` must exist in `src` (e.g. OPENPOSE_25 -> COCO,
    ref:src/pose_def.py:262-270).
    """
    src_idx = kps_index(src)
    out = []
    for t in _ORDERS[dst]:
        if t not in src_idx:
            raise ValueError(f"{t} of {dst} missing from {src}")
        out.append(src_idx[t])
    return np.asarray(out, dtype=np.int32)


def common_kps_index(fmt_a: KpsFormat, fmt_b: KpsFormat) -> Tuple[np.ndarray, np.ndarray]:
    """Index arrays (idx_a, idx_b) over the joints shared by both formats,
    enumerated in `fmt_a` order (ref:src/pose_def.py:278-298)."""
    idx_b_map = kps_index(fmt_b)
    idx_a, idx_b = [], []
    for i, t in enumerate(_ORDERS[fmt_a]):
        if t in idx_b_map:
            idx_a.append(i)
            idx_b.append(idx_b_map[t])
    return np.asarray(idx_a, dtype=np.int32), np.asarray(idx_b, dtype=np.int32)


# --- BASIC_18 topology -------------------------------------------------------

_B18_IDX = kps_index(KpsFormat.BASIC_18)

# parent index per joint; root's parent is itself (index 0)
BASIC_18_PARENTS: np.ndarray = np.asarray(
    [_B18_IDX[_BASIC_18_PARENT_TYPES[t]] for t in BASIC_18_ORDER], dtype=np.int32
)
assert BASIC_18_PARENTS[0] == 0
assert np.all(BASIC_18_PARENTS[1:] < np.arange(1, len(BASIC_18_ORDER)))

BASIC_18_BONES: Tuple[Tuple[int, int], ...] = tuple(
    (j, int(BASIC_18_PARENTS[j])) for j in range(1, len(BASIC_18_ORDER))
)

COCO_BONES: Tuple[Tuple[KpsType, KpsType], ...] = (
    (T.Nose, T.L_Eye), (T.L_Eye, T.L_Ear), (T.Nose, T.R_Eye), (T.R_Eye, T.R_Ear),
    (T.L_Shoulder, T.R_Shoulder),
    (T.L_Shoulder, T.L_Elbow), (T.L_Elbow, T.L_Wrist),
    (T.R_Shoulder, T.R_Elbow), (T.R_Elbow, T.R_Wrist),
    (T.L_Shoulder, T.L_Hip), (T.L_Hip, T.L_Knee), (T.L_Knee, T.L_Ankle),
    (T.R_Shoulder, T.R_Hip), (T.R_Hip, T.R_Knee), (T.R_Knee, T.R_Ankle),
)


def joint_side(t: KpsType) -> str:
    name = t.name
    if name.startswith("L_"):
        return "left"
    if name.startswith("R_"):
        return "right"
    return "mid"


def flip_joint(t: KpsType) -> KpsType:
    side = joint_side(t)
    if side == "left":
        return KpsType[t.name.replace("L_", "R_", 1)]
    if side == "right":
        return KpsType[t.name.replace("R_", "L_", 1)]
    return t


def basic18_side_joints() -> Tuple[List[KpsType], List[KpsType], List[KpsType]]:
    """(left, right, mid) joint lists of BASIC_18 in skeleton order
    (ref:src/pose_def.py:230-259)."""
    left = [t for t in BASIC_18_ORDER if joint_side(t) == "left"]
    right = [t for t in BASIC_18_ORDER if joint_side(t) == "right"]
    mid = [t for t in BASIC_18_ORDER if joint_side(t) == "mid"]
    return left, right, mid


def basic18_side_bone_maps() -> Tuple[np.ndarray, np.ndarray]:
    """Mirror-shared bone-length parameterization of BASIC_18.

    Returns:
      side_joint_idx: (S,) int32 — the BASIC_18 joint index whose incoming bone
        defines each shared length (left + mid joints, S=11).
      side_to_full: (18,) int32 — per full joint, the index into the shared
        side-length vector (right-side joints map to their mirrored left
        joint's entry).  ref:src/inverse_kinematics.py:153-164.
    """
    left, right, mid = basic18_side_joints()
    l_m = left + mid
    side_joint_idx = np.asarray([_B18_IDX[t] for t in l_m], dtype=np.int32)
    side_of = {t: i for i, t in enumerate(l_m)}
    side_to_full = np.asarray(
        [side_of[t if joint_side(t) != "right" else flip_joint(t)] for t in BASIC_18_ORDER],
        dtype=np.int32,
    )
    return side_joint_idx, side_to_full


# Pre-computed conversions used on the hot ingest path.
OPENPOSE25_TO_COCO: np.ndarray = conversion_index(KpsFormat.OPENPOSE_25, KpsFormat.COCO)

# IK mapping: skeleton joints observable in COCO_SPINE and their observation
# rows (16 shared joints: BASIC_18 minus Mid_Hip and Neck).
IK_SKEL_KPS_IDX, IK_OBS_KPS_IDX = common_kps_index(KpsFormat.BASIC_18, KpsFormat.COCO_SPINE)
assert len(IK_SKEL_KPS_IDX) == 16
