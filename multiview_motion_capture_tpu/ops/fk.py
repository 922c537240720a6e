"""Forward kinematics of the BASIC_18 skeleton, level-parallel and jittable.

Re-designs ref:src/inverse_kinematics.py:120-199 + ref:src/Quaternions.py:

- local rotations: euler (x, y, z intrinsic: R = Rx @ Ry @ Rz, matching
  `Quaternions.from_euler(order='xyz', world=False)` composition at
  ref:src/Quaternions.py:450-462) built in closed form,
- the parent-chain compose loop (ref:inverse_kinematics.py:193-195) becomes
  a sweep over tree *levels* (depth 6 for BASIC_18) with gathered batched
  matmuls, so the critical path is the tree depth, not the joint count,
- bone lengths use the mirror-shared side parameterization (11 lengths -> 18
  bones, ref:inverse_kinematics.py:115-117,153-164).
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.utils.precision import high_precision

from multiview_motion_capture_tpu.pose_def import (
    BASIC_18_PARENTS,
    basic18_side_bone_maps,
)

Array = jnp.ndarray

N_JOINTS = 18
SIDE_JOINT_IDX, SIDE_TO_FULL = basic18_side_bone_maps()
N_SIDE_BONES = len(SIDE_JOINT_IDX)  # 11

# Reference rest-pose offsets of the 18 joints (ref:src/inverse_kinematics.py:120-140).
REF_OFFSETS = np.array(
    [
        [0, 0, 0],
        [0.15, 0, 0], [0, 0, -0.5], [0, 0, -0.5],
        [-0.15, 0, 0], [0, 0, -0.5], [0, 0, -0.5],
        [0, 0, 0.3], [0, 0, 0.3],
        [0.2, 0, 0], [0.3, 0, 0], [0.3, 0, 0],
        [-0.2, 0, 0], [-0.3, 0, 0], [-0.3, 0, 0],
        [0, -0.02, 0.15], [0.07, 0.02, 0.1], [-0.07, 0.02, 0.1],
    ],
    dtype=np.float64,
)


def _offsets_to_dirs_lens(offsets: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    lens = np.linalg.norm(offsets, axis=-1)
    dirs = offsets.copy()
    dirs[1:] = dirs[1:] / lens[1:, None]
    return dirs, lens


REF_BONE_DIRS, REF_BONE_LENS = _offsets_to_dirs_lens(REF_OFFSETS)
REF_SIDE_BONE_LENS = REF_BONE_LENS[SIDE_JOINT_IDX]  # (11,)


def _tree_levels(parents: np.ndarray) -> List[np.ndarray]:
    depth = np.zeros(len(parents), dtype=np.int64)
    for j in range(1, len(parents)):
        depth[j] = depth[parents[j]] + 1
    return [np.nonzero(depth == d)[0].astype(np.int32) for d in range(1, depth.max() + 1)]


_LEVELS = _tree_levels(BASIC_18_PARENTS)


class Skeleton(NamedTuple):
    """Static skeleton definition (arrays are device constants)."""

    bone_dirs: Array        # (18, 3) unit rest directions (root row zero)
    side_bone_lens: Array   # (11,) reference side lengths
    parents: Array          # (18,) int32

    @classmethod
    def default(cls, dtype=jnp.float32) -> "Skeleton":
        return cls(
            bone_dirs=jnp.asarray(REF_BONE_DIRS, dtype=dtype),
            side_bone_lens=jnp.asarray(REF_SIDE_BONE_LENS, dtype=dtype),
            parents=jnp.asarray(BASIC_18_PARENTS),
        )


def euler_to_matrix(euler: Array) -> Array:
    """(..., 3) euler angles -> (..., 3, 3) rotation R = Rx @ Ry @ Rz."""
    cx, cy, cz = jnp.cos(euler[..., 0]), jnp.cos(euler[..., 1]), jnp.cos(euler[..., 2])
    sx, sy, sz = jnp.sin(euler[..., 0]), jnp.sin(euler[..., 1]), jnp.sin(euler[..., 2])
    r00 = cy * cz
    r01 = -cy * sz
    r02 = sy
    r10 = cx * sz + cz * sx * sy
    r11 = cx * cz - sx * sy * sz
    r12 = -cy * sx
    r20 = sx * sz - cx * cz * sy
    r21 = cz * sx + cx * sy * sz
    r22 = cx * cy
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def side_to_full_bone_lens(side_lens: Array) -> Array:
    """(..., 11) shared lengths -> (..., 18) per-joint lengths."""
    return side_lens[..., SIDE_TO_FULL]


@high_precision
def forward_kinematics(
    skel: Skeleton, root: Array, euler: Array, side_lens: Array
) -> Array:
    """Joint positions from pose/shape parameters.

    Args:
      root: (..., 3) root translation.
      euler: (..., 18, 3) per-joint euler angles.
      side_lens: (..., 11) shared bone lengths.
    Returns:
      (..., 18, 3) global joint positions.
    """
    R_local = euler_to_matrix(euler)                      # (..., 18, 3, 3)
    offsets = skel.bone_dirs * side_to_full_bone_lens(side_lens)[..., None]  # (..., 18, 3)

    # initialize global transforms with the root joint
    g_R = jnp.broadcast_to(jnp.eye(3, dtype=R_local.dtype), R_local.shape)
    g_R = g_R.at[..., 0, :, :].set(R_local[..., 0, :, :])
    g_t = jnp.zeros(euler.shape[:-1] + (3,), dtype=R_local.dtype)
    g_t = g_t.at[..., 0, :].set(root)

    parents = np.asarray(BASIC_18_PARENTS)
    for level in _LEVELS:
        par = parents[level]
        pR = g_R[..., par, :, :]
        pt = g_t[..., par, :]
        lR = R_local[..., level, :, :]
        off = offsets[..., level, :]
        new_R = jnp.einsum("...ab,...bc->...ac", pR, lR)
        new_t = jnp.einsum("...ab,...b->...a", pR, off) + pt
        g_R = g_R.at[..., level, :, :].set(new_R)
        g_t = g_t.at[..., level, :].set(new_t)

    return g_t
