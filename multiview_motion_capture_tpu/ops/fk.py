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


def mm3(a: Array, b: Array) -> Array:
    """Batched 3x3 @ 3x3 as VPU multiply-sum.

    Tiny matmuls are wasted on the MXU, and expressing them as dots triggers
    an XLA TPU algebraic-simplifier CHECK-fail when the batch ranks grow
    (seen under vmap: transpose/dot layout mismatch on f32[B,L,3,3])."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def mv3(a: Array, v: Array) -> Array:
    """Batched 3x3 @ 3-vector as VPU multiply-sum."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def euler_axis_matrices(euler: Array):
    """Per-axis rotation matrices and their angle derivatives.

    Returns (Rx, Ry, Rz, dRx, dRy, dRz), each (..., 3, 3), such that the
    local rotation is R = Rx @ Ry @ Rz and dR/d(angle_i) substitutes the
    corresponding derivative matrix.  Used by the analytic IK jacobian.
    """
    c = jnp.cos(euler)
    s = jnp.sin(euler)
    z = jnp.zeros_like(euler[..., 0])
    o = jnp.ones_like(z)

    def m(rows):
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    cx, cy, cz = c[..., 0], c[..., 1], c[..., 2]
    sx, sy, sz = s[..., 0], s[..., 1], s[..., 2]
    Rx = m([[o, z, z], [z, cx, -sx], [z, sx, cx]])
    Ry = m([[cy, z, sy], [z, o, z], [-sy, z, cy]])
    Rz = m([[cz, -sz, z], [sz, cz, z], [z, z, o]])
    dRx = m([[z, z, z], [z, -sx, -cx], [z, cx, -sx]])
    dRy = m([[-sy, z, cy], [z, z, z], [-cy, z, -sy]])
    dRz = m([[-sz, -cz, z], [cz, -sz, z], [z, z, z]])
    return Rx, Ry, Rz, dRx, dRy, dRz


def _ancestor_masks(parents: np.ndarray):
    """(ANC, ANC_SELF): ANC[j, k] = j is a proper ancestor of k;
    ANC_SELF includes j == k."""
    J = len(parents)
    anc = np.zeros((J, J), dtype=np.float32)
    for k in range(1, J):
        j = parents[k]
        while True:
            anc[j, k] = 1.0
            if j == 0:
                break
            j = parents[j]
    anc_self = anc + np.eye(J, dtype=np.float32)
    return anc, anc_self


ANC_MASK, ANC_SELF_MASK = _ancestor_masks(np.asarray(BASIC_18_PARENTS))
# one-hot (18, 11): bone j draws its length from side entry SIDE_TO_FULL[j]
SIDE_ONE_HOT = np.zeros((N_JOINTS, N_SIDE_BONES), dtype=np.float32)
for _j in range(1, N_JOINTS):
    SIDE_ONE_HOT[_j, SIDE_TO_FULL[_j]] = 1.0


def forward_kinematics_full(
    skel: Skeleton, root: Array, euler: Array, side_lens: Array
):
    """FK that also returns the global frames needed by the analytic
    jacobian: (joints (..., 18, 3), g_R (..., 18, 3, 3), R_local, offsets)."""
    Rx, Ry, Rz, _, _, _ = euler_axis_matrices(euler)
    R_local = mm3(mm3(Rx, Ry), Rz)
    offsets = skel.bone_dirs * side_to_full_bone_lens(side_lens)[..., None]

    g_R = jnp.broadcast_to(jnp.eye(3, dtype=R_local.dtype), R_local.shape)
    g_R = g_R.at[..., 0, :, :].set(R_local[..., 0, :, :])
    g_t = jnp.zeros(euler.shape[:-1] + (3,), dtype=R_local.dtype)
    g_t = g_t.at[..., 0, :].set(root)

    parents = np.asarray(BASIC_18_PARENTS)
    for level in _LEVELS:
        par = parents[level]
        pR = g_R[..., par, :, :]
        pt = g_t[..., par, :]
        new_R = mm3(pR, R_local[..., level, :, :])
        new_t = mv3(pR, offsets[..., level, :]) + pt
        g_R = g_R.at[..., level, :, :].set(new_R)
        g_t = g_t.at[..., level, :].set(new_t)
    return g_t, g_R, (Rx, Ry, Rz), offsets


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
        new_R = mm3(pR, lR)
        new_t = mv3(pR, off) + pt
        g_R = g_R.at[..., level, :, :].set(new_R)
        g_t = g_t.at[..., level, :].set(new_t)

    return g_t
