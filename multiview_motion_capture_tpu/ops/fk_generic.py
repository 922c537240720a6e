"""Forward kinematics over arbitrary skeletons (CMU rigs, BVH imports).

Covers the reference's minimal CMU FK (ref:src/kinematics.py:11-31 +
skeleton_CMU.yml) and animates skeletons parsed from BVH files
(utils/bvh.read_bvh): any topology given as a parent array, not just
BASIC_18.  Same level-parallel design as ops/fk.py — the compose depth is
the tree depth; joints within a level batch into one gathered matmul.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.ops.fk import euler_to_matrix
from multiview_motion_capture_tpu.utils.precision import high_precision


class GenericSkeleton(NamedTuple):
    parents: np.ndarray        # (J,) int, parent[0] == -1 or 0 (root)
    offsets: jnp.ndarray       # (J, 3) rest offsets from parent
    levels: tuple              # static per-depth joint index tuples

    @classmethod
    def build(cls, parents: Sequence[int], offsets: np.ndarray) -> "GenericSkeleton":
        parents = np.asarray(parents, dtype=np.int64)
        parents = np.where(parents < 0, 0, parents)
        J = len(parents)
        order = np.argsort(np.arange(J))  # identity; require topological input
        depth = np.zeros(J, dtype=np.int64)
        for j in range(1, J):
            if parents[j] >= j:
                raise ValueError("parents must be topologically ordered (parent < child)")
            depth[j] = depth[parents[j]] + 1
        levels = tuple(
            tuple(np.nonzero(depth == d)[0].tolist())
            for d in range(1, int(depth.max()) + 1)
        ) if J > 1 else ()
        return cls(
            parents=parents,
            offsets=jnp.asarray(offsets, dtype=jnp.float32),
            levels=levels,
        )

    @property
    def n_joints(self) -> int:
        return len(self.parents)


@high_precision
def forward_kinematics_generic(
    skel: GenericSkeleton,
    root: jnp.ndarray,       # (..., 3)
    euler: jnp.ndarray,      # (..., J, 3) radians, R = Rx @ Ry @ Rz
    offsets: Optional[jnp.ndarray] = None,  # (..., J, 3) override rest offsets
) -> jnp.ndarray:
    """Global joint positions (..., J, 3)."""
    off = skel.offsets if offsets is None else offsets
    R_local = euler_to_matrix(euler)
    J = skel.n_joints
    g_R = jnp.broadcast_to(jnp.eye(3, dtype=R_local.dtype), R_local.shape)
    g_R = g_R.at[..., 0, :, :].set(R_local[..., 0, :, :])
    g_t = jnp.zeros(euler.shape[:-1] + (3,), dtype=R_local.dtype)
    g_t = g_t.at[..., 0, :].set(root)
    for level in skel.levels:
        lv = np.asarray(level)
        par = skel.parents[lv]
        pR = g_R[..., par, :, :]
        pt = g_t[..., par, :]
        new_R = jnp.einsum("...ab,...bc->...ac", pR, R_local[..., lv, :, :])
        new_t = jnp.einsum("...ab,...b->...a", pR, off[..., lv, :] if off.ndim > 2 else off[lv]) + pt
        g_R = g_R.at[..., lv, :, :].set(new_R)
        g_t = g_t.at[..., lv, :].set(new_t)
    return g_t


# The reference's 31-joint CMU rig (skeleton_CMU.yml) topology: offsets are
# normally loaded from a BVH/yml; this constructor takes them directly.
def cmu_like_skeleton(offsets: np.ndarray, parents: Sequence[int]) -> GenericSkeleton:
    return GenericSkeleton.build(parents, offsets)


def animate_bvh(bvh_data) -> jnp.ndarray:
    """Positions (F, J, 3) for a parsed BVH file (utils.bvh.BvhData) —
    replaces the reference's numpy/scipy FK replay (ref:src/kinematics.py)."""
    skel = GenericSkeleton.build(bvh_data.parents, bvh_data.offsets)
    roots = jnp.asarray(bvh_data.roots, dtype=jnp.float32)
    eulers = jnp.asarray(bvh_data.eulers, dtype=jnp.float32)
    return forward_kinematics_generic(skel, roots, eulers)
