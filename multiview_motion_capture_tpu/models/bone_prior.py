"""Statistical bone-length / bone-direction priors.

The reference's `build_ref_pose_model.py` (ref:src/build_ref_pose_model.py:
25-81, dead experiment) derives per-subject bone statistics from AMASS +
SMPL-X body models to ground the IK bone-length optimization.  This module
provides the same capability natively: fit per-bone length distributions
from any corpus of 3D poses (mocap exports, BVH files, or this framework's
own tracklets) and expose them as (a) a residual term for the IK solver and
(b) an initializer for `Skeleton` side lengths.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.pose_def import BASIC_18_PARENTS, basic18_side_bone_maps

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class BonePrior:
    """Per-bone length statistics (index 0 = root, unused)."""

    mean: np.ndarray   # (J,)
    std: np.ndarray    # (J,)
    parents: np.ndarray

    def side_prior(self):
        """Collapse to the mirror-shared 11-length parameterization used by
        the IK solver (left/right bones pooled)."""
        side_idx, side_to_full = basic18_side_bone_maps()
        n_side = len(side_idx)
        mean = np.zeros(n_side)
        var = np.zeros(n_side)
        count = np.zeros(n_side)
        for j in range(1, len(self.parents)):
            s = side_to_full[j]
            mean[s] += self.mean[j]
            var[s] += self.std[j] ** 2
            count[s] += 1
        count = np.maximum(count, 1)
        # the root's side entry has no incoming bone: keep std positive so
        # the Mahalanobis residual stays finite (its mean stays 0)
        return mean / count, np.maximum(np.sqrt(var / count), 1e-6)


def fit_bone_prior(
    poses_3d: np.ndarray,
    parents: Optional[Sequence[int]] = None,
) -> BonePrior:
    """Fit per-bone length statistics from (N, J, 3) poses."""
    parents = np.asarray(parents if parents is not None else BASIC_18_PARENTS)
    poses = np.asarray(poses_3d)
    lens = np.linalg.norm(poses - poses[:, parents, :], axis=-1)  # (N, J)
    return BonePrior(
        mean=lens.mean(axis=0),
        std=lens.std(axis=0) + 1e-6,
        parents=parents,
    )


def bone_direction_stats(poses_3d: np.ndarray,
                         parents: Optional[Sequence[int]] = None):
    """Mean unit bone directions in the root-relative frame (the reference's
    per-subject `bone_dirs`, ref:src/build_ref_pose_model.py:52-68)."""
    parents = np.asarray(parents if parents is not None else BASIC_18_PARENTS)
    vecs = np.asarray(poses_3d) - np.asarray(poses_3d)[:, parents, :]
    norms = np.linalg.norm(vecs, axis=-1, keepdims=True)
    dirs = vecs / np.maximum(norms, 1e-9)
    mean_dir = dirs.mean(axis=0)
    mean_dir[1:] /= np.maximum(np.linalg.norm(mean_dir[1:], axis=-1, keepdims=True), 1e-9)
    return mean_dir


def prior_residual(side_lens: Array, prior_mean: Array, prior_std: Array,
                   weight: float = 1.0) -> Array:
    """Mahalanobis bone-length residual, appendable to the IK least-squares
    system: weight * (l - mu) / sigma."""
    return weight * (side_lens - prior_mean) / prior_std
