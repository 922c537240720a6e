"""Sharded affinity construction for scaled multi-camera rigs.

The Shelf-sized workload (5 cams, ~5 people) fits one chip with room to
spare; the scaled config (10+ cams / 10+ people, BASELINE.md config 4) has an
O(V^2 P^2 K) epipolar-distance tensor that we shard over the camera axis:
each device computes the distance rows of its local cameras against an
`all_gather` of everyone's detections — the collective rides ICI.

The reference has no analogue (single process, nested Python loops,
SURVEY.md §2.3); this is the "communication backend" row of the component
inventory, realized as shard_map + jax.lax collectives instead of NCCL.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from multiview_motion_capture_tpu.ops.geometry import (
    _normalize_lines,
    masked_symmetric_epipolar_error,
)
from multiview_motion_capture_tpu.utils.precision import high_precision

Array = jnp.ndarray


def _pair_distance(lines: Array, homo_b: Array) -> Array:
    """lines (..., A, B, Pa, K, 3) vs points (B, Pb, K, 3) -> mean |l.x|."""
    return jnp.abs(jnp.einsum("abpkx,bqkx->abpqk", lines, homo_b)).mean(-1)


@high_precision
def sharded_affinity(kps: Array, F: Array, mesh: Mesh, axis: str = "dp") -> Array:
    """All-pairs symmetric spatial epipolar distances, camera-sharded.

    Semantics match `ops.geometry.projected_distance_all_pairs` (the spatial
    affinity of ref:src/mv_math_util.py:288-343) but the V axis is split over
    the mesh: device d holds cameras [d*Vl, (d+1)*Vl) and produces their
    distance rows; detections are exchanged with one `all_gather` over ICI.

    kps: (V, P, K, 3) sharded on V; F: (V, V, 3, 3) replicated.
    Returns (V, P, V, P), sharded on the first axis.
    """
    V, Pp = kps.shape[0], kps.shape[1]
    n_shard = mesh.shape[axis]
    assert V % n_shard == 0, f"V={V} not divisible by mesh axis {axis}={n_shard}"
    Vl = V // n_shard

    def local_rows(kps_local, F_full):
        # kps_local: (Vl, P, K, 3); F_full: (V, V, 3, 3) replicated
        my = jax.lax.axis_index(axis)
        kps_all = jax.lax.all_gather(kps_local, axis)        # (n, Vl, P, K, 3)
        kps_all = kps_all.reshape((V,) + kps_local.shape[1:])

        homo_l = jnp.concatenate(
            [kps_local[..., :2], jnp.ones_like(kps_local[..., :1])], axis=-1
        )
        homo_all = jnp.concatenate(
            [kps_all[..., :2], jnp.ones_like(kps_all[..., :1])], axis=-1
        )
        F_rows = jax.lax.dynamic_slice_in_dim(F_full, my * Vl, Vl, axis=0)  # (Vl, V, 3, 3)
        F_cols = jax.lax.dynamic_slice_in_dim(F_full, my * Vl, Vl, axis=1)  # (V, Vl, 3, 3)

        # forward: lines of local points a in image b (l = F_ab^T x_a)
        lines_f = _normalize_lines(jnp.einsum("abyx,apky->abpkx", F_rows, homo_l))
        d_ab = _pair_distance(lines_f, homo_all)             # (Vl, V, P, P)
        # reverse: lines of points b in local image a (l = F_ba^T x_b)
        F_ba = jnp.swapaxes(F_cols, 0, 1)                    # (Vl, V, 3, 3), entry [a, b] = F[b, a]
        lines_r = _normalize_lines(
            jnp.einsum("abyx,bqky->abqkx", F_ba, homo_all)
        )                                                     # (Vl, V, Pall, K, 3)
        d_ba = jnp.abs(jnp.einsum("abqkx,apkx->abqpk", lines_r, homo_l)).mean(-1)
        return 0.5 * (d_ab + jnp.swapaxes(d_ba, -1, -2))      # (Vl, V, P, P)

    out = jax.jit(
        jax.shard_map(
            local_rows,
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=P(axis),
        )
    )(kps, F)
    return jnp.transpose(out, (0, 2, 1, 3))  # (V, P, V, P)


@high_precision
def sharded_st_epipolar(
    kps: Array, F: Array, min_pair_score: float, mesh: Mesh, axis: str = "dp"
) -> Array:
    """Camera-sharded score-gated symmetric epipolar block — the 2D-2D part
    of the spatial-time similarity matrix (ref:src/motion_capture.py:673-741,
    semantics of `ops.geometry.masked_symmetric_epipolar_error`).

    Device d computes the distance rows of its local cameras against an
    `all_gather` of every view's detections; `masked_symmetric_epipolar_error`
    is already symmetric per (a, b) pair from F_ab alone (it uses F and F^T
    internally), so one gather covers both directions.

    kps: (V, P, K, 3) sharded on V; F: (V, V, 3, 3) row-sharded along the
    same mesh axis (each device receives its local cameras' F rows
    (Vl, V, 3, 3), matching `in_specs=P(axis)`).
    Returns (V, P, V, P) with NaN where no keypoint pair passes the score
    gate (same-view masking is the caller's job, as in the local path).
    """
    V = kps.shape[0]
    n_shard = mesh.shape[axis]
    assert V % n_shard == 0, f"V={V} not divisible by mesh axis {axis}={n_shard}"

    def local_rows(kps_local, F_rows):
        # kps_local: (Vl, P, K, 3); F_rows: (Vl, V, 3, 3)
        kps_all = jax.lax.all_gather(kps_local, axis)
        kps_all = kps_all.reshape((V,) + kps_local.shape[1:])
        ka = kps_local[:, :, None, None, :, :]     # (Vl, P, 1, 1, K, 3)
        kb = kps_all[None, None, :, :, :, :]       # (1, 1, V, P, K, 3)
        Fab = F_rows[:, None, :, None, :, :]       # (Vl, 1, V, 1, 3, 3)
        return masked_symmetric_epipolar_error(ka, kb, Fab, min_pair_score)

    return jax.jit(
        jax.shard_map(
            local_rows,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
        )
    )(kps, F)
