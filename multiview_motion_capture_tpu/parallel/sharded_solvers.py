"""Cluster-sharded association solvers: one rig's independent per-cluster
ALS problems mapped over mesh devices.

The hierarchical association path (tracker._clustered_association) solves C
INDEPENDENT [tracklets | cluster views] ALS problems per frame — independent
enough that a single chip batches them into one fused kernel.  Across chips
the same independence maps each cluster (or a contiguous block of clusters)
to its own device via `shard_map` over the cluster axis: devices solve
locally with ZERO collectives, and the single gather implied by the sharded
output feeds the global match-matrix synthesis + transitive closure, which
run replicated (they are O(N^2) boolean work, negligible next to the
solves).  This is the multi-chip decomposition of ONE rig's solver stage
(VERDICT r3 next #4) — complementing the camera-sharded similarity assembly
(`sharded_association`) and sequences-to-devices serving (`streams`).

The reference has no analogue (single process, nested Python loops,
SURVEY.md §2.3).

Device-local solves run the XLA `match_als` while-loop under `lax.map` —
NOT vmap — so each cluster executes the exact program its solo solve
compiles; the binarized per-cluster match matrices (and hence every
association decision) are BIT-equal to the sequential clustered tracker's.
Downstream poses agree to f32 tolerance only: embedding a shard_map in the
step changes XLA's fusion of the LM solve, and ~100 f32 iterations amplify
last-ulp drift to ~1e-4 m (certified by `dryrun_multichip` stage 5 and
tests/test_cluster_association.py).  On real multi-chip TPU hardware the
device-local solver would be the fused Pallas batched kernel
(ops/als_pallas.match_als_pallas_batched) over the local cluster stack;
only virtual CPU meshes are testable in this environment, so the XLA
solver is the certified path (identical groupings either way,
tests/test_als_pallas.py).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from multiview_motion_capture_tpu.ops import association as assoc

Array = jnp.ndarray


def make_axis_mesh(n_devices: Optional[int] = None,
                   axis_name: str = "x") -> Mesh:
    """A 1-axis mesh over the first `n_devices` devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=(axis_name,))


def make_cluster_mesh(n_devices: Optional[int] = None,
                      axis_name: str = "cl") -> Mesh:
    """A 1-axis mesh over the cluster dimension (for `sharded_cluster_als`)."""
    return make_axis_mesh(n_devices, axis_name)


def sharded_cluster_als(
    subs: Array,            # (C, nc, nc) stacked per-cluster similarity
    diag_mask: Array,       # (nc, nc) shared same-group mask
    init_A: Array,          # (nc, rank) shared seeded init factor
    mesh: Mesh,
    axis: str = "cl",
    *,
    alpha: float,
    beta: float,
    mu0: float,
    tol: float,
    max_iter: int,
    stable_iters: int,
) -> Tuple[Array, Array]:
    """Solve every cluster's ALS with clusters sharded over `mesh[axis]`.

    Returns (x_bin (C, nc, nc) bool, n_iters (C,) int32), both sharded on
    the leading axis (the caller's consumption triggers the one gather).
    """
    C = subs.shape[0]
    n_shard = mesh.shape[axis]
    if C % n_shard != 0:
        # ValueError, not assert: survives `python -O`, and direct callers
        # (outside TrackerContext.build, which raises the same way) get a
        # clear message instead of an opaque shard_map shape error.
        raise ValueError(
            f"assoc_clusters={C} not divisible by mesh axis {axis}={n_shard}")

    def local(sub_local, diag_mask, init_A):
        # sub_local: (C/n, nc, nc); mask/init replicated.  lax.map, NOT
        # vmap: vmap batches the factor matmuls into dot_generals whose
        # accumulation order differs from the solo solves — after ~100
        # limit-cycling f32 ALS iterations that last-ulp drift can flip a
        # 0.5-binarization entry, breaking the bit-equality contract with
        # the sequential path (observed on the 16-cam tracker test).
        # lax.map keeps each cluster the EXACT program match_als compiles
        # solo; with one cluster per device it's a plain call.
        def one(W):
            r = assoc.match_als(
                W, diag_mask, init_A, alpha=alpha, beta=beta, mu0=mu0,
                tol=tol, max_iter=max_iter, stable_iters=stable_iters,
            )
            return r.x_bin, r.n_iters

        return jax.lax.map(one, sub_local)

    # check_vma off: match_als seeds scalar while-loop carries (mu, stability
    # counter, done flag) from literals, which shard_map's varying-axes
    # tracker types as replicated while the loop body makes them varying.
    # The computation is embarrassingly device-local (no collectives), so
    # the replication check has nothing to verify here.
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )(subs, diag_mask, init_A)


def make_track_mesh(n_devices: Optional[int] = None,
                    axis_name: str = "tk") -> Mesh:
    """A 1-axis mesh over the track-slot dimension (for `sharded_lm_solve`)."""
    return make_axis_mesh(n_devices, axis_name)


def sharded_lm_solve(
    init,                   # IkParams pytree, (T, ...) leaves
    skel,                   # Skeleton (replicated constant)
    obs_coco: Array,        # (T, V, 17, 3) per-slot observations
    view_w: Array,          # (T, V) view weights
    Pmats: Array,           # (V, 3, 4) shared or (T, V, 3, 4) per-slot
    mesh: Mesh,
    axis: str = "tk",
    **solve_kw,
):
    """`ops.ik.solve_two_stage` with the track batch sharded over `mesh[axis]`.

    Each track slot's LM problem is independent (the single-chip path batches
    them into one solve precisely because of that), so T slots map to devices
    with ZERO collectives — the gather implied by consuming the sharded
    output is the only communication.  This is the second half of the
    one-rig solver decomposition (VERDICT r3 next #4): `sharded_cluster_als`
    spreads the association solves, this spreads the (T, 68-param) LM batch.

    A free structural bonus: the batched `gj` solver's while-loop runs to the
    slowest ACTIVE slot, so a device whose local T/n slots all converge early
    exits early instead of idling on another slot's worst case — the
    iteration coupling that made global ftol/xtol levers dead on one chip
    (docs/PERF.md r4 iteration study) weakens to per-device coupling.

    Slot results match the unsharded batch to f32 tolerance (shard_map
    changes XLA's fusion of the vmapped LM internals — same drift class as
    `sharded_cluster_als`'s downstream poses); tracklet structure is
    unaffected because association happens before the solve.  Certified by
    dryrun stage 6 and tests/test_sharded_ik.py on the virtual CPU mesh.
    """
    from multiview_motion_capture_tpu.ops import ik as ik_ops

    T = view_w.shape[0]
    n_shard = mesh.shape[axis]
    if T % n_shard != 0:
        # ValueError (not assert) so the check survives `python -O` and
        # direct public-API use, mirroring TrackerContext.build's message.
        raise ValueError(
            f"max_tracks={T} not divisible by mesh axis {axis}={n_shard}")
    p_spec = P(axis) if Pmats.ndim == 4 else P()

    def local(init_l, obs_l, w_l, P_l):
        return ik_ops.solve_two_stage(init_l, skel, obs_l, w_l, P_l,
                                      **solve_kw)

    # check_vma off for the same reason as sharded_cluster_als: the LM
    # while-loop carries (lam, active, it) seeded from literals, which the
    # varying-axes tracker types as replicated while the body makes them
    # varying; the computation is device-local, nothing to verify.
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), p_spec),
        out_specs=P(axis),
        check_vma=False,
    )(init, obs_coco, view_w, Pmats)
