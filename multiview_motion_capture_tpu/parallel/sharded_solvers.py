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


def make_cluster_mesh(n_devices: Optional[int] = None,
                      axis_name: str = "cl") -> Mesh:
    """A 1-axis mesh over the cluster dimension."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=(axis_name,))


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
    assert C % n_shard == 0, (
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
