"""Device-mesh construction helpers.

The reference is single-process with no distribution (SURVEY.md §2.3); all
multi-chip scaling here is new design: `jax.sharding.Mesh` + NamedSharding /
shard_map with XLA collectives over ICI.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def pick_mesh_shape(n_devices: int) -> Tuple[int, int]:
    """Split devices into (dp, tp): the largest power-of-two tp <= 4 that
    divides the device count, data-parallel over the rest."""
    tp = 1
    for cand in (4, 2):
        if n_devices % cand == 0:
            tp = cand
            break
    return n_devices // tp, tp


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp", "tp")) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    dp, tp = pick_mesh_shape(len(devs))
    arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=tuple(axis_names))


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Composable multi-chip sharding of ONE tracker (VERDICT r4 next #3).

    Each field shards one sequential stage of the per-frame step over that
    many devices; stages run one after another inside the same jitted step,
    so they REUSE the same chips through three differently-named 1-axis
    meshes (shard_map enters each mesh's context independently — no axis
    collision because no two stages are live at once):

    - ``cameras``: the O(V^2 P^2 K) epipolar similarity blocks, camera-
      sharded with one all_gather (parallel.sharded_association),
    - ``clusters``: the C independent per-cluster ALS solves, zero
      collectives (parallel.sharded_solvers.sharded_cluster_als),
    - ``tracks``: the T independent per-slot LM IK solves, zero
      collectives (parallel.sharded_solvers.sharded_lm_solve).

    0 leaves a stage unsharded.  `TrackerContext.build` validates
    divisibility (n_views % cameras, assoc_clusters % clusters,
    max_tracks % tracks) with clear errors.  The reference is single-process
    (SURVEY.md §2.3); this and the stage decompositions it composes are new
    TPU-native design.
    """
    cameras: int = 0
    clusters: int = 0
    tracks: int = 0

    @classmethod
    def parse(cls, spec: str) -> "MeshSpec":
        """Parse ``"cameras=4,clusters=8,tracks=8"`` (any subset of keys)."""
        kw = {}
        for part in filter(None, (p.strip() for p in spec.split(","))):
            if "=" not in part:
                raise ValueError(
                    f"mesh spec item {part!r}: expected key=N with key in "
                    "{cameras, clusters, tracks}")
            k, v = part.split("=", 1)
            k = k.strip()
            if k not in ("cameras", "clusters", "tracks"):
                raise ValueError(
                    f"unknown mesh spec key {k!r} (cameras/clusters/tracks)")
            kw[k] = int(v)
        return cls(**kw)

    def context_kwargs(self) -> dict:
        """Mesh kwargs for :meth:`TrackerContext.build`."""
        from multiview_motion_capture_tpu.parallel.sharded_solvers import (
            make_axis_mesh,
        )

        kw = {}
        n_dev = len(jax.devices())
        for field, n in (("cameras", self.cameras),
                         ("clusters", self.clusters),
                         ("tracks", self.tracks)):
            if n <= 0:
                continue
            if n > n_dev:
                raise ValueError(
                    f"MeshSpec.{field}={n} but only {n_dev} devices visible")
        if self.cameras > 0:
            kw["mesh"] = make_axis_mesh(self.cameras, "dp")
        if self.clusters > 0:
            kw["cluster_mesh"] = make_axis_mesh(self.clusters, "cl")
        if self.tracks > 0:
            kw["ik_mesh"] = make_axis_mesh(self.tracks, "tk")
        return kw
