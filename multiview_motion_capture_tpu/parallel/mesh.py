"""Device-mesh construction helpers.

The reference is single-process with no distribution (SURVEY.md §2.3); all
multi-chip scaling here is new design: `jax.sharding.Mesh` + NamedSharding /
shard_map with XLA collectives over ICI.
"""
from __future__ import annotations

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
