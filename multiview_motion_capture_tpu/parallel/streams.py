"""Sequences-to-devices serving: B independent camera streams, one tracker
per mesh device, all advancing concurrently.

On one chip the sequential `tracker.run_offline` scan IS the serving mode (a
vmapped multi-stream scan was built and measured strictly worse in r2 —
every stream pays the slowest stream's ALS/LM iteration counts each frame,
docs/PERF.md).  Across chips the right scaling axis is therefore *streams*:
each device runs the measured-best sequential scan on its own streams, with
no cross-device communication at all (the shard_map body contains no
collectives — XLA compiles it to fully independent per-device programs).

The reference has no analogue (single process, one sequence,
SURVEY.md §2.3); this is the serving-throughput scaling story for the
multi-sequence production case: B rigs/replays tracked on a pod slice at
single-stream latency each.

Per-stream outputs are bit-equal to running `tracker.run_offline` on that
stream alone (tests/test_parallel.py::test_streams_to_devices_*): the
tracker state never crosses the stream axis.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from multiview_motion_capture_tpu.tracker import (
    FrameOutput,
    Tracklet,
    TrackerContext,
    TrackerState,
    _cached_scan,
    assemble_tracklets,
    make_step,
)


def make_streams_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-axis mesh named 'streams' over (the first) n_devices devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=("streams",))


def _build_streams_fn(ctx: TrackerContext, mesh: Mesh, axis: str):
    step = make_step(ctx)
    cfg = ctx.cfg

    def per_device(kps_l, valid_l):
        # kps_l: (B_local, F, V, P, K, 3) — the streams of THIS device.
        # lax.map (not vmap) keeps each stream a plain sequential scan: the
        # measured-best schedule per stream, and the fused ALS kernel's SMEM
        # scalar output cannot be batched anyway (docs/PERF.md).
        def one_stream(frames):
            state0 = TrackerState.zeros(cfg)
            return jax.lax.scan(step, state0, frames)

        return jax.lax.map(one_stream, (kps_l, valid_l))

    return jax.jit(
        jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
            # the body is collective-free (streams are fully independent);
            # the varying-manual-axes check would reject closed-over context
            # constants (ALS init factors) entering while_loop carries that
            # also hold stream-varying values
            check_vma=False,
        )
    )


def run_offline_streams(
    ctx: TrackerContext,
    kps,
    valid,
    mesh: Mesh,
    axis: str = "streams",
):
    """Track B sequences concurrently, sharded over `mesh[axis]`.

    kps: (B, F, V, P, K, 3); valid: (B, F, V, P); B divisible by the axis
    size.  Every stream shares the TrackerContext (same rig/calibration —
    the serving case of many replays/feeds of one installation).  Returns
    (final states (B, ...), stacked FrameOutput with leading (B, F) axes).
    """
    if ctx.mesh is not None:
        raise ValueError(
            "stream serving shards the *stream* axis; build the "
            "TrackerContext without a camera-sharding mesh (ctx.mesh=None)"
        )
    B = kps.shape[0]
    n_shard = mesh.shape[axis]
    if B % n_shard != 0:
        raise ValueError(f"B={B} streams not divisible by mesh axis "
                         f"{axis}={n_shard}")
    fn = _cached_scan(("streams", id(ctx), mesh, axis), ctx,
                      lambda: _build_streams_fn(ctx, mesh, axis))
    return fn(jnp.asarray(kps), jnp.asarray(valid))


def assemble_stream_tracklets(out: FrameOutput) -> List[List[Tracklet]]:
    """Split the stacked (B, F, ...) emissions into per-stream tracklets."""
    host = jax.device_get(out)
    B = np.asarray(host.track_id).shape[0]
    result = []
    for b in range(B):
        one = FrameOutput(*[np.asarray(getattr(host, f))[b]
                            for f in FrameOutput._fields])
        result.append(assemble_tracklets(one))
    return result
