"""Profile the 128-camera full-IK config on the TPU and print top ops by
device time (xplane workflow from docs/PERF.md).  Diagnoses the r5 128-cam
fps wall: attribution between the global (N=1296)^2 stages (closure
matmuls, centroid merge, rescue masks) and the per-cluster solvers.

Run ON THE TPU, one process at a time:
    python scripts/profile_cam128.py [trace_dir] [--assoc-only]
"""
from __future__ import annotations

import glob
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

import jax.numpy as jnp

from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
from multiview_motion_capture_tpu.tracker import TrackerContext, run_offline


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trace_dir = args[0] if args else "/tmp/mvmc_trace128"
    use_ik = "--assoc-only" not in sys.argv
    n_frames = 60
    levers = ({"ik_cold_stages": 1, "ik_warm_iters": 3}
              if "--levers" in sys.argv else {})
    cfg = PipelineConfig(
        n_views=128, max_people=10, max_tracks=16, max_frames=None,
        als_max_iter=100, ik_warm_stages=1, assoc_clusters=4,
        ik_max_views=16, **levers,
    )
    seq = synthetic_sequence(n_frames=n_frames, n_people=10, n_views=128,
                             cfg=cfg, seed=0, noise_px=1.0, drop_prob=0.05)
    kps = jnp.asarray(seq.batch.kps)
    valid = jnp.asarray(seq.batch.valid)
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=use_ik)

    _, out = run_offline(ctx, kps, valid)  # compile
    jax.block_until_ready(out.pose3d)
    t0 = time.perf_counter()
    _, out = run_offline(ctx, kps, valid)
    jax.block_until_ready(out.pose3d)
    steady = time.perf_counter() - t0
    print(f"steady-state: {steady:.3f}s = {n_frames / steady:.1f} fps "
          f"(use_ik={use_ik})")

    with jax.profiler.trace(trace_dir):
        _, out = run_offline(ctx, kps, valid)
        jax.block_until_ready(out.pose3d)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        op_time = defaultdict(float)
        op_count = defaultdict(int)
        total = 0.0
        for line in plane.lines:
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                dur = ev.duration_ps / 1e12
                op_time[meta.name] += dur
                op_count[meta.name] += 1
                total += dur
        print(f"\n== plane {plane.name}: total device op-time {total:.3f}s ==")
        for name, t in sorted(op_time.items(), key=lambda kv: -kv[1])[:45]:
            print(f"{t * 1e3:9.1f} ms {op_count[name]:8d}x  {name[:110]}")


if __name__ == "__main__":
    main()
