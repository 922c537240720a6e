"""Profile the Shelf bench steady-state on the TPU and print the top ops by
device time (xplane parsing workflow from docs/PERF.md).

Usage: python scripts/profile_bench.py [trace_dir]
"""
import dataclasses
import glob
import sys
import time
from collections import defaultdict
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from multiview_motion_capture_tpu.cameras import CameraBank
from multiview_motion_capture_tpu.config import SHELF_BENCH
from multiview_motion_capture_tpu.data.ingest import filter_bad_poses, load_openpose_dir
from multiview_motion_capture_tpu.tracker import TrackerContext, run_offline


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mvmc_trace"
    shelf = Path("/root/reference/data/shelf")
    cfg = dataclasses.replace(SHELF_BENCH, max_frames=300)
    batch = load_openpose_dir(shelf / "kps_opn", cfg)
    batch = filter_bad_poses(batch, cfg)
    cams = CameraBank.from_json_dir(shelf / "calibs")
    kps = jnp.asarray(batch.kps[:300])
    valid = jnp.asarray(batch.valid[:300])
    ctx = TrackerContext.build(cams, cfg, use_ik=True)

    # warm up / compile
    _, out = run_offline(ctx, kps, valid)
    jax.block_until_ready(out.pose3d)
    t0 = time.perf_counter()
    _, out = run_offline(ctx, kps, valid)
    jax.block_until_ready(out.pose3d)
    steady = time.perf_counter() - t0
    print(f"steady-state: {steady:.3f}s = {300 / steady:.1f} fps")

    with jax.profiler.trace(trace_dir):
        _, out = run_offline(ctx, kps, valid)
        jax.block_until_ready(out.pose3d)

    # parse the xplane proto
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
