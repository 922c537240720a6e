"""Streaming (online) benchmark: throughput/latency vs micro-batch size.

The per-frame streaming mode pays one device dispatch per frame; through the
axon tunnel that round trip (~30 ms) dwarfs the ~4.5 ms of device work
(docs/PERF.md).  `MvTracker.update_batch` amortizes the round trip over k
frames at k frames of added output latency — this script measures the
trade-off curve on the Shelf sequence.

Run ON THE TPU (no --cpu), one process at a time:
    python scripts/bench_streaming.py
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

import numpy as np

from multiview_motion_capture_tpu.cameras import CameraBank
from multiview_motion_capture_tpu.config import SHELF_BENCH
from multiview_motion_capture_tpu.data.ingest import filter_bad_poses, load_openpose_dir
from multiview_motion_capture_tpu.tracker import MvTracker


def main():
    shelf = Path("/root/reference/data/shelf")
    cfg = dataclasses.replace(SHELF_BENCH, max_frames=300)
    batch = load_openpose_dir(shelf / "kps_opn", cfg)
    batch = filter_bad_poses(batch, cfg)
    cams = CameraBank.from_json_dir(shelf / "calibs")
    F = min(300, batch.n_frames)

    from multiview_motion_capture_tpu.tracker import TrackerState

    results = {}
    for k in (1, 4, 8, 16, 32):
        tracker = MvTracker(cams, cfg, use_ik=True)
        # warm-up / compile on the first chunk shape, then reset the state
        # IN PLACE: building a new MvTracker would make a new context, whose
        # chunk scan compiles separately (measured as a ~3.7 s first chunk)
        tracker.update_batch(list(range(k)), batch.kps[:k], batch.valid[:k])
        tracker.state = TrackerState.zeros(cfg)
        tracker.outputs.clear()
        tracker.frame_idxs.clear()

        lat = []
        t0 = time.perf_counter()
        n_done = 0
        for s in range(0, F, k):
            e = min(F, s + k)
            ts = time.perf_counter()
            # pad_to keeps the tail on the same compiled chunk shape
            tracker.update_batch(list(range(s, e)), batch.kps[s:e],
                                 batch.valid[s:e], pad_to=k)
            lat.append(time.perf_counter() - ts)
            n_done += e - s
        total = time.perf_counter() - t0
        lat_ms = np.asarray(lat) * 1e3
        results[f"k={k}"] = {
            "fps": round(n_done / total, 1),
            "dispatch_ms_p50": round(float(np.percentile(lat_ms, 50)), 1),
            "dispatch_ms_p99": round(float(np.percentile(lat_ms, 99)), 1),
            # a frame waits at most one full micro-batch before its results
            # are available: dispatch latency + (k-1) frames of buffering
            "n_tracklets": len(tracker.tracklets()),
        }
        print(f"k={k}: {results[f'k={k}']}", file=sys.stderr)

    best = max(results.values(), key=lambda r: r["fps"])
    print(json.dumps({
        "metric": "shelf_streaming_fps",
        "value": best["fps"],
        "unit": "frames/s",
        "extra": {**results, "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    main()
