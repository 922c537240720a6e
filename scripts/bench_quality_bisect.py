"""Attribute the bench mean-reprojection drift (VERDICT r4 #7).

Bench history: mean 8.65 (r1) -> 8.82 (r2) -> 8.97 (r3) -> 9.10 (r4) px
while the median stayed 6.45-6.48 and the top track lengths were identical
— the creep is in the tail (marginal fragment frames), not the bulk.

Runs the exact bench.py pipeline under config variants that undo each
round's flip, ON THE TPU (one process at a time):

    python scripts/bench_quality_bisect.py
"""
from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from multiview_motion_capture_tpu.cameras import CameraBank
from multiview_motion_capture_tpu.config import SHELF_BENCH
from multiview_motion_capture_tpu.data.ingest import load_openpose_dir
from multiview_motion_capture_tpu.eval import reprojection_metrics
from multiview_motion_capture_tpu.pipeline import run


def main() -> None:
    shelf = Path("/root/reference/data/shelf")
    base = dataclasses.replace(SHELF_BENCH, max_frames=300)
    batch = load_openpose_dir(shelf / "kps_opn", base)
    cams = CameraBank.from_json_dir(shelf / "calibs")

    variants = {
        # today's bench config (expect ~9.10)
        "current_r4": {},
        # undo the r4 flip (expect the r3-era mean ~8.97 if cold1 caused it)
        "cold_stages_2": {"ik_cold_stages": 2},
        # undo the r3-era rescue deviation on top (r2-era semantics)
        "cold2_rescue_off": {"ik_cold_stages": 2, "track_rescue_px": 0.0},
        # rescue off alone (isolate rescue vs cold-schedule)
        "rescue_off": {"track_rescue_px": 0.0},
    }
    out = {}
    for name, kw in variants.items():
        cfg = dataclasses.replace(base, **kw)
        res = run(batch, cams, cfg, use_ik=True)
        m = reprojection_metrics(res.tracklets, batch, cams)
        out[name] = {
            "fps": round(res.fps, 1),
            "mean_px": round(m.mean_reproj_px, 3),
            "median_px": round(m.median_reproj_px, 3),
            "n_tracklets": len(res.tracklets),
            "top_lengths": m.lengths[:5],
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
