"""Driver benchmark: Shelf end-to-end FPS on the real TPU chip.

Runs the full pipeline (packed Shelf detections -> association -> ALS ->
tracking -> batched IK) as one scanned device program over 300 frames and
reports steady-state frames/second vs the >100 FPS north-star
(BASELINE.md).  Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import time
from pathlib import Path


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    import dataclasses

    from multiview_motion_capture_tpu.cameras import CameraBank
    from multiview_motion_capture_tpu.config import SHELF_BENCH
    from multiview_motion_capture_tpu.data.ingest import load_openpose_dir
    from multiview_motion_capture_tpu.pipeline import run

    shelf = Path("/root/reference/data/shelf")
    cfg = dataclasses.replace(SHELF_BENCH, max_frames=300)
    batch = load_openpose_dir(shelf / "kps_opn", cfg)
    cams = CameraBank.from_json_dir(shelf / "calibs")

    res = run(batch, cams, cfg, use_ik=True)
    fps = res.fps

    from multiview_motion_capture_tpu.eval import reprojection_metrics

    m = reprojection_metrics(res.tracklets, batch, cams)

    print(
        json.dumps(
            {
                "metric": "shelf_e2e_fps_5cam_ik",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 100.0, 3),
                "extra": {
                    "n_frames": res.n_frames,
                    "n_tracklets": len(res.tracklets),
                    "top_track_lengths": m.lengths[:5],
                    "reproj_px_mean": round(m.mean_reproj_px, 2),
                    "reproj_px_median": round(m.median_reproj_px, 2),
                    "n_degenerate_poses": m.n_degenerate_poses,
                    "track_time_s": round(res.track_time_s, 4),
                    "compile_s": round(
                        res.timings.get("compile+track", 0.0) - res.track_time_s, 2
                    ),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
