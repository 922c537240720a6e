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

    # quality gate: kernel rewrites must not silently drift tracking quality
    # (the r2 8.56 -> 8.82 px mean shift was reported but nothing would have
    # failed on it; now it fails loudly, VERDICT r2 next #4).  Bands reflect
    # the measured r3 envelope with track rescue on: median ~6.45 px,
    # ~27 fragments (was 34 pre-rescue vs the oracle's 23), two ~200-frame
    # leading tracks (rescue moves one fragment boundary to ~frame 100;
    # re-ID reassembles the full identities), 0 degenerate poses.
    gate = {
        "median_le": m.median_reproj_px <= 6.6,
        # 9.3: the r1-r4 mean creep (8.65 -> 9.10) is fully attributed
        # (scripts/bench_quality_bisect.py, docs/PERF.md r5) to two
        # deliberate flips — the rescue deviation (+0.15, fragments
        # 34 -> 27) and the cold1 schedule (+0.14, +70 fps); the median
        # is flat in every variant.  The band is tightened 9.5 -> 9.3 so
        # the NEXT mean-increasing flip fails loudly and must re-band
        # with its own written justification.
        "mean_le": m.mean_reproj_px <= 9.3,
        "tracklet_band": 20 <= len(res.tracklets) <= 32,
        "long_tracks": len([x for x in m.lengths if x >= 190]) >= 2,
        "no_degenerate": m.n_degenerate_poses == 0,
    }
    quality_ok = all(gate.values())

    # trend, not just threshold (VERDICT r4 #7): the mean crept
    # 8.65 -> 8.82 -> 8.97 -> 9.10 px across r1-r4 while the median stayed
    # flat (attribution: scripts/bench_quality_bisect.py + docs/PERF.md r5).
    # Emit the per-round mean history from the driver's BENCH_r*.json
    # records so a monotonic drift is visible in every bench output.
    trend = {}
    for p in sorted(Path(__file__).resolve().parent.glob("BENCH_r0*.json")):
        try:
            rec = json.loads(p.read_text())
            line = [ln for ln in rec.get("tail", "").splitlines()
                    if ln.startswith("{")][0]
            trend[p.stem.replace("BENCH_", "")] = json.loads(
                line)["extra"]["reproj_px_mean"]
        except Exception:
            pass

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
                    "reproj_mean_trend": {**trend,
                                          "now": round(m.mean_reproj_px, 2)},
                    "quality_ok": quality_ok,
                    **({} if quality_ok else {"quality_gate": gate}),
                },
            }
        )
    )
    if not quality_ok:
        raise SystemExit(f"bench quality gate FAILED: {gate}")


if __name__ == "__main__":
    main()
