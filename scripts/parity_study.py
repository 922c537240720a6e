"""Full-sequence (300-frame) parity study: TPU tracker vs the oracle
pipeline, with a zoom on the reference's documented frame-131 failure
(ref:README.md:55-56 "debug frame 131", hook at ref:src/motion_capture.py:880-881).

Runs on CPU (oracle is scipy); writes docs/parity_study.json.
Usage: python scripts/parity_study.py
"""
import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from multiview_motion_capture_tpu import PipelineConfig, pipeline
from multiview_motion_capture_tpu.cameras import CameraBank
from multiview_motion_capture_tpu.data.ingest import filter_bad_poses, load_openpose_dir
from tests.oracle_pipeline import run_oracle

N_FRAMES = 300


def active_per_frame(tracklets, n_frames, min_len=1):
    counts = np.zeros(n_frames, dtype=int)
    for t in tracklets:
        frames = t.frames if hasattr(t, "frames") else list(t.frame_idxs)
        if len(frames) < min_len:
            continue
        for f in frames:
            counts[f] += 1
    return counts


def coverage(tracklets, n_frames):
    return float((active_per_frame(tracklets, n_frames) > 0).mean())


def matched_mpjpe(ours, oracle):
    """Match each oracle tracklet to the best-overlapping TPU tracklet."""
    pairs = []
    for ot in oracle:
        if len(ot.frames) < 5:
            continue
        omap = {f: i for i, f in enumerate(ot.frames)}
        best = None
        for t in ours:
            common = [(omap[f], i) for i, f in enumerate(t.frame_idxs) if f in omap]
            if len(common) < max(2, len(ot.frames) // 2):
                continue
            oi, ti = zip(*common)
            a = np.stack([ot.poses[i] for i in oi])
            b = t.poses_3d[list(ti)]
            if a.shape[1] != b.shape[1]:
                continue
            d = float(np.linalg.norm(a - b, axis=-1).mean())
            if best is None or d < best:
                best = d
        if best is not None:
            pairs.append((len(ot.frames), best))
    return pairs


def main():
    # strict reference lifecycle (no track rescue): this study compares
    # against the oracle, which implements the reference's raw semantics.
    # Same config as the CLI `--preset parity` (pinned by tests/test_cli.py).
    cfg = PipelineConfig.parity(max_frames=N_FRAMES)
    batch = load_openpose_dir(Path("/root/reference/data/shelf/kps_opn"), cfg)
    batch = filter_bad_poses(batch, cfg)
    cams = CameraBank.from_json_dir(Path("/root/reference/data/shelf/calibs"))

    t0 = time.time()
    res = pipeline.run(batch, cams, cfg, use_ik=True)
    tpu_tlets = res.tracklets
    t_tpu = time.time() - t0
    print(f"TPU path: {len(tpu_tlets)} tracklets in {t_tpu:.1f}s")

    t0 = time.time()
    oracle = run_oracle(np.asarray(batch.kps), np.asarray(batch.valid), cams,
                        N_FRAMES, use_ik=True)
    t_oracle = time.time() - t0
    print(f"oracle: {len(oracle)} tracklets in {t_oracle:.1f}s")

    tpu_lens = sorted([len(t.frame_idxs) for t in tpu_tlets], reverse=True)
    ora_lens = sorted([len(t.frames) for t in oracle], reverse=True)
    pairs = matched_mpjpe(tpu_tlets, oracle)

    tpu_active = active_per_frame(tpu_tlets, N_FRAMES)
    ora_active = active_per_frame(oracle, N_FRAMES)

    # frame-131 zoom: active tracks and per-frame events around the
    # reference's documented failure
    zoom = {}
    for f in range(120, 146):
        zoom[f] = {"tpu_active": int(tpu_active[f]), "oracle_active": int(ora_active[f])}

    # which tracklets end or start in the window (fragmentation events)
    def events(tracklets):
        ends = {}
        starts = {}
        for t in tracklets:
            frames = t.frames if hasattr(t, "frames") else list(t.frame_idxs)
            if not len(frames):
                continue
            if 120 <= frames[-1] <= 145:
                ends.setdefault(int(frames[-1]), 0)
                ends[int(frames[-1])] += 1
            if 120 <= frames[0] <= 145:
                starts.setdefault(int(frames[0]), 0)
                starts[int(frames[0])] += 1
        return {"ends": ends, "starts": starts}

    out = {
        "n_frames": N_FRAMES,
        "tpu": {
            "n_tracklets": len(tpu_lens),
            "lengths_top10": tpu_lens[:10],
            "coverage": coverage(tpu_tlets, N_FRAMES),
            "mean_active": float(tpu_active.mean()),
            "runtime_s": round(t_tpu, 1),
        },
        "oracle": {
            "n_tracklets": len(ora_lens),
            "lengths_top10": ora_lens[:10],
            "coverage": coverage(oracle, N_FRAMES),
            "mean_active": float(ora_active.mean()),
            "runtime_s": round(t_oracle, 1),
        },
        "matched_pairs": len(pairs),
        "matched_oracle_frames": int(sum(n for n, _ in pairs)),
        "mpjpe_cm": {
            "mean": float(np.mean([e for _, e in pairs]) * 100),
            "median": float(np.median([e for _, e in pairs]) * 100),
            "max": float(np.max([e for _, e in pairs]) * 100),
            "weighted_mean": float(
                sum(n * e for n, e in pairs) / max(sum(n for n, _ in pairs), 1) * 100
            ),
        },
        "frame131_zoom": zoom,
        "tpu_events_120_145": events(tpu_tlets),
        "oracle_events_120_145": events(oracle),
        "active_count_agreement": float((tpu_active == ora_active).mean()),
    }
    out_path = REPO / "docs" / "parity_study.json"
    out_path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
