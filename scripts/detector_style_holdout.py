"""Detector domain robustness within this environment (VERDICT r3 next #5).

The shipped checkpoint trains AND evaluates on the same renderer with the
same style distribution; held-out *seeds* do not test distribution shift.
This script evaluates the shipped checkpoint on held-out *styles* — render
configurations outside the training distribution (training used
RenderConfig defaults: brightness 0.7-1.15, noise 0.02, 4 bg blobs, 3
distractors, appearance jitter 0.3) — and calibrates the center-score
threshold on the style-shifted set.

    python scripts/detector_style_holdout.py          # ~5 min CPU

Results are recorded in docs/PERF.md; the gate lives in
tests/test_shipped_checkpoint.py::test_style_heldout_detection_quality.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.data.detect import make_bottom_up_detector
from multiview_motion_capture_tpu.data.detect_train import (
    evaluate_detections,
    generate_samples,
)
from multiview_motion_capture_tpu.data.render import RenderConfig
from multiview_motion_capture_tpu.models.checkpoint import load_posenet

CKPT = (Path(__file__).resolve().parents[1]
        / "multiview_motion_capture_tpu/models/checkpoints/posenet_synth.npz")

# held-out styles: everything differs from the training RenderConfig in the
# named directions; seeds 3000+ were never trained on
STYLES = {
    "in_distribution": RenderConfig(hw=(192, 256)),
    "dark_noisy": RenderConfig(hw=(192, 256), brightness_range=(0.45, 0.65),
                               noise_std=0.06),
    "bright": RenderConfig(hw=(192, 256), brightness_range=(1.2, 1.45)),
    "cluttered": RenderConfig(hw=(192, 256), bg_blobs=12,
                              distractor_segments=10),
    "clean_flat": RenderConfig(hw=(192, 256), bg_gradient=False, bg_blobs=0,
                               distractor_segments=0, noise_std=0.0),
    "heavy_palette_jitter": RenderConfig(hw=(192, 256),
                                         appearance_jitter=0.7),
}


def eval_style(mcfg, params, render_cfg, seeds, center_min_score):
    detect = make_bottom_up_detector(mcfg, max_people=6,
                                     center_min_score=center_min_score)
    ss = generate_samples(seeds, render_cfg, n_frames=4, n_views=4,
                          n_people_range=(2, 4))
    kps_all, val_all = [], []
    for s in range(0, ss.images.shape[0], 16):
        kps, _, valid = detect(params, jnp.asarray(ss.images[s:s + 16]))
        kps_all.append(np.asarray(kps))
        val_all.append(np.asarray(valid))
    return evaluate_detections(
        np.concatenate(kps_all), np.concatenate(val_all),
        np.nan_to_num(ss.kps_px[..., :2]), ss.present, match_px=12.0)


def main():
    mcfg, params = load_posenet(CKPT)
    seeds = [3000, 3001, 3002]
    out = {"styles": {}, "calibration": {}}
    for name, rcfg in STYLES.items():
        q = eval_style(mcfg, params, rcfg, seeds, center_min_score=0.2)
        out["styles"][name] = {k: round(float(v), 4) for k, v in q.items()}
        print(name, out["styles"][name], file=sys.stderr)

    # threshold calibration on the UNION of shifted styles (excluding the
    # in-distribution control): pick the score that maximizes F1
    for thr in (0.05, 0.1, 0.15, 0.2, 0.3, 0.4):
        rs, ps = [], []
        for name in ("dark_noisy", "bright", "cluttered"):
            q = eval_style(mcfg, params, STYLES[name], seeds, thr)
            rs.append(q["recall"])
            ps.append(q["precision"])
        r, p = float(np.mean(rs)), float(np.mean(ps))
        f1 = 2 * r * p / max(r + p, 1e-9)
        out["calibration"][str(thr)] = {
            "recall": round(r, 4), "precision": round(p, 4),
            "f1": round(f1, 4),
        }
        print("thr", thr, out["calibration"][str(thr)], file=sys.stderr)

    best = max(out["calibration"].items(), key=lambda kv: kv[1]["f1"])
    out["best_threshold"] = float(best[0])
    print(json.dumps({"metric": "detector_style_holdout", "extra": out},
                     indent=1))


if __name__ == "__main__":
    main()
