"""End-to-end appearance study with the REAL extractor (no oracle).

Renders a multi-person crowd with stable per-person clothing tints, runs
the SHIPPED bottom-up detector with `return_appearance=True` (keypoint-
color-layout embeddings from the same forward), and compares tracking
identity with the appearance term off vs on (gain 60, the
extractor-calibrated value; docs/PERF.md r4) — the production path the
oracle-embedding studies approximate.

    python scripts/appearance_e2e_study.py          # CPU, ~10 min
    python scripts/appearance_e2e_study.py --head   # metric-learned head
                                                    # (appearance_head.npz)
"""
from __future__ import annotations

import dataclasses
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

from examples.e2e_fullframe import scaled_cameras
from multiview_motion_capture_tpu import pipeline
from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.detect import (
    frames_to_frame_batch,
    make_bottom_up_detector,
)
from multiview_motion_capture_tpu.data.detect_train import render_sequence
from multiview_motion_capture_tpu.data.render import RenderConfig
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
from multiview_motion_capture_tpu.eval import identity_metrics
from multiview_motion_capture_tpu.models.checkpoint import load_posenet
from multiview_motion_capture_tpu.reid import merge_tracklets

CKPT = (Path(__file__).resolve().parents[1]
        / "multiview_motion_capture_tpu/models/checkpoints/posenet_synth.npz")

# 4 people with real separation: the shipped checkpoint trains on 1-4
# people per view; denser rendered crowds collapse DETECTION quality and
# make the association comparison meaningless (measured: 6 tightly-packed
# people -> IDF1 0.15 for geometry AND appearance alike).  --people N
# overrides (keep min_person_distance in mind — the r4 crowd run uses
# well-separated starts so detection survives while crossings still occur).
N_PEOPLE = 4
if "--people" in sys.argv:
    N_PEOPLE = int(sys.argv[sys.argv.index("--people") + 1])
N_VIEWS = 5
N_FRAMES = 60
if "--frames" in sys.argv:
    N_FRAMES = int(sys.argv[sys.argv.index("--frames") + 1])
# r5: the crowd-curriculum checkpoint + NMS 3 survive packed scenes
# (docs/PERF.md r5 crowd study) — --dist 0.5 --nms 3 runs the packed-crowd
# configuration the r4 caveat said was out of reach
MIN_DIST = 1.2
if "--dist" in sys.argv:
    MIN_DIST = float(sys.argv[sys.argv.index("--dist") + 1])
NMS = 5
if "--nms" in sys.argv:
    NMS = int(sys.argv[sys.argv.index("--nms") + 1])
# r5 resolution lever for the 10-person identity ceiling (docs/PERF.md r5
# crowd study pinned it to embedding+detection quality at ~20%-smaller
# person crops): --scale F renders AND detects at F x (192, 256) — the
# fully-conv net runs at the larger input (full_hw) so each person is F x
# bigger in model pixels — then rescales the detected keypoints back into
# the UNCHANGED 0.25-scale camera space, so every px-calibrated tracker
# constant is untouched and only detection/embedding quality moves.
SCALE = 1.0
if "--scale" in sys.argv:
    SCALE = float(sys.argv[sys.argv.index("--scale") + 1])


def main():
    mcfg, params = load_posenet(CKPT)
    cfg = PipelineConfig(n_views=N_VIEWS, max_people=max(8, N_PEOPLE + 2),
                         max_tracks=max(12, 2 * N_PEOPLE),
                         max_frames=None, als_max_iter=100, ik_warm_stages=1,
                         ik_solver="gj", track_rescue_px=0.0)
    seq = synthetic_sequence(n_frames=N_FRAMES, n_people=N_PEOPLE,
                             n_views=N_VIEWS, cfg=cfg, seed=1, noise_px=0.0,
                             drop_prob=0.0, min_person_distance=MIN_DIST)
    # distinct stable "clothing": hue-spread tints
    rng = np.random.RandomState(7)
    hues = np.linspace(0, 1, N_PEOPLE, endpoint=False)
    tints = np.stack([
        1.0 + 0.5 * np.stack([np.cos(2 * np.pi * h),
                              np.cos(2 * np.pi * (h + 1 / 3)),
                              np.cos(2 * np.pi * (h + 2 / 3))])
        for h in hues
    ]).astype(np.float32)
    hw = (int(round(192 * SCALE)), int(round(256 * SCALE)))
    images = render_sequence(
        seq,
        RenderConfig(hw=hw, limb_sigma=1.6 * SCALE, joint_sigma=2.0 * SCALE),
        world_scale=0.25 * SCALE, seed=2, person_tints=tints)
    cams_small = scaled_cameras(seq.cameras, 0.25)

    head = None
    if "--head" in sys.argv:
        from multiview_motion_capture_tpu.models.checkpoint import (
            load_appearance_head,
        )

        head = load_appearance_head(CKPT.parent / "appearance_head.npz")
    detect = make_bottom_up_detector(mcfg, max_people=cfg.max_people,
                                     full_hw=hw,
                                     center_min_score=0.2,
                                     center_nms_window=NMS,
                                     return_appearance=True,
                                     appearance_head=head)
    if SCALE != 1.0:
        base_detect = detect

        @jax.jit
        def detect(params, images):
            kps, centers, valid, emb = base_detect(params, images)
            inv = jnp.asarray([1.0 / SCALE, 1.0 / SCALE, 1.0],
                              dtype=kps.dtype)
            return kps * inv, centers.at[..., :2].mul(1.0 / SCALE), \
                valid, emb
    batch, app = frames_to_frame_batch(detect, params, images, cfg,
                                       collect_appearance=True)

    # detector slots are NOT the generator's slots: build the slot->person
    # labels for the DETECTOR's batch by nearest-projected-GT matching
    # (identity_metrics scores matched_pose indices against these)
    det_slot_person, (same, diff) = _label_detections(seq, batch, app)

    def score(appearance, crossings=False, crossings_cfg=None, **over):
        c = (dataclasses.replace(cfg, appearance_dim=app.shape[-1], **over)
             if appearance else cfg)
        res = pipeline.run(batch, cams_small, c, use_ik=False,
                           app=app if appearance else None,
                           crossings=crossings, crossings_cfg=crossings_cfg)
        m_raw = identity_metrics(res.tracklets, det_slot_person)
        m_reid = identity_metrics(merge_tracklets(res.tracklets),
                                  det_slot_person)
        return {
            "raw_tracks": m_raw.n_pred_tracks,
            "raw_idf1": round(m_raw.idf1, 3),
            "raw_idsw": m_raw.id_switches,
            "reid_idf1": round(m_reid.idf1, 3),
            "reid_idsw": m_reid.id_switches,
        }

    out = {
        "extractor": "color_layout+head" if head else "color_layout",
        "extractor_cos_same": round(same, 3),
        "extractor_cos_diff": round(diff, 3),
        "geometry_only": score(False),
        "appearance_gain60": score(True, appearance_gain_px=60.0),
        # the calibration footgun: the oracle-tuned default gain is too
        # weak for this extractor's 0.14 cosine gap (docs/PERF.md r4)
        "appearance_gain20_default": score(True),
        # online auto-calibration (r4): static gain left at the WRONG
        # default, target 8 px per true-vs-false swap — the tracker should
        # land near the hand-tuned gain60 row without any extractor tuning
        "appearance_auto_target8": score(True,
                                         appearance_auto_target_px=8.0),
        # r5 hindsight crossing repair (cuts + implied merge inside
        # pipeline.run — the raw_* fields of this row are therefore already
        # post-merge; reid_* re-merges, a near no-op)
        "appearance_crossings": score(True, crossings=True),
        # packed scenes push the best static gain UP (contaminated EMAs
        # need a stronger appearance veto): sweep the crossing pass over
        # gain and the auto rule (r5 crowd study)
        "appearance_gain40": score(True, appearance_gain_px=40.0),
        "appearance_crossings_gain40": score(True, crossings=True,
                                             appearance_gain_px=40.0),
        "appearance_crossings_gain60": score(True, crossings=True,
                                             appearance_gain_px=60.0),
        "appearance_crossings_auto20": score(True, crossings=True,
                                             appearance_auto_target_px=20.0),
    }
    if "--gate_sweep" in sys.argv:
        # cut_gate was tuned on the oracle-grade 10x10 crowd (0.03,
        # CrossingConfig docstring); sweep it on THIS scene's extractor
        # at the scene's best static gain to check transfer
        from multiview_motion_capture_tpu.crossings import CrossingConfig

        for g in (0.015, 0.02, 0.05, 0.08):
            out[f"crossings_gain60_gate{g}"] = score(
                True, crossings=True,
                crossings_cfg=CrossingConfig(cut_gate=g),
                appearance_gain_px=60.0)
    print(json.dumps({"metric": "appearance_e2e_study", "extra": out},
                     indent=1))


def _label_detections(seq, batch, app):
    ws = 0.25
    F, V, P = batch.valid.shape
    det_slot_person = np.full((F, V, P), -1, dtype=np.int32)
    embs, labels = [], []
    for f in range(F):
        for v in range(V):
            gt = seq.batch.kps[f, v][..., :2] * ws
            slotp = seq.gt_slot_person[f, v]
            for d in range(P):
                if not batch.valid[f, v, d]:
                    continue
                errs = [np.nanmean(np.linalg.norm(
                    batch.kps[f, v, d, :, :2] - gt[s], axis=-1))
                    if slotp[s] >= 0 else 1e9 for s in range(gt.shape[0])]
                s_best = int(np.argmin(errs))
                if errs[s_best] < 40:
                    det_slot_person[f, v, d] = int(slotp[s_best])
                    embs.append(app[f, v, d])
                    labels.append(int(slotp[s_best]))
    embs = np.stack(embs)
    labels = np.asarray(labels)
    cos = embs @ embs.T
    same = float(cos[labels[:, None] == labels[None, :]].mean())
    diff = float(cos[labels[:, None] != labels[None, :]].mean())
    return det_slot_person, (same, diff)


if __name__ == "__main__":
    main()
