"""Dense-crowd detection diagnosis (VERDICT r4 next #1).

The r4 measurement: 6+ tightly packed rendered people collapse detection
(e2e IDF1 ~0.15).  This study separates the failure into stages on the
SHIPPED checkpoint:

  A. detection recall/precision vs crowd density (the headline number),
  B. CENTER recall alone (does the center channel even fire per person?),
  C. oracle-center decode (GT centers injected, network offsets + snap):
     isolates grouping/offset cross-talk from center detection,
  D. center-collision stats (how close do GT centers get in heatmap px
     vs the NMS window).

Usage: python scripts/crowd_detect_study.py [--people 8] [--frames 8]
Runs on CPU.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.detect import make_bottom_up_detector
from multiview_motion_capture_tpu.data.detect_train import (
    evaluate_detections,
    render_sequence,
)
from multiview_motion_capture_tpu.data.render import RenderConfig
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
from multiview_motion_capture_tpu.models.checkpoint import load_posenet
from multiview_motion_capture_tpu.models.pose_net import PoseNet

CKPT = (Path(__file__).resolve().parents[1]
        / "multiview_motion_capture_tpu/models/checkpoints/posenet_synth.npz")
WS = 0.25  # world px -> render px


def gt_arrays(seq, n_frames, n_views):
    """(N, P, K, 2) gt kps in render px + (N, P) presence, flattened over
    (frame, view) samples."""
    kps, pres = [], []
    for f in range(n_frames):
        for v in range(n_views):
            kps.append(seq.batch.kps[f, v][..., :2] * WS)
            pres.append(seq.batch.valid[f, v])
    return np.stack(kps), np.stack(pres)


def visibility_arrays(seq, n_frames, n_views, render_cfg, seed):
    """Re-render with the owner map to get per-joint visibility ground truth
    (identical rng draws to render_sequence — images match bit-exactly)."""
    from multiview_motion_capture_tpu.data.detect_train import _cam_locations
    from multiview_motion_capture_tpu.data.render import render_scene

    rng = np.random.RandomState(seed)
    cam_loc = _cam_locations(seq.cameras)
    vis = []
    for f in range(n_frames):
        for v in range(n_views):
            kv = seq.batch.kps[f, v][..., :2] * WS
            pres = seq.batch.valid[f, v]
            slot_p = seq.gt_slot_person[f, v]
            depth = np.array([
                np.linalg.norm(seq.gt_3d[f, slot_p[s], 11] - cam_loc[v])
                if slot_p[s] >= 0 else 1e9 for s in range(len(pres))
            ])
            _, vv = render_scene(kv, pres, depth, rng, render_cfg,
                                 return_visibility=True)
            vis.append(vv)
    return np.stack(vis)


def center_stats(gt_kps, gt_pres):
    """Min pairwise GT-center distance per sample, in heatmap px."""
    dists = []
    for i in range(gt_kps.shape[0]):
        c = gt_kps[i][gt_pres[i]].mean(axis=1) / 4.0  # heatmap px
        if len(c) < 2:
            continue
        d = np.linalg.norm(c[:, None] - c[None], axis=-1)
        d[np.arange(len(c)), np.arange(len(c))] = np.inf
        dists.append(d.min(axis=1))
    d = np.concatenate(dists)
    return {
        "min_center_dist_hm_px_p10": round(float(np.percentile(d, 10)), 2),
        "median": round(float(np.median(d)), 2),
        "frac_under_3px": round(float((d < 3).mean()), 3),
        "frac_under_5px": round(float((d < 5).mean()), 3),
    }


def center_recall(centers, valid, gt_kps, gt_pres, match_px=10.0):
    """Fraction of GT people with a detected center within match_px
    (frame px)."""
    n_gt, n_hit = 0, 0
    for i in range(centers.shape[0]):
        gt_c = gt_kps[i][gt_pres[i]].mean(axis=1)
        n_gt += len(gt_c)
        det_c = centers[i][valid[i]][:, :2]
        used = np.zeros(len(det_c), bool)
        for g in gt_c:
            if len(det_c) == 0:
                continue
            d = np.linalg.norm(det_c - g, axis=-1)
            d[used] = np.inf
            j = int(np.argmin(d))
            if d[j] < match_px:
                used[j] = True
                n_hit += 1
    return n_hit / max(n_gt, 1)


def oracle_center_decode(mcfg, params, images_flat, gt_kps, gt_pres):
    """Run the net, but group with GT centers: isolates offset/snap quality
    from center detection."""
    from multiview_motion_capture_tpu.models.pose_net import decode_bottom_up

    model = PoseNet(mcfg)
    K = mcfg.n_kps
    P = gt_kps.shape[1]
    N = images_flat.shape[0]
    det = np.zeros((N, P, K, 3), np.float32)
    val = np.zeros((N, P), bool)
    fwd = jax.jit(lambda p, im: model.apply({"params": p}, im))
    for s in range(0, N, 16):
        e = min(N, s + 16)
        heat = np.asarray(fwd(params, jnp.asarray(images_flat[s:e])))
        H, W = heat.shape[1:3]
        for i in range(e - s):
            gi = s + i
            gt_c = gt_kps[gi].mean(axis=1) / 4.0  # heatmap px
            for p in range(P):
                if not gt_pres[gi, p]:
                    continue
                cx = int(np.clip(round(gt_c[p, 0]), 0, W - 1))
                cy = int(np.clip(round(gt_c[p, 1]), 0, H - 1))
                offs = heat[i, cy, cx, K + 1:].reshape(K, 2)
                reg = gt_c[p] + offs
                # snap: local max in a 7x7 window of each kp channel
                for k in range(K):
                    rx = int(np.clip(round(reg[k, 0]), 0, W - 1))
                    ry = int(np.clip(round(reg[k, 1]), 0, H - 1))
                    y0, x0 = max(0, ry - 3), max(0, rx - 3)
                    win = heat[i, y0:y0 + 7, x0:x0 + 7, k]
                    pk = float(win.max()) if win.size else 0.0
                    if pk > 0.15:
                        yy, xx = np.unravel_index(int(win.argmax()), win.shape)
                        det[gi, p, k] = [(x0 + xx) * 4, (y0 + yy) * 4, pk]
                    else:
                        det[gi, p, k] = [reg[k, 0] * 4, reg[k, 1] * 4, 0.1]
                val[gi, p] = True
    return det, val


def main():
    n_people = 10
    n_frames = 8
    if "--people" in sys.argv:
        n_people = int(sys.argv[sys.argv.index("--people") + 1])
    if "--frames" in sys.argv:
        n_frames = int(sys.argv[sys.argv.index("--frames") + 1])
    ckpt = Path(CKPT)
    if "--ckpt" in sys.argv:
        ckpt = Path(sys.argv[sys.argv.index("--ckpt") + 1])
    nms = 5
    if "--nms" in sys.argv:
        nms = int(sys.argv[sys.argv.index("--nms") + 1])
    n_views = 5
    mcfg, params = load_posenet(ckpt)
    out = {}
    for npp, dist in [(4, 1.2), (6, 0.8), (8, 0.5), (10, 0.3)]:
        if npp > max(n_people, 4):
            continue
        cfg = PipelineConfig(n_views=n_views, max_people=npp + 4)
        seq = synthetic_sequence(n_frames=n_frames, n_people=npp,
                                 n_views=n_views, cfg=cfg, seed=1,
                                 noise_px=0.0, drop_prob=0.0,
                                 min_person_distance=dist)
        images = render_sequence(seq, RenderConfig(hw=(192, 256)),
                                 world_scale=WS, seed=2)
        gt_kps, gt_pres = gt_arrays(seq, n_frames, n_views)
        flat = images.reshape(-1, 192, 256, 3)

        detect = make_bottom_up_detector(mcfg, max_people=cfg.max_people,
                                         center_min_score=0.2,
                                         center_nms_window=nms)
        kps_l, ctr_l, val_l = [], [], []
        for f in range(n_frames):
            k, c, v = detect(params, jnp.asarray(images[f]))
            kps_l.append(np.asarray(k))
            ctr_l.append(np.asarray(c))
            val_l.append(np.asarray(v))
        det_kps = np.concatenate(kps_l)
        centers = np.concatenate(ctr_l)
        det_val = np.concatenate(val_l)

        # physical limit: people with < 5 visible joints after occlusion
        # cannot be detected from this view by ANY detector
        vis = visibility_arrays(seq, n_frames, n_views,
                                RenderConfig(hw=(192, 256)), seed=2)
        detectable = gt_pres & (vis.sum(axis=-1) >= 5)

        ev = evaluate_detections(det_kps, det_val, gt_kps, gt_pres)
        ev_d = evaluate_detections(det_kps, det_val, gt_kps, detectable)
        c_rec = center_recall(centers, det_val, gt_kps, gt_pres)
        o_kps, o_val = oracle_center_decode(mcfg, params, flat, gt_kps,
                                            gt_pres)
        ev_o = evaluate_detections(o_kps, o_val, gt_kps, gt_pres)
        out[f"p{npp}_d{dist}"] = {
            "recall": round(ev["recall"], 3),
            "recall_detectable": round(ev_d["recall"], 3),
            "frac_detectable": round(float(detectable.sum())
                                     / max(int(gt_pres.sum()), 1), 3),
            "precision": round(ev["precision"], 3),
            "err_px": round(ev["mean_err_px"], 2),
            "center_recall": round(c_rec, 3),
            "oracle_center_recall": round(ev_o["recall"], 3),
            "oracle_center_err_px": round(ev_o["mean_err_px"], 2),
            "centers": center_stats(gt_kps, gt_pres),
        }
        print(npp, dist, json.dumps(out[f"p{npp}_d{dist}"]))
    print(json.dumps({"metric": "crowd_detect_study", "extra": out}, indent=1))


if __name__ == "__main__":
    main()
