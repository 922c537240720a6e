"""FULL-FRAME end-to-end on-TPU demo without OpenPose (BASELINE.md config 5):

  synthetic multi-person camera frames (whole images, nobody pre-cropped)
  -> person-center proposal channel (multi-peak NMS decode)
  -> on-device fixed-window crops around each proposal
  -> top-down keypoint CNN on the crops
  -> cross-view association + tracking -> 3D tracklets vs ground truth.

This is the multi-person capability the reference delegates to the external
OpenPose binary (ref:run_openpose.sh:1-11): raw frames in, per-person
keypoints out, no upstream detector.  The "camera images" are synthetic
blob renders so a small network trains in seconds; everything downstream of
the pixels is the real production path (data.detect cascade -> FrameBatch ->
pipeline.run).

Run: python examples/e2e_fullframe.py [--steps 400]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

FRAME_HW = (192, 256)   # quarter-ish Shelf scale
CROP_HW = (128, 96)     # proposal window in frame pixels
MODEL_HW = CROP_HW      # CNN input for person crops: native crop resolution
                        # (every heatmap pixel = 4 frame px; a downscaled
                        # crop would quarter the localization precision)
FULL_HW = (96, 128)     # CNN input for the full-frame proposal pass
                        # (landscape, aspect-preserving: net is fully conv)
SCALE = 0.25            # frame px = SCALE * full Shelf-scale px


def render_frame(kps_xy, present, joint_colors, hw=FRAME_HW, sigma=2.0):
    """(P, 17, 2) frame-pixel keypoints (+ presence mask) -> (H, W, 3)."""
    H, W = hw
    ys = np.arange(H)[:, None, None]
    xs = np.arange(W)[None, :, None]
    img = np.zeros((H, W, 3), dtype=np.float32)
    for p in range(kps_xy.shape[0]):
        if not present[p]:
            continue
        cy = kps_xy[p, None, None, :, 1]
        cx = kps_xy[p, None, None, :, 0]
        blobs = np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * sigma ** 2))
        img = np.maximum(img, np.einsum("hwk,kc->hwc", blobs, joint_colors))
    return np.clip(img, 0, 1)


def scaled_cameras(cams, scale):
    """Quarter-resolution calibration: K' = diag(s, s, 1) K."""
    from multiview_motion_capture_tpu.cameras import CameraBank

    K = np.asarray(cams.K, dtype=np.float64).copy()
    K[:, :2, :] *= scale
    wh = np.asarray(cams.img_wh, dtype=np.float64) * scale
    return CameraBank.from_k_rt(K, np.asarray(cams.Rt, dtype=np.float64), wh)


def main(steps=400, n_frames=8, n_people=2, n_views=4, seed=0,
         dump_params=None, cache=False):
    import optax

    from multiview_motion_capture_tpu.config import PipelineConfig
    from multiview_motion_capture_tpu.data.detect import (
        frames_to_frame_batch,
        make_multi_person_detector,
    )
    from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
    from multiview_motion_capture_tpu.models import pose_net as pose_net_mod
    from multiview_motion_capture_tpu.models.checkpoint import (
        load_posenet,
        save_posenet,
    )
    from multiview_motion_capture_tpu.models.pose_net import (
        PoseNet,
        PoseNetConfig,
        center_targets,
        gaussian_heatmaps,
    )
    from multiview_motion_capture_tpu.utils import testcache
    from multiview_motion_capture_tpu import pipeline
    from multiview_motion_capture_tpu.eval import mpjpe_vs_ground_truth

    cfg = PipelineConfig(n_views=n_views, max_people=4, max_tracks=6,
                         max_frames=None)
    # people must be separable in image space: two subjects standing in the
    # same spot merge into one center peak (and occlude each other) in EVERY
    # ring view — not a meaningful detection demo
    seq = synthetic_sequence(n_frames=n_frames, n_people=n_people,
                             n_views=n_views, cfg=cfg, noise_px=0.0,
                             drop_prob=0.0, seed=seed,
                             min_person_distance=1.8)
    rng = np.random.RandomState(seed)
    joint_colors = rng.uniform(0.3, 1.0, size=(17, 3))

    F, V, P = seq.batch.kps.shape[:3]
    kps_px = seq.batch.kps[..., :2] * SCALE        # quarter-scale pixels
    present = seq.batch.valid
    cams_small = scaled_cameras(seq.cameras, SCALE)

    # ---- render full frames ----
    images = np.stack([
        np.stack([render_frame(kps_px[f, v], present[f, v], joint_colors)
                  for v in range(V)])
        for f in range(F)
    ])  # (F, V, H, W, 3)

    # ---- training set: resized full frames + person-centered crops, every
    # sample supervised with ALL people visible in its window ----
    mcfg = PoseNetConfig(img_hw=MODEL_HW, stage_features=(64, 128, 256),
                         blocks_per_stage=1, head_features=128,
                         predict_center=True)
    mh, mw = MODEL_HW
    H, W = FRAME_HW
    ch, cw = CROP_HW

    def make_sample(window_img, window_kps, window_present, win_hw, net_hw):
        """window_kps in window pixels -> (resized image, heatmap targets)."""
        hh, hw_ = net_hw[0] // 4, net_hw[1] // 4
        wh_, ww_ = win_hw
        sx, sy = hw_ / ww_, hh / wh_
        kp_hm = window_kps * np.asarray([sx, sy])
        pres = window_present.astype(np.float32)
        g = np.asarray(gaussian_heatmaps(
            jnp.asarray(kp_hm.reshape(-1, 2))[None], (hh, hw_)))[0]  # (hh,hw,P*17)
        g = np.moveaxis(g, -1, 0).reshape(window_kps.shape[0], 17, hh, hw_)
        kt = (g * pres[:, None, None, None]).max(axis=0)         # (17, hh, hw)
        centers = kp_hm.mean(axis=1)                              # (P, 2)
        # tight center gaussians: nearby people must stay separate peaks on
        # the coarse proposal heatmap
        ct = np.asarray(center_targets(
            jnp.asarray(centers)[None], jnp.asarray(pres)[None], (hh, hw_),
            sigma=1.5))[0]
        tgt = np.concatenate([np.moveaxis(kt, 0, -1), ct[..., None]], axis=-1)
        im = np.asarray(jax.image.resize(jnp.asarray(window_img),
                                         tuple(net_hw) + (3,), method="linear"))
        return im.astype(np.float32), tgt.astype(np.float32)

    full_imgs, full_tgts, crop_imgs, crop_tgts = [], [], [], []
    for f in range(F):
        for v in range(V):
            # full frame sample at the landscape proposal-pass size
            im, tg = make_sample(images[f, v], kps_px[f, v], present[f, v],
                                 FRAME_HW, FULL_HW)
            full_imgs.append(im)
            full_tgts.append(tg)
            # one crop per present person (jittered center), portrait size
            for p in range(P):
                if not present[f, v, p]:
                    continue
                c = kps_px[f, v, p].mean(axis=0) + rng.uniform(-8, 8, 2)
                x0 = int(np.clip(round(c[0] - cw / 2), 0, W - cw))
                y0 = int(np.clip(round(c[1] - ch / 2), 0, H - ch))
                win = images[f, v][y0:y0 + ch, x0:x0 + cw]
                wk = kps_px[f, v] - np.asarray([x0, y0])
                inside = present[f, v] & (
                    (kps_px[f, v, :, 0] >= x0) & (kps_px[f, v, :, 0] < x0 + cw)
                    & (kps_px[f, v, :, 1] >= y0) & (kps_px[f, v, :, 1] < y0 + ch)
                ).any(axis=-1)
                im, tg = make_sample(win, wk, inside, CROP_HW, MODEL_HW)
                crop_imgs.append(im)
                crop_tgts.append(tg)

    full_imgs = jnp.asarray(np.stack(full_imgs))
    full_tgts = jnp.asarray(np.stack(full_tgts))
    crop_imgs = jnp.asarray(np.stack(crop_imgs))
    crop_tgts = jnp.asarray(np.stack(crop_tgts))
    print(f"training set: {full_imgs.shape[0]} full frames + "
          f"{crop_imgs.shape[0]} crops")

    # ---- train: both input sizes through the same (fully-conv) params ----
    model = PoseNet(mcfg)
    ckpt = None
    if cache:
        # train-once disk cache (utils/testcache): keyed by the sources
        # that shape the training + the hyper-params
        fp = testcache.source_fingerprint(
            [pose_net_mod.__file__, __file__],
            f"fullframe-{steps}-{n_frames}-{n_people}-{n_views}-{seed}")
        ckpt = testcache.checkpoint_path("e2e_fullframe", fp)
    if ckpt is not None and ckpt.exists():
        print(f"loading cached training: {ckpt}")
        _, params = load_posenet(ckpt)
    else:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, mh, mw, 3)))["params"]
        tx = optax.adam(2e-3)
        opt = tx.init(params)

        def wmse(h, t):
            # peak-weighted MSE: plain MSE dilutes the gaussian peaks'
            # gradient over the (mostly-background) map and converges slowly
            return jnp.mean((h - t) ** 2 * (1.0 + 20.0 * t))

        @jax.jit
        def train_step(params, opt, idx_f, idx_c):
            def loss_fn(p):
                heat_f = model.apply({"params": p}, full_imgs[idx_f],
                                     train=True)
                heat_c = model.apply({"params": p}, crop_imgs[idx_c],
                                     train=True)
                return (wmse(heat_f, full_tgts[idx_f])
                        + wmse(heat_c, crop_tgts[idx_c]))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(grads, opt)
            return optax.apply_updates(params, upd), opt, loss

        key = jax.random.PRNGKey(1)
        for s in range(steps):
            key, kf, kc = jax.random.split(key, 3)
            idx_f = jax.random.randint(kf, (8,), 0, full_imgs.shape[0])
            idx_c = jax.random.randint(kc, (8,), 0, crop_imgs.shape[0])
            params, opt, loss = train_step(params, opt, idx_f, idx_c)
            if s % 50 == 0 or s == steps - 1:
                print(f"train step {s}: loss {float(loss):.5f}")
        if ckpt is not None:
            save_posenet(ckpt, mcfg, params)

    if dump_params:
        from multiview_motion_capture_tpu.models.checkpoint import save_params

        save_params(Path(dump_params), params)
        print(f"params -> {dump_params}")

    # ---- full multi-person detection + tracking ----
    detect = make_multi_person_detector(
        mcfg, max_people=cfg.max_people, crop_hw=CROP_HW,
        full_hw=FULL_HW, center_min_score=0.2, center_nms_window=5,
    )
    det_batch = frames_to_frame_batch(detect, params, images, cfg)
    n_det = int(det_batch.valid.sum())
    n_pres = int(present.sum())
    print(f"proposals: {n_det} valid detections for {n_pres} person-views "
          f"({n_det / max(n_pres, 1):.2f}x)")

    # detection quality vs ground truth (nearest-person assignment)
    errs, n_hit, n_gt = [], 0, 0
    for f in range(F):
        for v in range(V):
            gt = [kps_px[f, v, p] for p in range(P) if present[f, v, p]]
            n_gt += len(gt)
            for s_ in range(cfg.max_people):
                if not det_batch.valid[f, v, s_]:
                    continue
                d = [np.linalg.norm(det_batch.kps[f, v, s_, :, :2] - g,
                                    axis=-1).mean() for g in gt]
                if d and min(d) < 12.0:
                    n_hit += 1
                    errs.append(min(d))
    det_err = float(np.mean(errs)) if errs else float("inf")
    recall = n_hit / max(n_gt, 1)
    print(f"multi-person detection: recall {recall:.2f}, "
          f"matched err {det_err:.2f} px (quarter-scale frame pixels)")

    res = pipeline.run(det_batch, cams_small, cfg, use_ik=False)
    long = [t for t in res.tracklets if len(t) >= n_frames // 2]
    mpjpe = mpjpe_vs_ground_truth(long, seq.gt_3d)
    print(f"tracking from full-frame detections: {len(res.tracklets)} "
          f"tracklets ({len(long)} long), 3D MPJPE vs GT: {mpjpe * 100:.2f} cm")
    return recall, det_err, len(long), mpjpe


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_e2e")
    main(steps=args.steps)
