"""End-to-end on-TPU demo without OpenPose (BASELINE.md config 5):

  synthetic multi-view scene -> person crops rendered on device
  -> keypoint CNN trained on the renders -> soft-argmax detection
  -> cross-view association + tracking + IK -> 3D tracklets vs ground truth.

The "camera images" are synthetic: each person crop shows colored gaussian
blobs at the projected keypoints, so a small network can learn localization
quickly; everything else is the real production path (detect stage ->
FrameBatch -> pipeline.run).

Run: python examples/e2e_synthetic.py [--steps 300]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


CROP_HW = (64, 48)


def render_crops(kps_xy, boxes, rng_colors):
    """Blob renderer: (N, K, 2) frame-pixel keypoints + (N, 4) boxes ->
    (N, H, W, 3) crop images with per-joint colored gaussians."""
    N, K, _ = kps_xy.shape
    H, W = CROP_HW
    scale = np.stack([(boxes[:, 2] - boxes[:, 0]) / W,
                      (boxes[:, 3] - boxes[:, 1]) / H], axis=-1)  # (N, 2)
    local = (kps_xy - boxes[:, None, :2]) / scale[:, None, :]     # crop pixels
    ys = np.arange(H)[None, :, None, None]
    xs = np.arange(W)[None, None, :, None]
    cy = local[:, None, None, :, 1]
    cx = local[:, None, None, :, 0]
    blobs = np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * 2.0 ** 2))  # (N,H,W,K)
    img = np.einsum("nhwk,kc->nhwc", blobs, rng_colors)
    return np.clip(img, 0, 1).astype(np.float32), local


def main(steps=300, n_frames=20, n_people=2, n_views=4, seed=0,
         cache=False):
    import optax

    from multiview_motion_capture_tpu.config import PipelineConfig
    from multiview_motion_capture_tpu.data.detect import (
        crops_to_frame_batch,
        make_detector,
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
        gaussian_heatmaps,
        heatmap_loss,
    )
    from multiview_motion_capture_tpu.utils import testcache
    from multiview_motion_capture_tpu import pipeline
    from multiview_motion_capture_tpu.eval import mpjpe_vs_ground_truth

    cfg = PipelineConfig(n_views=n_views, max_people=4, max_tracks=6,
                         max_frames=None)
    seq = synthetic_sequence(n_frames=n_frames, n_people=n_people,
                             n_views=n_views, cfg=cfg, noise_px=0.0,
                             drop_prob=0.0, seed=seed)
    rng = np.random.RandomState(seed)
    joint_colors = rng.uniform(0.3, 1.0, size=(17, 3))

    # ---- build crop dataset from ground-truth detections ----
    F, V, P = seq.batch.kps.shape[:3]
    kps = seq.batch.kps
    valid = seq.batch.valid
    flat_idx = [(f, v, p) for f in range(F) for v in range(V) for p in range(P)
                if valid[f, v, p]]
    xy = np.stack([kps[f, v, p, :, :2] for f, v, p in flat_idx])
    mins = xy.min(axis=1) - 10
    maxs = xy.max(axis=1) + 10
    boxes = np.concatenate([mins, maxs], axis=1)
    crops, local = render_crops(xy, boxes, joint_colors)

    # ---- train the keypoint CNN on the renders ----
    mcfg = PoseNetConfig(img_hw=CROP_HW, stage_features=(64, 128, 256),
                         blocks_per_stage=1, head_features=128)
    model = PoseNet(mcfg)
    ckpt = None
    if cache:
        # train-once disk cache (utils/testcache): keyed by the sources
        # that shape the training + the hyper-params, so any change to the
        # model or this example retrains instead of silently reusing
        fp = testcache.source_fingerprint(
            [pose_net_mod.__file__, __file__],
            f"synthetic-{steps}-{n_frames}-{n_people}-{n_views}-{seed}")
        ckpt = testcache.checkpoint_path("e2e_synthetic", fp)
    if ckpt is not None and ckpt.exists():
        print(f"loading cached training: {ckpt}")
        _, params = load_posenet(ckpt)
    else:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1,) + CROP_HW + (3,)))["params"]
        tx = optax.adam(2e-3)
        opt = tx.init(params)
        target = gaussian_heatmaps(jnp.asarray(local / 4.0), mcfg.heatmap_hw)
        imgs = jnp.asarray(crops)
        mask = jnp.ones((len(crops), 17))

        @jax.jit
        def train_step(params, opt, idx):
            def loss_fn(p):
                heat = model.apply({"params": p}, imgs[idx], train=True)
                return heatmap_loss(heat, target[idx], mask[idx])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(grads, opt)
            return optax.apply_updates(params, upd), opt, loss

        bs = 32
        key = jax.random.PRNGKey(1)
        for s in range(steps):
            key, k = jax.random.split(key)
            idx = jax.random.randint(k, (bs,), 0, len(crops))
            params, opt, loss = train_step(params, opt, idx)
            if s % 50 == 0 or s == steps - 1:
                print(f"train step {s}: loss {float(loss):.5f}")
        if ckpt is not None:
            save_posenet(ckpt, mcfg, params)

    # ---- detect on every crop and run the full pipeline ----
    detect, _ = make_detector(mcfg, params=params)
    crop_t = np.zeros((F, V, P) + CROP_HW + (3,), dtype=np.float32)
    box_t = np.zeros((F, V, P, 4), dtype=np.float32)
    for n, (f, v, p) in enumerate(flat_idx):
        crop_t[f, v, p] = crops[n]
        box_t[f, v, p] = boxes[n]
    det_batch = crops_to_frame_batch(detect, params, jnp.asarray(crop_t),
                                     jnp.asarray(box_t), valid, cfg)

    det_err = []
    for n, (f, v, p) in enumerate(flat_idx):
        det_err.append(np.linalg.norm(det_batch.kps[f, v, p, :, :2] - xy[n], axis=-1).mean())
    print(f"2D detection error: {np.mean(det_err):.2f} px (frame pixels)")

    res = pipeline.run(det_batch, seq.cameras, cfg, use_ik=False)
    long = [t for t in res.tracklets if len(t) >= n_frames // 2]
    mpjpe = mpjpe_vs_ground_truth(long, seq.gt_3d)
    print(f"tracking from CNN detections: {len(res.tracklets)} tracklets "
          f"({len(long)} long), 3D MPJPE vs GT: {mpjpe * 100:.2f} cm")
    return np.mean(det_err), len(long), mpjpe


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_e2e")
    main(steps=args.steps)
