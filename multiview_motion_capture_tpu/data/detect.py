"""On-TPU detection stage: camera images -> FrameBatch, no OpenPose.

Closes BASELINE.md config 5 ("end-to-end on-TPU: 2D keypoint CNN inference +
streaming association/IK, no OpenPose"): the keypoint CNN (models.pose_net)
runs over all views of a frame in one batch, heatmaps decode on device via
soft-argmax, and the decoded (x, y, score) tensors feed straight into the
association kernels without leaving the device.

Two entry points:

- `crops_to_frame_batch`: person boxes come from an upstream detector
  (SimpleBaseline-style top-down on caller-provided crops).
- `make_multi_person_detector` / `frames_to_frame_batch`: FULL multi-person
  frames, no external detector — an on-device propose->crop->top-down
  cascade replacing OpenPose's bottom-up multi-person capability
  (ref:run_openpose.sh:10, consumed at ref:src/motion_capture.py:974-984):
  stage 1 runs the CNN's person-center channel on the resized full frame
  and multi-peak-NMS decodes up to P proposals; stage 2 dynamic-slices a
  fixed window around each proposal (static shapes, vmapped) and runs the
  same CNN top-down on the crops.  Everything between raw pixels and the
  association kernels stays on device.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.ingest import FrameBatch
from multiview_motion_capture_tpu.models.appearance_net import apply_head
from multiview_motion_capture_tpu.models.pose_net import (
    PoseNet,
    PoseNetConfig,
    decode_bottom_up,
    decode_center_peaks,
    decode_heatmaps,
    decode_heatmaps_local,
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


# ---------------------------------------------------------------------------
# full-frame multi-person path (propose -> crop -> top-down)
# ---------------------------------------------------------------------------

def crop_windows(image: Array, centers_xy: Array, crop_hw: Tuple[int, int],
                 out_hw: Tuple[int, int]) -> Tuple[Array, Array]:
    """Fixed-size windows around (traced) centers, resized for the CNN.

    Static shapes throughout: `lax.dynamic_slice` with clamped starts per
    proposal (vmapped), then a bilinear resize to the model input.

    image: (H, W, 3); centers_xy: (P, 2) frame pixels.
    Returns (crops (P, out_h, out_w, 3), boxes (P, 4) [x1, y1, x2, y2]).
    """
    H, W = image.shape[:2]
    ch, cw = crop_hw
    if ch > H or cw > W:
        raise ValueError(
            f"crop window {crop_hw} exceeds the image ({H}, {W}); "
            "dynamic_slice cannot produce out-of-bounds sizes"
        )

    def one(c):
        x0 = jnp.clip(jnp.round(c[0] - cw / 2).astype(jnp.int32), 0, W - cw)
        y0 = jnp.clip(jnp.round(c[1] - ch / 2).astype(jnp.int32), 0, H - ch)
        crop = jax.lax.dynamic_slice(image, (y0, x0, 0), (ch, cw, 3))
        crop = jax.image.resize(crop, tuple(out_hw) + (3,), method="linear")
        box = jnp.asarray([x0, y0, x0 + cw, y0 + ch], dtype=image.dtype)
        return crop, box

    return jax.vmap(one)(centers_xy)


def make_multi_person_detector(
    model_cfg: PoseNetConfig,
    max_people: int,
    crop_hw: Tuple[int, int],
    full_hw: Optional[Tuple[int, int]] = None,
    center_min_score: float = 0.1,
    center_nms_window: int = 5,
    kps_window: int = 5,
    kps_center_prior: float = 0.0,
):
    """Build detect_fn(params, images) for FULL multi-person frames.

    `model_cfg` must have `predict_center=True` (one model serves both
    stages: its center channel proposes on the resized full frame, its
    keypoint channels localize on each proposal crop).  The network is fully
    convolutional, so the proposal pass runs at its own input size
    `full_hw` (default: model input scaled to the 4:3-ish landscape of a
    camera frame) while crops use `model_cfg.img_hw` — a landscape frame
    squeezed into the portrait crop shape would destroy localization.

    detect_fn: (V, H, W, 3) images -> (kps (V, max_people, K, 3) in frame
    pixels, boxes (V, max_people, 4), valid (V, max_people)).
    """
    assert model_cfg.predict_center, "multi-person path needs the center channel"
    model = PoseNet(model_cfg)
    mh, mw = model_cfg.img_hw
    K = model_cfg.n_kps
    if full_hw is None:
        full_hw = (mh, max(16, (mh * 4 // 3) // 16 * 16))
    fh, fw = full_hw

    @jax.jit
    def detect(params, images):
        V, H, W = images.shape[:3]
        # accept uint8 frames: camera images should cross the host->device
        # link at 1 byte/px (the f32 upload is 4x the bytes and dominates
        # end-to-end time on tunneled TPUs); normalization is free on device
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0

        # ---- stage 1: propose person centers on the resized full frame ----
        small = jax.image.resize(images, (V, fh, fw, 3), method="linear")
        heat = model.apply({"params": params}, small)
        centers_hm, valid = decode_center_peaks(
            heat[..., K], max_people,
            min_score=center_min_score, nms_window=center_nms_window,
        )  # heatmap px of the resized frame
        hh, hw_ = heat.shape[1], heat.shape[2]
        to_frame = jnp.asarray([W / hw_, H / hh], dtype=images.dtype)
        centers_xy = centers_hm[..., :2] * to_frame          # (V, P, 2)

        # ---- stage 2: crop fixed windows, run the CNN top-down ----
        crops, boxes = jax.vmap(
            lambda img, c: crop_windows(img, c, crop_hw, model_cfg.img_hw)
        )(images, centers_xy)                                 # (V, P, ...)
        # peak-local decoding: a crop can contain parts of OTHER people; the
        # global soft-argmax would blend their peaks in
        flat = crops.reshape(V * max_people, mh, mw, 3)
        kps_hm = decode_heatmaps_local(
            model.apply({"params": params}, flat)[..., :K],
            window=kps_window, center_prior_sigma=kps_center_prior,
        ).reshape(V, max_people, K, 3)
        # heatmap px -> model px -> crop px -> frame px
        scale = jnp.asarray([crop_hw[1] / mw, crop_hw[0] / mh],
                            dtype=images.dtype) * 4.0
        xy = kps_hm[..., :2] * scale + boxes[..., None, :2]
        score = kps_hm[..., 2:3] * centers_hm[..., None, 2:3]
        kps = jnp.concatenate([xy, score], axis=-1)
        kps = kps * valid[..., None, None].astype(kps.dtype)
        return kps, boxes, valid

    return detect


def appearance_from_keypoints(images, kps, valid, min_score: float = 0.1):
    """Keypoint-color-layout appearance descriptor.

    Samples each detection's image RGB at its keypoint locations (the
    person's own pixels — shirt/pants/skin tones in body-part order),
    masks low-score keypoints, flattens to (K*3,) and unit-normalizes.
    Normalization cancels global brightness/exposure scaling, and the
    per-part layout separates same-colored-but-differently-dressed people.

    Chosen over PoseNet trunk features after measurement: the trunk is
    TRAINED to ignore appearance (domain-randomized palettes), and its
    center-sampled features carry no identity signal (same-person vs
    different-person cosine gap 0.004 on stable-tint renders, docs/PERF.md
    r4); raw color layout at the keypoints separates cleanly.  Works with
    any detector's output (bottom-up, cascade, or external OpenPose).

    images: (V, H, W, 3) f32 in [0,1]; kps: (V, P, K, 3) in IMAGE pixels
    (same resolution as `images`); valid: (V, P).
    Returns (V, P, K*3) unit rows (zero rows for invalid detections).
    """
    V, P, K = kps.shape[:3]
    rgb = jax.vmap(lambda img, pts: _sample_bilinear(img, pts))(
        images, kps[..., :2].reshape(V, P * K, 2)
    ).reshape(V, P, K, 3)
    w = (kps[..., 2:3] > min_score).astype(rgb.dtype)
    emb = (rgb * w).reshape(V, P, K * 3)
    emb = emb * valid[..., None].astype(emb.dtype)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                             1e-6)


def _sample_bilinear(feat, xy):
    """Bilinear feature sampling: feat (H, W, C), xy (P, 2) grid px ->
    (P, C)."""
    H, W = feat.shape[:2]
    x = jnp.clip(xy[:, 0], 0.0, W - 1.001)
    y = jnp.clip(xy[:, 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    f00 = feat[y0, x0]
    f01 = feat[y0, x0 + 1]
    f10 = feat[y0 + 1, x0]
    f11 = feat[y0 + 1, x0 + 1]
    return ((1 - wy) * ((1 - wx) * f00 + wx * f01)
            + wy * ((1 - wx) * f10 + wx * f11))


def make_bottom_up_detector(
    model_cfg: PoseNetConfig,
    max_people: int,
    full_hw: Optional[Tuple[int, int]] = None,
    center_min_score: float = 0.1,
    center_nms_window: int = 5,
    snap_window: int = 7,
    snap_min: float = 0.15,
    det_min_score: float = 0.0,
    return_appearance: bool = False,
    appearance_head=None,
):
    """SINGLE-PASS full-frame multi-person detector (the >100 fps path).

    One CNN forward per camera frame: the `predict_offsets=True` model emits
    keypoint heatmaps + a center channel + center->keypoint offset fields,
    and `models.pose_net.decode_bottom_up` groups and localizes everything
    on device — no person crops, no second forward (the cascade
    `make_multi_person_detector` spends 1 + max_people forwards per camera).
    This is the in-framework replacement for OpenPose's bottom-up
    multi-person capability (ref:run_openpose.sh:10, consumed at
    ref:src/motion_capture.py:974-984) in its own bottom-up style.

    detect_fn: (V, H, W, 3) images (f32 in [0,1] or uint8) ->
    (kps (V, max_people, K, 3) in frame pixels, centers, valid) — plus
    per-detection appearance embeddings (V, max_people, K*3) when
    `return_appearance=True`: the keypoint-color-layout descriptor
    (`appearance_from_keypoints`), unit rows (zero for empty slots), ready
    for the tracker's appearance-evidence term (config.appearance_dim).
    Same single forward either way.

    `appearance_head` = (AppearanceHeadConfig, params) additionally refines
    the descriptor through the metric-learned MLP
    (`models.appearance_net`, trained by scripts/train_appearance.py):
    embeddings become (V, max_people, head.out_dim), held-out cosine gap
    ~0.7 vs the raw descriptor's 0.05-0.14 (docs/PERF.md r4).  The MLP is
    a negligible matmul chain riding the same jit.
    """
    assert model_cfg.predict_offsets, "bottom-up path needs the offset head"
    model = PoseNet(model_cfg)
    K = model_cfg.n_kps
    fh, fw = full_hw if full_hw is not None else model_cfg.img_hw

    @jax.jit
    def detect(params, images):
        V, H, W = images.shape[:3]
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        if (H, W) != (fh, fw):
            images = jax.image.resize(images, (V, fh, fw, 3), method="linear")
        heat = model.apply({"params": params}, images)
        kps_hm, centers, valid = decode_bottom_up(
            heat, K, max_people,
            min_score=center_min_score, nms_window=center_nms_window,
            snap_window=snap_window, snap_min=snap_min,
        )
        hh, hw_ = heat.shape[1], heat.shape[2]
        if return_appearance:
            # keypoint-color-layout descriptor, sampled from the (resized)
            # input frames at the decoded keypoints (heatmap px -> resized
            # frame px is the /4 head stride)
            kps_img = jnp.concatenate(
                [kps_hm[..., :2] * 4.0, kps_hm[..., 2:3]], axis=-1)
            emb = appearance_from_keypoints(images, kps_img, valid)
            if appearance_head is not None:
                emb = apply_head(appearance_head[0], appearance_head[1], emb)
        to_frame = jnp.asarray([W / hw_, H / hh], dtype=kps_hm.dtype)
        xy = kps_hm[..., :2] * to_frame
        kps = jnp.concatenate([xy, kps_hm[..., 2:3]], axis=-1)
        # centers in frame pixels too (decode_bottom_up emits heatmap px;
        # keypoints and centers must share units for downstream cropping/viz)
        centers = jnp.concatenate(
            [centers[..., :2] * to_frame, centers[..., 2:]], axis=-1
        )
        if det_min_score > 0:
            valid = valid & (jnp.max(kps[..., 2], axis=-1) > det_min_score)
        if return_appearance:
            return kps, centers, valid, emb
        return kps, centers, valid

    return detect


def frames_to_frame_batch(detect_fn, params, images, cfg: PipelineConfig,
                          collect_appearance: bool = False):
    """Run the multi-person detector over a whole sequence.

    images: (F, V, H, W, 3) float in [0, 1] (numpy or jax), one device
    dispatch per frame (all V views batched inside detect_fn) so device
    memory stays bounded; the result plugs into pipeline.run like prepared
    OpenPose data.

    `collect_appearance=True` (detect_fn built with
    `make_bottom_up_detector(return_appearance=True)`) additionally returns
    the per-detection embeddings (F, V, P, D) for the tracker's
    appearance-evidence term — the return becomes `(FrameBatch, app)`.
    """
    F = images.shape[0]
    P = cfg.max_people
    kps_out = None  # allocated from the detector's own K on the first frame
    valid_out = np.zeros((F, cfg.n_views, P), dtype=bool)
    app_out = None
    # upload/compute overlap: device_put is async, so starting frame f+1's
    # host->device copy BEFORE dispatching frame f's network overlaps the
    # transfer with compute — the uint8 upload is the measured bottleneck
    # of e2e detection on tunneled TPUs (docs/PERF.md)
    nxt = jax.device_put(images[0]) if F else None
    for f in range(F):
        cur = nxt
        if f + 1 < F:
            nxt = jax.device_put(images[f + 1])
        out = detect_fn(params, cur)
        if collect_appearance:
            kps, _, valid, emb = out
        else:
            kps, _, valid = out
        if kps_out is None:
            kps_out = np.zeros((F, cfg.n_views, P, kps.shape[-2], 3),
                               dtype=np.float32)
            if collect_appearance:
                app_out = np.zeros((F, cfg.n_views, P, emb.shape[-1]),
                                   dtype=np.float32)
        n = min(P, kps.shape[1])
        kps_out[f, :, :n] = np.asarray(kps)[:, :n]
        valid_out[f, :, :n] = np.asarray(valid)[:, :n]
        if collect_appearance:
            app_out[f, :, :n] = np.asarray(emb)[:, :n]
    if kps_out is None:
        kps_out = np.zeros((F, cfg.n_views, P, 17, 3), dtype=np.float32)
    batch = FrameBatch(kps=kps_out, valid=valid_out)
    if collect_appearance:
        if app_out is None:
            app_out = np.zeros((F, cfg.n_views, P, 0), dtype=np.float32)
        return batch, app_out
    return batch
