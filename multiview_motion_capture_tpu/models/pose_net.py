"""On-TPU 2D keypoint CNN — the in-framework replacement for the external
OpenPose C++ binary (ref:run_openpose.sh:1-11; SURVEY.md §2.2 row 1).

A SimpleBaseline-style network (ResNet-ish encoder + transposed-conv head ->
K heatmaps + soft-argmax decode), written for the MXU:

- NHWC layout, bfloat16 activations, f32 params/accumulations,
- channel counts in multiples of 128 where it matters,
- soft-argmax decoding on device so detections feed straight into the
  association kernels without host round-trips (BASELINE.md config 5).

This model is also the framework's training story (the reference has no
training at all): `train_step` is a full optax training step that
`parallel.dryrun_multichip` shards over a dp x tp mesh.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class PoseNetConfig:
    n_kps: int = 17
    stem_features: int = 64
    stage_features: Tuple[int, ...] = (128, 256, 512)
    blocks_per_stage: int = 2
    head_features: int = 256
    img_hw: Tuple[int, int] = (256, 192)
    compute_dtype: Any = jnp.bfloat16
    # adds a person-center heatmap channel (channel n_kps): the proposal
    # stage of the full-frame multi-person path (data.detect), replacing
    # OpenPose's bottom-up multi-person capability with an on-device
    # propose->crop->top-down cascade
    predict_center: bool = False
    # adds 2*n_kps center->keypoint offset channels (after the center
    # channel): the SINGLE-PASS bottom-up decode (decode_bottom_up) — one
    # forward per camera frame instead of the cascade's 1 + max_people
    # forwards, the >100 fps detect path.  Requires predict_center.
    predict_offsets: bool = False

    @property
    def n_out(self) -> int:
        n = self.n_kps + (1 if self.predict_center else 0)
        if self.predict_offsets:
            assert self.predict_center, "offset head needs the center channel"
            n += 2 * self.n_kps
        return n

    @property
    def heatmap_hw(self) -> Tuple[int, int]:
        # stem /4, three stages with stride 2 on the last two, head x4 deconv
        return (self.img_hw[0] // 4, self.img_hw[1] // 4)


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype)(x)
        y = nn.GroupNorm(num_groups=32, dtype=jnp.float32)(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype)(y)
        y = nn.GroupNorm(num_groups=32, dtype=jnp.float32)(y).astype(self.dtype)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(residual)
        return nn.relu(y + residual)


class PoseNet(nn.Module):
    """images (B, H, W, 3) in [0, 1] -> heatmaps (B, H/4, W/4, K)."""

    cfg: PoseNetConfig = PoseNetConfig()

    @nn.compact
    def __call__(self, images: Array, train: bool = False,
                 return_features: bool = False) -> Array:
        """`return_features=True` additionally returns the pre-head /4
        feature map (B, H/4, W/4, head_features); parameter structure is
        unchanged.  NOTE: measured in r4, these trunk features carry no
        appearance-identity signal (the net is domain-randomization-trained
        to IGNORE appearance; same- vs different-person cosine gap 0.004)
        — the production appearance descriptor is
        data.detect.appearance_from_keypoints, not this."""
        c = self.cfg
        x = images.astype(c.compute_dtype)
        # stem: /4
        x = nn.Conv(c.stem_features, (7, 7), strides=(2, 2), use_bias=False,
                    dtype=c.compute_dtype)(x)
        x = nn.GroupNorm(num_groups=32, dtype=jnp.float32)(x).astype(c.compute_dtype)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        # stages: keep /4, then /8, /16
        for i, feats in enumerate(c.stage_features):
            stride = 1 if i == 0 else 2
            x = ResBlock(feats, stride=stride, dtype=c.compute_dtype)(x, train)
            for _ in range(c.blocks_per_stage - 1):
                x = ResBlock(feats, dtype=c.compute_dtype)(x, train)
        # head: two x2 deconvs back to /4
        for _ in range(2):
            x = nn.ConvTranspose(c.head_features, (4, 4), strides=(2, 2),
                                 use_bias=False, dtype=c.compute_dtype)(x)
            x = nn.GroupNorm(num_groups=32, dtype=jnp.float32)(x).astype(c.compute_dtype)
            x = nn.relu(x)
        heat = nn.Conv(c.n_out, (1, 1), dtype=jnp.float32)(x)
        if return_features:
            return heat, x.astype(jnp.float32)
        return heat


def decode_heatmaps(heat: Array, temperature: float = 1.0) -> Array:
    """Soft-argmax heatmap decoding, fully on device.

    heat: (B, H, W, K) -> (B, K, 3) with (x, y, score) in heatmap pixels;
    score = max softmax mass (a confidence proxy comparable to OpenPose's
    per-keypoint score consumed at ref:src/motion_capture.py:974-984)."""
    B, H, W, K = heat.shape
    flat = heat.reshape(B, H * W, K) / temperature
    prob = jax.nn.softmax(flat, axis=1)
    ys = jnp.arange(H, dtype=heat.dtype)
    xs = jnp.arange(W, dtype=heat.dtype)
    grid = prob.reshape(B, H, W, K)
    y = jnp.einsum("bhwk,h->bk", grid, ys)
    x = jnp.einsum("bhwk,w->bk", grid, xs)
    score = jnp.max(prob, axis=1) * (H * W) / 16.0  # normalized peakiness
    score = jnp.clip(score, 0.0, 1.0)
    return jnp.stack([x, y, score], axis=-1)


def decode_heatmaps_local(heat: Array, window: int = 5,
                          temperature: float = 0.25,
                          center_prior_sigma: float = 0.0) -> Array:
    """Peak-local heatmap decoding: hard argmax, then soft-argmax refinement
    inside a `window` x `window` patch around the peak.

    The global soft-argmax (`decode_heatmaps`) blends ALL probability mass in
    the map — a distractor person inside a top-down crop drags every joint
    toward it.  Restricting the expectation to the dominant peak's
    neighborhood keeps sub-pixel refinement while being immune to secondary
    peaks (the multi-person crop case, data.detect stage 2).

    `center_prior_sigma` > 0 makes the decode center-conditioned: the argmax
    runs on the heatmap multiplied by a gaussian prior around the map center
    (sigma in units of the map half-diagonal).  In a proposal-centered crop
    the *proposed* person is the central one, so near-equal peaks from an
    overlapping distractor resolve to the right identity; refinement and
    score still use the raw map.

    heat: (B, H, W, K) -> (B, K, 3) with (x, y, score) in heatmap pixels;
    score = the peak's raw heatmap value clipped to [0, 1] (MSE-trained
    gaussian targets peak near 1).
    """
    B, H, W, K = heat.shape
    hm = jnp.moveaxis(heat, -1, 1).reshape(B * K, H, W)
    if center_prior_sigma > 0:
        ys = (jnp.arange(H, dtype=heat.dtype) - (H - 1) / 2) / (H / 2)
        xs = (jnp.arange(W, dtype=heat.dtype) - (W - 1) / 2) / (W / 2)
        d2 = ys[:, None] ** 2 + xs[None, :] ** 2
        prior = jnp.exp(-d2 / (2 * center_prior_sigma ** 2))
        sel = hm * prior[None]
    else:
        sel = hm
    flat_idx = jnp.argmax(sel.reshape(B * K, H * W), axis=1)
    py = (flat_idx // W).astype(jnp.int32)
    px = (flat_idx % W).astype(jnp.int32)
    half = window // 2

    def one(m, cy, cx):
        y0 = jnp.clip(cy - half, 0, max(H - window, 0))
        x0 = jnp.clip(cx - half, 0, max(W - window, 0))
        win = jax.lax.dynamic_slice(m, (y0, x0), (window, window))
        p = jax.nn.softmax(win.reshape(-1) / temperature).reshape(window, window)
        r = jnp.arange(window, dtype=heat.dtype)
        y = jnp.sum(p.sum(axis=1) * r) + y0.astype(heat.dtype)
        x = jnp.sum(p.sum(axis=0) * r) + x0.astype(heat.dtype)
        score = jnp.clip(m[cy, cx], 0.0, 1.0)
        return jnp.stack([x, y, score])

    out = jax.vmap(one)(hm, py, px)  # (B*K, 3)
    return out.reshape(B, K, 3)


def decode_center_peaks(
    center_heat: Array,
    max_people: int,
    min_score: float = 0.1,
    nms_window: int = 5,
) -> Tuple[Array, Array]:
    """Multi-peak NMS decode of a person-center heatmap — the proposal stage
    of the multi-person path (the capability OpenPose provides bottom-up,
    ref:run_openpose.sh:10 consumed at ref:src/motion_capture.py:974-984).

    A peak is a pixel that equals the max of its nms_window neighborhood and
    exceeds min_score; the strongest `max_people` peaks are kept.  All
    shapes static, fully on device.

    center_heat: (B, H, W) -> (centers (B, max_people, 3) [x, y, score] in
    heatmap pixels, valid (B, max_people) bool).
    """
    B, H, W = center_heat.shape
    pool = jax.lax.reduce_window(
        center_heat, -jnp.inf, jax.lax.max,
        window_dimensions=(1, nms_window, nms_window),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    cand = (center_heat >= pool) & (center_heat > min_score)
    # deterministic tie-break: a plateau of exactly-equal values (clipped or
    # bf16-quantized heatmaps) makes every tied pixel a candidate, which
    # would flood the proposal slots with duplicates of one person.  A
    # second, exact integer pooling keeps only the highest-index candidate
    # of each window (a float bias would round away in f32).
    idx = jnp.broadcast_to(
        jnp.arange(H * W, dtype=jnp.int32).reshape(1, H, W), cand.shape
    )
    cand_idx = jnp.where(cand, idx, -1)
    pool_idx = jax.lax.reduce_window(
        cand_idx, jnp.int32(-1), jax.lax.max,
        window_dimensions=(1, nms_window, nms_window),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    is_peak = cand & (idx == pool_idx)
    vals = jnp.where(is_peak, center_heat, -jnp.inf).reshape(B, H * W)
    top_vals, idx = jax.lax.top_k(vals, max_people)
    ys = (idx // W).astype(center_heat.dtype)
    xs = (idx % W).astype(center_heat.dtype)
    valid = jnp.isfinite(top_vals) & (top_vals > min_score)
    centers = jnp.stack([xs, ys, jnp.where(valid, top_vals, 0.0)], axis=-1)
    return centers, valid


def decode_bottom_up(
    heat: Array,
    n_kps: int,
    max_people: int,
    min_score: float = 0.1,
    nms_window: int = 5,
    snap_window: int = 7,
    snap_min: float = 0.15,
    temperature: float = 0.25,
) -> Tuple[Array, Array, Array]:
    """SINGLE-PASS multi-person decode: center peaks -> regressed keypoints
    -> heatmap snap, all from ONE forward of the full frame.

    This replaces the propose->crop->top-down cascade (1 + max_people
    forwards per camera, `data.detect.make_multi_person_detector`) with a
    CenterNet-style grouping: the network regresses, at every person-center
    pixel, the 2*K offsets from the center to each keypoint, and keypoint
    heatmaps provide sub-pixel refinement.  The offset *attributes* each
    keypoint to its person (the crop cascade's distractor problem by
    construction cannot occur: grouping is regressed, not spatial), the
    heatmap *localizes* it: the regressed position is snapped to a local
    soft-argmax in a `snap_window` patch of the keypoint channel when the
    peak there is confident (> snap_min), else the regression stands (an
    occluded joint keeps a low-score estimate).

    heat: (B, H, W, K + 1 + 2K) from a `predict_offsets=True` PoseNet.
    Returns (kps (B, max_people, K, 3) [x, y, score] in heatmap px,
    centers (B, max_people, 3), valid (B, max_people)).
    """
    B, H, W, C = heat.shape
    K = n_kps
    assert C == 3 * K + 1, (C, K)
    kp_heat = heat[..., :K]
    center_heat = heat[..., K]
    off_maps = heat[..., K + 1:]

    centers, valid = decode_center_peaks(
        center_heat, max_people, min_score=min_score, nms_window=nms_window
    )  # (B, P, 3), (B, P)
    cxy = centers[..., :2]
    cxi = jnp.clip(jnp.round(cxy[..., 0]).astype(jnp.int32), 0, W - 1)
    cyi = jnp.clip(jnp.round(cxy[..., 1]).astype(jnp.int32), 0, H - 1)

    # offsets at the center pixel: (B, P, K, 2)
    def gather_offsets(om, y, x):
        return om[y, x].reshape(K, 2)

    offs = jax.vmap(jax.vmap(gather_offsets, in_axes=(None, 0, 0)))(
        off_maps, cyi, cxi
    )
    reg = cxy[:, :, None, :] + offs                       # (B, P, K, 2)

    # snap to the keypoint heatmap: local soft-argmax around the regressed
    # position (same windowed refinement as decode_heatmaps_local, but
    # centered at the regression instead of a global argmax)
    half = snap_window // 2
    hm = jnp.moveaxis(kp_heat, -1, 1)                     # (B, K, H, W)

    def snap_one(m, rxy):
        rx = jnp.clip(jnp.round(rxy[0]).astype(jnp.int32), 0, W - 1)
        ry = jnp.clip(jnp.round(rxy[1]).astype(jnp.int32), 0, H - 1)
        y0 = jnp.clip(ry - half, 0, max(H - snap_window, 0))
        x0 = jnp.clip(rx - half, 0, max(W - snap_window, 0))
        win = jax.lax.dynamic_slice(m, (y0, x0), (snap_window, snap_window))
        peak = jnp.max(win)
        p = jax.nn.softmax(win.reshape(-1) / temperature).reshape(
            snap_window, snap_window
        )
        r = jnp.arange(snap_window, dtype=m.dtype)
        sy = jnp.sum(p.sum(axis=1) * r) + y0.astype(m.dtype)
        sx = jnp.sum(p.sum(axis=0) * r) + x0.astype(m.dtype)
        snapped = jnp.stack([sx, sy])
        use = peak > snap_min
        xy = jnp.where(use, snapped, rxy)
        score = jnp.clip(peak, 0.0, 1.0)
        return xy, score

    def snap_person(hm_b, reg_p):                          # (K,H,W), (K,2)
        return jax.vmap(snap_one)(hm_b, reg_p)

    xy, kp_score = jax.vmap(jax.vmap(snap_person, in_axes=(None, 0)))(hm, reg)
    score = kp_score[..., None] * centers[..., None, 2:3]
    kps = jnp.concatenate([xy, score], axis=-1)
    kps = kps * valid[..., None, None].astype(kps.dtype)
    return kps, centers, valid


def offset_targets(
    centers: Array, kps: Array, valid: Array, kp_mask: Array,
    hw: Tuple[int, int], radius: float = 2.0,
) -> Tuple[Array, Array]:
    """Ground truth for the offset head: at every pixel within `radius` of a
    person center, the (dx, dy) from that PIXEL to each of the person's
    keypoints (so the decode's gather at the detected — not exact — center
    pixel still points at the right joints).

    centers (B, P, 2), kps (B, P, K, 2) in heatmap px, valid (B, P),
    kp_mask (B, P, K).  Overlapping discs: the nearest center wins.
    Returns (targets (B, H, W, 2K), mask (B, H, W, K)).
    """
    H, W = hw
    B, P, K, _ = kps.shape
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    px = jnp.broadcast_to(xs[None, None, :], (B, H, W))
    py = jnp.broadcast_to(ys[None, :, None], (B, H, W))
    d2 = (
        (px[..., None] - centers[:, None, None, :, 0]) ** 2
        + (py[..., None] - centers[:, None, None, :, 1]) ** 2
    )  # (B, H, W, P)
    d2 = jnp.where(valid[:, None, None, :], d2, jnp.inf)
    owner = jnp.argmin(d2, axis=-1)                       # (B, H, W)
    within = jnp.min(d2, axis=-1) <= radius ** 2          # (B, H, W)

    kps_at = jnp.take_along_axis(
        kps[:, None, None], owner[..., None, None, None], axis=3
    )[:, :, :, 0]                                          # (B, H, W, K, 2)
    mask_at = jnp.take_along_axis(
        kp_mask[:, None, None], owner[..., None, None], axis=3
    )[:, :, :, 0]                                          # (B, H, W, K)
    tx = kps_at[..., 0] - px[..., None]
    ty = kps_at[..., 1] - py[..., None]
    tgt = jnp.stack([tx, ty], axis=-1).reshape(B, H, W, 2 * K)
    mask = mask_at * within[..., None]
    return tgt, mask


def offset_loss(pred: Array, target: Array, mask: Array) -> Array:
    """Masked smooth-L1 over the offset field.  pred/target (B, H, W, 2K),
    mask (B, H, W, K) (each keypoint's x and y share its mask entry)."""
    B, H, W, C = pred.shape
    K = C // 2
    d = (pred - target).reshape(B, H, W, K, 2)
    ad = jnp.abs(d)
    l1 = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5).sum(-1)  # (B, H, W, K)
    denom = jnp.maximum(mask.sum(), 1.0)
    return jnp.sum(l1 * mask) / denom


def center_targets(centers: Array, valid: Array, hw: Tuple[int, int],
                   sigma: float = 3.0) -> Array:
    """Ground-truth person-center heatmap: per-person gaussians combined by
    max.  centers (B, P, 2) in heatmap pixels, valid (B, P) -> (B, H, W)."""
    H, W = hw
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
    cy = centers[:, None, None, :, 1]
    cx = centers[:, None, None, :, 0]
    g = jnp.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * sigma ** 2))
    g = g * valid[:, None, None, :]
    return g.max(axis=-1)


def gaussian_heatmaps(kps: Array, hw: Tuple[int, int], sigma: float = 2.0) -> Array:
    """Render ground-truth gaussians: kps (B, K, 2) in heatmap pixels ->
    (B, H, W, K)."""
    H, W = hw
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
    cy = kps[:, None, None, :, 1]
    cx = kps[:, None, None, :, 0]
    return jnp.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * sigma ** 2))


def heatmap_loss(pred: Array, target: Array, kp_mask: Array) -> Array:
    """Masked MSE heatmap loss; kp_mask (B, K) zeroes invisible joints."""
    se = (pred - target) ** 2
    return jnp.mean(se * kp_mask[:, None, None, :])


def create_train_state(rng, cfg: PoseNetConfig, lr: float = 1e-3):
    import optax

    model = PoseNet(cfg)
    H, W = cfg.img_hw
    params = model.init(rng, jnp.zeros((1, H, W, 3)))["params"]
    tx = optax.adamw(lr)
    return model, params, tx, tx.init(params)


def train_step(model: PoseNet, params, opt_state, tx, images, target_heat, kp_mask):
    """One full supervised step (loss, grads, optimizer update)."""

    def loss_fn(p):
        heat = model.apply({"params": p}, images, train=True)
        return heatmap_loss(heat, target_heat, kp_mask)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    import optax

    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
