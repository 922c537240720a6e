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
    def __call__(self, images: Array, train: bool = False) -> Array:
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
        heat = nn.Conv(c.n_kps, (1, 1), dtype=jnp.float32)(x)
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
