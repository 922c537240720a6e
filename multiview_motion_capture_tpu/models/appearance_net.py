"""Metric-learned appearance embedding head.

The production appearance extractor is the keypoint-color-layout descriptor
(`data.detect.appearance_from_keypoints`): raw RGB at the detection's
keypoints, unit-normalized.  It carries real identity signal (cos gap
0.07-0.14 on tinted renders, docs/PERF.md r4) but treats every keypoint and
channel equally — face/skin keypoints that look the same on everyone count
as much as the torso pixels that actually discriminate, and rendering
nuisances (occlusion bleed, background mixing at grazing keypoints,
lighting) land unattenuated in the cosine.

This module is the trained refinement (docs/ROADMAP.md post-r4 #3): a tiny
MLP on top of the descriptor, metric-learned with a supervised NT-Xent
(SupCon) loss on identity-labeled synthetic renders (identity labels are
free from the renderer — `data.appearance_train` generates descriptors with
stable per-person clothing tints under randomized styles, occlusion, noise
and detector jitter).  The head learns which parts of the color layout are
identity evidence and which are nuisance, widening the same-vs-different
cosine gap toward the oracle regime.

Design notes:
- The head is a pure descriptor->descriptor map: it plugs into the SAME
  tracker pathway (`config.appearance_dim`, EMA + px-per-cosine penalty)
  with no tracker change — only the embedding dimension differs.
- Zero rows (invalid/empty detection slots) must stay zero: the tracker
  treats a zero appearance row as "no evidence" (its cosine with anything
  is 0).  A biased MLP maps 0 to nonzero, so `apply_head` masks its output
  by the input row's norm.
- Inference is a (N, 51) x (51, 128) x ... matmul chain — negligible next
  to the detector forward; it rides the same jit as the descriptor.

No reference analogue: the reference has no appearance model at all (its
association is purely geometric, ref:src/motion_capture.py:634-741); this
head exists to close the crossing-instant identity switches geometry cannot
resolve (docs/PERF.md r4 appearance studies).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class AppearanceHeadConfig:
    # keypoint-color-layout descriptor width: n_kps * 3 (COCO-17 -> 51)
    in_dim: int = 51
    hidden: Tuple[int, ...] = (128, 64)
    out_dim: int = 32


class AppearanceHead(nn.Module):
    cfg: AppearanceHeadConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for h in self.cfg.hidden:
            x = nn.relu(nn.Dense(h)(x))
        x = nn.Dense(self.cfg.out_dim)(x)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-6)


def init_head(rng, cfg: AppearanceHeadConfig):
    return AppearanceHead(cfg).init(rng, jnp.zeros((1, cfg.in_dim)))["params"]


def apply_head(cfg: AppearanceHeadConfig, params, emb: Array) -> Array:
    """(..., in_dim) descriptors -> (..., out_dim) unit embeddings.

    Rows that are zero in the input (empty detection slots) stay zero in
    the output — the tracker's "no appearance evidence" sentinel.
    """
    shape = emb.shape
    flat = emb.reshape(-1, shape[-1])
    z = AppearanceHead(cfg).apply({"params": params}, flat)
    live = (jnp.linalg.norm(flat, axis=-1, keepdims=True) > 1e-6)
    z = jnp.where(live, z, 0.0)
    return z.reshape(shape[:-1] + (cfg.out_dim,))


def supcon_loss(z: Array, labels: Array, tau: float = 0.1) -> Array:
    """Supervised NT-Xent over one batch of unit embeddings.

    For each anchor i, positives are the other samples with the same
    identity label (same person seen from other views / frames / scenes);
    everything else in the batch is a negative.  Anchors with no positive
    (identity seen once) are excluded from the mean.

    z: (N, D) unit rows; labels: (N,) int — globally unique per
    (scene, person) so cross-scene pairs are always negatives.
    """
    n = z.shape[0]
    sim = (z @ z.T) / tau
    eye = jnp.eye(n, dtype=bool)
    sim = jnp.where(eye, -1e9, sim)                       # drop self-pairs
    pos = (labels[:, None] == labels[None, :]) & ~eye
    # log p(positive j | anchor i) averaged over the positives of i
    log_prob = sim - jax.nn.logsumexp(sim, axis=1, keepdims=True)
    n_pos = pos.sum(axis=1)
    per_anchor = -(jnp.where(pos, log_prob, 0.0).sum(axis=1)
                   / jnp.maximum(n_pos, 1))
    has_pos = n_pos > 0
    return (per_anchor * has_pos).sum() / jnp.maximum(has_pos.sum(), 1)


def cosine_gap(z: Array, labels: Array) -> Tuple[Array, Array]:
    """(mean same-identity cosine, mean different-identity cosine) over all
    off-diagonal pairs — the calibration statistic the tracker's auto-gain
    runs on (config.appearance_auto_target_px)."""
    cos = z @ z.T
    eye = jnp.eye(z.shape[0], dtype=bool)
    same = (labels[:, None] == labels[None, :]) & ~eye
    diff = ~same & ~eye
    m_same = jnp.where(same, cos, 0.0).sum() / jnp.maximum(same.sum(), 1)
    m_diff = jnp.where(diff, cos, 0.0).sum() / jnp.maximum(diff.sum(), 1)
    return m_same, m_diff


def make_train_step(cfg: AppearanceHeadConfig, tx, tau: float = 0.1):
    """jitted (params, opt_state, embs, labels) -> (params, opt_state, loss)."""
    import optax

    @jax.jit
    def step(params, opt_state, embs, labels):
        def loss_fn(p):
            z = AppearanceHead(cfg).apply({"params": p}, embs)
            return supcon_loss(z, labels, tau)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
