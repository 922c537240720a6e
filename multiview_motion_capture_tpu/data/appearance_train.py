"""Identity-labeled descriptor batches for the appearance head.

Generates the training data `models.appearance_net` learns from: render
multi-person scenes with STABLE per-person clothing tints (identity IS
color-separable, the regime the appearance evidence targets) under the
renderer's full style randomization (background gradients/blobs, limb-like
distractors, brightness, sensor noise, occlusion from crowding), run the
keypoint-color-layout descriptor at detector-noise-corrupted keypoints, and
return (descriptor, identity-label) pairs.

Identity labels are free: the generator knows which person each detection
slot is (`seq.gt_slot_person`).  Labels are offset per scene so cross-scene
pairs are always negatives — two scenes may coincidentally sample close
tints, which is exactly the hard-negative pressure the head should face.

Detector noise model (matches the measured bottom-up detector on these
renders, docs/PERF.md r4): ~2 px keypoint jitter plus random keypoint
dropout (the descriptor masks score <= 0.1 keypoints, so dropout teaches
the head to not rely on any single body part).

No reference analogue (the reference has no appearance model); part of the
trained-appearance lever, docs/ROADMAP.md post-r4 #3.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from multiview_motion_capture_tpu.config import PipelineConfig


def random_person_tints(rng: np.random.RandomState, n_people: int,
                        lo: float = 0.3, hi: float = 1.7) -> np.ndarray:
    """(P, 3) stable clothing-color multipliers, uniform per channel.

    Uniform sampling (rather than maximally-spread hues) makes some pairs
    land close together — the hard negatives that force the head to use the
    full color LAYOUT rather than the mean tint.
    """
    return rng.uniform(lo, hi, size=(n_people, 3)).astype(np.float32)


def descriptor_batch(
    seed: int,
    n_scenes: int = 4,
    n_frames: int = 6,
    n_views: int = 5,
    n_people: Tuple[int, int] = (3, 5),
    hw: Tuple[int, int] = (192, 256),
    world_scale: float = 0.25,
    kp_jitter_px: float = 2.0,
    kp_drop: float = 0.15,
    render_cfg=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (embs (N, K*3) unit f32, labels (N,) int32), N = all valid
    detections across scenes x frames x views.

    Each scene: fresh people, walks, camera ring, tints, and render style
    (seeded off `seed`); labels are (scene * 64 + person).
    """
    import jax.numpy as jnp

    from multiview_motion_capture_tpu.data.detect import (
        appearance_from_keypoints,
    )
    from multiview_motion_capture_tpu.data.detect_train import render_sequence
    from multiview_motion_capture_tpu.data.render import RenderConfig
    from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence

    rng = np.random.RandomState(seed)
    rcfg = render_cfg or RenderConfig(hw=hw)
    embs, labels = [], []
    for s in range(n_scenes):
        P = int(rng.randint(n_people[0], n_people[1] + 1))
        cfg = PipelineConfig(n_views=n_views, max_people=max(8, P + 2),
                             max_tracks=12, max_frames=None)
        seq = synthetic_sequence(
            n_frames=n_frames, n_people=P, n_views=n_views, cfg=cfg,
            seed=int(rng.randint(1 << 30)), noise_px=0.0, drop_prob=0.0,
            min_person_distance=1.0,
        )
        tints = random_person_tints(rng, P)
        images = render_sequence(seq, rcfg, world_scale=world_scale,
                                 seed=int(rng.randint(1 << 30)),
                                 person_tints=tints)
        F, V, Pmax, K = seq.batch.kps.shape[:4]
        for f in range(F):
            kps = seq.batch.kps[f].astype(np.float32).copy()  # (V, P, K, 3)
            kps[..., :2] = (kps[..., :2] * world_scale
                            + rng.normal(0, kp_jitter_px,
                                         size=kps[..., :2].shape))
            score = (rng.uniform(size=kps[..., 2].shape) >= kp_drop)
            kps[..., 2] = score.astype(np.float32)
            emb = np.asarray(appearance_from_keypoints(
                jnp.asarray(images[f]), jnp.asarray(kps),
                jnp.asarray(seq.batch.valid[f])))          # (V, P, K*3)
            for v in range(V):
                for p in range(Pmax):
                    person = seq.gt_slot_person[f, v, p]
                    if not seq.batch.valid[f, v, p] or person < 0:
                        continue
                    row = emb[v, p]
                    if np.linalg.norm(row) < 1e-6:
                        continue      # fully dropped-out detection
                    embs.append(row)
                    labels.append(s * 64 + int(person))
    return (np.stack(embs).astype(np.float32),
            np.asarray(labels, dtype=np.int32))
