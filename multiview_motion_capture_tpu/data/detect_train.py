"""Training harness for the bottom-up keypoint CNN: domain-randomized
sample generation, the combined heatmap+center+offset loss, and detection
quality evaluation.

This is the in-framework replacement for the training OpenPose got from its
authors (the reference just downloads weights, ref:run_openpose.sh); here
the whole loop — data synthesis (data.render), supervision targets, train
step, held-out evaluation — ships with the framework, and
`scripts/train_posenet.py` produces the committed checkpoint
(models/checkpoints/posenet_synth.npz).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.data.render import RenderConfig, render_scene
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
from multiview_motion_capture_tpu.models.pose_net import (
    PoseNet,
    PoseNetConfig,
    center_targets,
    gaussian_heatmaps,
    offset_loss,
    offset_targets,
)

Array = jnp.ndarray


@dataclasses.dataclass
class SampleSet:
    images: np.ndarray    # (N, H, W, 3) f32
    kps_px: np.ndarray    # (N, P, 17, 2) frame px (NaN for absent)
    present: np.ndarray   # (N, P) bool (supervision presence; with
                          # visibility_aware this excludes fully-occluded
                          # people — the physical detection limit)
    heat_tgt: np.ndarray  # (N, hh, hw, K+1) keypoint + center targets
    off_tgt: np.ndarray   # (N, hh, hw, 2K)
    off_mask: np.ndarray  # (N, hh, hw, K)
    vis: np.ndarray = None  # (N, P, 17) bool per-joint occlusion ground
                            # truth from the renderer's owner map


def _cam_locations(cams) -> np.ndarray:
    Rt = np.asarray(cams.Rt, dtype=np.float64)  # (V, 3, 4)
    R, t = Rt[:, :, :3], Rt[:, :, 3]
    return -np.einsum("vji,vj->vi", R, t)


def generate_samples(
    seeds: List[int],
    render_cfg: RenderConfig,
    n_frames: int = 6,
    n_people_range: Tuple[int, int] = (1, 4),
    n_views: int = 4,
    max_people: int = 6,
    zoom_range: Tuple[float, float] = (0.75, 1.3),
    heat_sigma: float = 2.0,
    center_sigma: float = 1.5,
    world_scale: float = 0.25,
    min_person_distance: float = 0.9,
    visibility_aware: bool = False,
    min_visible_joints: int = 5,
) -> SampleSet:
    """Render (frame, view) samples from 3D-consistent synthetic scenes.

    Every sample is one camera view of a multi-person scene: people occlude
    each other exactly as their 3D positions dictate (painter's algorithm by
    camera distance), a per-sample zoom varies apparent scale beyond the
    natural camera-distance variation, and all randomization comes from the
    scene seed — held-out seeds give a clean eval set.

    `visibility_aware=True` is the dense-crowd curriculum switch (VERDICT r4
    next #1): supervision follows the renderer's occlusion ground truth —
    painted-over joints are excluded from the heatmap/offset targets (firing
    there would be hallucination) and a person whose visible-joint count
    drops below `min_visible_joints` is excluded entirely (center target 0:
    a fully occluded person is physically undetectable from this view, and
    supervising an unreachable center teaches noise).  `present` then means
    "detectable", which is also what crowd recall must be measured against.
    The default (False) reproduces the r3/r4 supervision bit-exactly
    (`vis` is still returned for diagnostics — the renderer's rng draws are
    identical either way).
    """
    H, W = render_cfg.hw
    hh, hw = H // 4, W // 4
    imgs, all_kps, all_pres, all_vis = [], [], [], []
    for seed in seeds:
        rng = np.random.RandomState(seed)
        n_people = int(rng.randint(n_people_range[0], n_people_range[1] + 1))
        seq = synthetic_sequence(
            n_frames=n_frames, n_people=n_people, n_views=n_views,
            noise_px=0.0, drop_prob=0.0, seed=seed,
            min_person_distance=min_person_distance,
        )
        cam_loc = _cam_locations(seq.cameras)
        kseq = seq.batch.kps[..., :2] * world_scale  # full-res px -> render px
        for f in range(n_frames):
            for v in range(n_views):
                zoom = rng.uniform(*zoom_range)
                kv = kseq[f, v].copy()
                pres = seq.batch.valid[f, v].copy()
                ctr = np.array([W / 2, H / 2])
                kv[..., :2] = (kv[..., :2] - ctr) * zoom + ctr
                # a person counts when most joints are inside the frame
                inside = (
                    (kv[..., 0] >= -5) & (kv[..., 0] < W + 5)
                    & (kv[..., 1] >= -5) & (kv[..., 1] < H + 5)
                ).mean(axis=-1) > 0.6
                pres = pres & inside
                # camera distance orders occlusion
                slot_p = seq.gt_slot_person[f, v]
                depth = np.array([
                    np.linalg.norm(seq.gt_3d[f, slot_p[s], 11] - cam_loc[v])
                    if slot_p[s] >= 0 else 1e9
                    for s in range(len(pres))
                ])
                img, vis = render_scene(kv, pres, depth, rng, render_cfg,
                                        return_visibility=True)
                kp_pad = np.full((max_people, 17, 2), np.nan, np.float32)
                pr_pad = np.zeros(max_people, bool)
                vis_pad = np.zeros((max_people, 17), bool)
                n = min(max_people, len(pres))
                kp_pad[:n] = kv[:n]
                pr_pad[:n] = pres[:n]
                vis_pad[:n] = vis[:n]
                imgs.append(img)
                all_kps.append(kp_pad)
                all_pres.append(pr_pad)
                all_vis.append(vis_pad)

    images = np.stack(imgs)
    kps_px = np.stack(all_kps)
    present = np.stack(all_pres)
    vis_arr = np.stack(all_vis)
    if visibility_aware:
        present = present & (vis_arr.sum(axis=-1) >= min_visible_joints)

    # supervision at heatmap resolution, in bounded chunks: the heatmap
    # renderers materialize (B, hh, hw, P*K)-sized intermediates — at
    # thousands of samples that is multiple GB per op (and on a tunneled
    # TPU every result crosses the link); 64 samples at a time stays small
    khm = np.nan_to_num(kps_px) / 4.0
    pres_f = present.astype(np.float32)
    N, P = present.shape
    if visibility_aware:
        # per-joint supervision weight: a painted-over joint contributes no
        # heatmap gaussian and no offset target
        joint_w = (vis_arr & present[..., None]).astype(np.float32)
    else:
        joint_w = np.broadcast_to(pres_f[:, :, None], (N, P, 17)).astype(
            np.float32).copy()
    heat_out = np.zeros((N, hh, hw, 18), dtype=np.float32)
    off_out = np.zeros((N, hh, hw, 34), dtype=np.float32)
    om_out = np.zeros((N, hh, hw, 17), dtype=np.float32)
    for s in range(0, N, 64):
        e = min(N, s + 64)
        g = np.asarray(gaussian_heatmaps(
            jnp.asarray(khm[s:e].reshape(e - s, P * 17, 2)), (hh, hw),
            sigma=heat_sigma,
        )).reshape(e - s, hh, hw, P, 17)
        kt = (g * joint_w[s:e, None, None]).max(axis=3)
        centers = khm[s:e].mean(axis=2)
        ct = np.asarray(center_targets(
            jnp.asarray(centers), jnp.asarray(pres_f[s:e]), (hh, hw),
            sigma=center_sigma,
        ))
        ot, om = offset_targets(
            jnp.asarray(centers), jnp.asarray(khm[s:e]),
            jnp.asarray(present[s:e]), jnp.asarray(joint_w[s:e]), (hh, hw),
            radius=2.0,
        )
        heat_out[s:e] = np.concatenate([kt, ct[..., None]], axis=-1)
        off_out[s:e] = np.asarray(ot)
        om_out[s:e] = np.asarray(om)
    return SampleSet(
        images=images,
        kps_px=kps_px,
        present=present,
        heat_tgt=heat_out,
        off_tgt=off_out,
        off_mask=om_out,
        vis=vis_arr,
    )


def render_sequence(seq, render_cfg: RenderConfig,
                    world_scale: float = 0.25, seed: int = 0,
                    person_tints: np.ndarray = None) -> np.ndarray:
    """Render a SyntheticSequence's views consistently (no per-sample zoom):
    (F, V, H, W, 3) frames whose detections match `seq.batch.kps *
    world_scale` — the end-to-end detect->track evaluation input (pair with
    cameras scaled by the same factor, e.g. examples.e2e_fullframe.
    scaled_cameras)."""
    rng = np.random.RandomState(seed)
    cam_loc = _cam_locations(seq.cameras)
    F, V = seq.batch.kps.shape[:2]
    kseq = seq.batch.kps[..., :2] * world_scale
    out = np.zeros((F, V) + render_cfg.hw + (3,), dtype=np.float32)
    for f in range(F):
        for v in range(V):
            pres = seq.batch.valid[f, v]
            slot_p = seq.gt_slot_person[f, v]
            depth = np.array([
                np.linalg.norm(seq.gt_3d[f, slot_p[s], 11] - cam_loc[v])
                if slot_p[s] >= 0 else 1e9
                for s in range(len(pres))
            ])
            tints = (person_tints[np.clip(slot_p, 0, None)]
                     if person_tints is not None else None)
            out[f, v] = render_scene(kseq[f, v], pres, depth, rng, render_cfg,
                                     person_tints=tints)
    return out


def make_train_step(model_cfg: PoseNetConfig, tx, heat_weight: float = 1.0,
                    peak_weight: float = 20.0, off_weight: float = 0.1):
    """jitted (params, opt, images, heat_tgt, off_tgt, off_mask) ->
    (params, opt, loss).  Heatmaps get peak-weighted MSE (plain MSE dilutes
    the gaussian peaks over the mostly-background map), offsets smooth-L1."""
    import optax

    model = PoseNet(model_cfg)
    K = model_cfg.n_kps

    @jax.jit
    def step(params, opt, images, heat_tgt, off_tgt, off_mask):
        def loss_fn(p):
            out = model.apply({"params": p}, images, train=True)
            heat = out[..., : K + 1]
            l_heat = jnp.mean(
                (heat - heat_tgt) ** 2 * (1.0 + peak_weight * heat_tgt)
            )
            l_off = offset_loss(out[..., K + 1:], off_tgt, off_mask)
            return heat_weight * l_heat + off_weight * l_off

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    return step


def evaluate_detections(
    det_kps: np.ndarray,    # (N, Pd, K, 3) detector output, frame px
    det_valid: np.ndarray,  # (N, Pd)
    gt_kps: np.ndarray,     # (N, P, K, 2)
    gt_present: np.ndarray,  # (N, P)
    match_px: float = 12.0,
):
    """Greedy nearest-person matching: recall@match_px, matched mean error,
    and precision (detections that matched some person)."""
    n_gt = 0
    n_hit = 0
    n_det = 0
    n_det_matched = 0
    errs = []
    for i in range(det_kps.shape[0]):
        gts = [gt_kps[i, p] for p in range(gt_kps.shape[1])
               if gt_present[i, p]]
        n_gt += len(gts)
        hit_gt = [False] * len(gts)
        for s in range(det_kps.shape[1]):
            if not det_valid[i, s]:
                continue
            n_det += 1
            if not gts:
                continue
            d = [np.nanmean(np.linalg.norm(det_kps[i, s, :, :2] - g, axis=-1))
                 for g in gts]
            j = int(np.argmin(d))
            if d[j] < match_px:
                n_det_matched += 1
                if not hit_gt[j]:
                    hit_gt[j] = True
                    n_hit += 1
                    errs.append(d[j])
    recall = n_hit / max(n_gt, 1)
    precision = n_det_matched / max(n_det, 1)
    err = float(np.mean(errs)) if errs else float("inf")
    return {"recall": recall, "precision": precision, "mean_err_px": err,
            "n_gt": n_gt, "n_det": n_det}
