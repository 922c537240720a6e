"""Train the bottom-up keypoint CNN and ship the checkpoint.

Produces `multiview_motion_capture_tpu/models/checkpoints/posenet_synth.npz`
— the committed replacement for OpenPose's downloaded weights
(ref:run_openpose.sh): a `predict_offsets=True` PoseNet trained on
domain-randomized synthetic scenes (data.render: occlusion by depth,
shared-palette people, distractor clutter, scale/lighting variation) and
evaluated on held-out seeds.

Run ON THE TPU (one process!):
    python scripts/train_posenet.py --steps 6000
Quality gates (held-out synthetic, quarter-Shelf scale):
    recall >= 0.9 @ 12 px, matched mean error <= 3 px.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

FRAME_HW = (192, 256)
TRAIN_SEEDS = list(range(100))
EVAL_SEEDS = list(range(1000, 1010))
# dense-crowd curriculum (VERDICT r4 next #1): 5-10 people with tight
# starting packing; disjoint from both the base train and eval seed ranges
CROWD_TRAIN_SEEDS = list(range(2000, 2080))
CROWD_EVAL_SEEDS = list(range(3000, 3010))
CACHE = Path("/tmp/posenet_synth_data")


def build_model_cfg():
    from multiview_motion_capture_tpu.models.pose_net import PoseNetConfig

    return PoseNetConfig(
        img_hw=FRAME_HW,
        stage_features=(64, 128, 256),
        blocks_per_stage=2,
        head_features=128,
        predict_center=True,
        predict_offsets=True,
    )


def load_or_generate(tag, seeds, n_frames=6, n_views=4,
                     n_people_range=(1, 5), min_person_distance=0.9,
                     max_people=6, visibility_aware=False):
    """Dataset generation runs in a forced-CPU SUBPROCESS: the generator is
    host-side numpy + small jax target renders, and running it inside the
    TPU-attached training process would push every chunked intermediate
    through the axon tunnel (measured: minutes of stall)."""
    import subprocess

    from multiview_motion_capture_tpu.data.detect_train import SampleSet

    CACHE.mkdir(parents=True, exist_ok=True)
    va = "_va" if visibility_aware else ""
    f = (CACHE / f"{tag}_{len(seeds)}_{n_frames}x{n_views}"
                 f"_p{n_people_range[0]}-{n_people_range[1]}"
                 f"_d{min_person_distance}{va}.npz")
    if not f.exists():
        t0 = time.time()
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "import sys; sys.path.insert(0, {root!r});"
            "import numpy as np;"
            "from multiview_motion_capture_tpu.data.detect_train import generate_samples;"
            "from multiview_motion_capture_tpu.data.render import RenderConfig;"
            "ss = generate_samples({seeds!r}, RenderConfig(hw={hw!r}),"
            " n_frames={nf}, n_views={nv}, n_people_range={pr!r},"
            " min_person_distance={mpd}, max_people={mp},"
            " visibility_aware={va});"
            "np.savez({out!r}, **ss.__dict__)"
        ).format(root=str(Path(__file__).resolve().parents[1]),
                 seeds=list(seeds), hw=tuple(FRAME_HW), nf=n_frames,
                 nv=n_views, pr=tuple(n_people_range),
                 mpd=min_person_distance, mp=max_people,
                 va=visibility_aware, out=str(f))
        # CPU forcing happens via jax.config.update as the FIRST statement
        # of the child code — never via the JAX_PLATFORMS env var, which on
        # this image can hang the interpreter at jax import (CLAUDE.md)
        subprocess.run([sys.executable, "-c", code], check=True,
                       timeout=7200)
        print(f"{tag}: generated in {time.time()-t0:.0f}s", file=sys.stderr)
    z = np.load(f)
    return SampleSet(**{k: z[k] for k in z.files})


def _pad_people(ss, P):
    """Pad a SampleSet's per-person arrays to P slots (for mixing sets
    generated at different max_people)."""
    from multiview_motion_capture_tpu.data.detect_train import SampleSet

    n, p0 = ss.present.shape
    if p0 >= P:
        return ss
    kps = np.full((n, P, 17, 2), np.nan, np.float32)
    kps[:, :p0] = ss.kps_px
    pres = np.zeros((n, P), bool)
    pres[:, :p0] = ss.present
    vis = np.zeros((n, P, 17), bool)
    if ss.vis is not None and getattr(ss.vis, "ndim", 0) == 3:
        vis[:, :p0] = ss.vis
    return SampleSet(images=ss.images, kps_px=kps, present=pres,
                     heat_tgt=ss.heat_tgt, off_tgt=ss.off_tgt,
                     off_mask=ss.off_mask, vis=vis)


def evaluate(mcfg, params, ss, max_people=6, center_nms=5):
    import jax.numpy as jnp

    from multiview_motion_capture_tpu.data.detect import make_bottom_up_detector
    from multiview_motion_capture_tpu.data.detect_train import evaluate_detections

    detect = make_bottom_up_detector(mcfg, max_people=max_people,
                                     center_min_score=0.2,
                                     center_nms_window=center_nms)
    N = ss.images.shape[0]
    kps_all, val_all = [], []
    B = 16
    for s in range(0, N, B):
        kps, _, valid = detect(params, jnp.asarray(ss.images[s:s + B]))
        kps_all.append(np.asarray(kps))
        val_all.append(np.asarray(valid))
    kps = np.concatenate(kps_all)
    valid = np.concatenate(val_all)
    return evaluate_detections(kps, valid, np.nan_to_num(ss.kps_px[..., :2]),
                               ss.present, match_px=12.0)


def main(steps=6000, batch=16, lr=1e-3, out=None, resume=None, crowd=False,
         noise_aug=0.0):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    import jax.numpy as jnp
    import optax

    from multiview_motion_capture_tpu.data.detect_train import make_train_step
    from multiview_motion_capture_tpu.models.checkpoint import (
        load_posenet,
        save_posenet,
    )
    from multiview_motion_capture_tpu.models.pose_net import PoseNet

    crowd_heldout = None
    if crowd:
        # dense-crowd curriculum: the base distribution regenerated with
        # visibility-aware supervision (occluded joints / fully occluded
        # people excluded from the targets) + tightly packed 5-10-person
        # scenes.  The r4 shipped checkpoint never saw >5 people and
        # collapses at 6+ packed (crowd_detect_study: recall 0.67-0.78,
        # center NMS collisions + occlusion cross-talk).
        base = load_or_generate("train", TRAIN_SEEDS, visibility_aware=True)
        dense = load_or_generate(
            "crowd_train", CROWD_TRAIN_SEEDS, n_people_range=(5, 10),
            min_person_distance=0.35, max_people=12, visibility_aware=True)
        P = dense.present.shape[1]
        from multiview_motion_capture_tpu.data.detect_train import SampleSet

        b = _pad_people(base, P)
        train = SampleSet(
            images=np.concatenate([b.images, dense.images]),
            kps_px=np.concatenate([b.kps_px, dense.kps_px]),
            present=np.concatenate([b.present, dense.present]),
            heat_tgt=np.concatenate([b.heat_tgt, dense.heat_tgt]),
            off_tgt=np.concatenate([b.off_tgt, dense.off_tgt]),
            off_mask=np.concatenate([b.off_mask, dense.off_mask]),
            vis=np.concatenate([b.vis, dense.vis]),
        )
        crowd_heldout = load_or_generate(
            "crowd_eval", CROWD_EVAL_SEEDS, n_people_range=(8, 10),
            min_person_distance=0.35, max_people=12, visibility_aware=True)
    else:
        train = load_or_generate("train", TRAIN_SEEDS)
    heldout = load_or_generate("eval", EVAL_SEEDS)

    mcfg = build_model_cfg()
    if resume:
        mcfg, params = load_posenet(Path(resume))
        print(f"resumed from {resume}", file=sys.stderr)
    else:
        model = PoseNet(mcfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1,) + FRAME_HW + (3,)))["params"]
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(300, steps // 10), decay_steps=steps,
        end_value=lr * 0.02,
    )
    tx = optax.adamw(sched)
    opt = tx.init(params)
    step_fn = make_train_step(mcfg, tx)

    imgs = jnp.asarray(train.images)
    heat_t = jnp.asarray(train.heat_tgt)
    off_t = jnp.asarray(train.off_tgt)
    off_m = jnp.asarray(train.off_mask)
    N = imgs.shape[0]
    print(f"training on {N} samples, {steps} steps, batch {batch}",
          file=sys.stderr)

    if noise_aug > 0:
        # photometric augmentation (r5): per-sample brightness scale +
        # additive sensor noise.  Targets the dark_noisy style-holdout
        # precision gate (spurious weak center peaks under heavy noise,
        # docs/PERF.md r4 style table) WITHOUT training on the held-out
        # styles themselves.  Targets are unchanged — photometry moves no
        # keypoint.
        aug_step = step_fn

        @jax.jit
        def step_with_aug(params, opt, images, heat_tgt, off_tgt, off_mask,
                          k):
            k1, k2, k3 = jax.random.split(k, 3)
            scale = jax.random.uniform(k1, (images.shape[0], 1, 1, 1),
                                       minval=0.5, maxval=1.15)
            sigma = jax.random.uniform(k2, (images.shape[0], 1, 1, 1),
                                       minval=0.0, maxval=noise_aug)
            images = jnp.clip(
                images * scale + sigma * jax.random.normal(k3, images.shape),
                0.0, 1.0)
            return aug_step(params, opt, images, heat_tgt, off_tgt, off_mask)

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for s in range(steps):
        key, k = jax.random.split(key)
        idx = jax.random.randint(k, (batch,), 0, N)
        if noise_aug > 0:
            key, ka = jax.random.split(key)
            params, opt, loss = step_with_aug(params, opt, imgs[idx],
                                              heat_t[idx], off_t[idx],
                                              off_m[idx], ka)
        else:
            params, opt, loss = step_fn(params, opt, imgs[idx], heat_t[idx],
                                        off_t[idx], off_m[idx])
        if s % 500 == 0 or s == steps - 1:
            print(f"step {s}: loss {float(loss):.5f} "
                  f"({(time.time()-t0):.0f}s)", file=sys.stderr)

    q_train = evaluate(mcfg, params, train,
                       max_people=train.present.shape[1])
    q_eval = evaluate(mcfg, params, heldout)
    extra = {
        "train": q_train, "heldout": q_eval, "steps": steps,
    }
    if crowd_heldout is not None:
        # crowd gate: recall vs DETECTABLE people (visibility-aware
        # presence); both NMS windows so the decode sweep is in the record
        extra["crowd_heldout_nms5"] = evaluate(
            mcfg, params, crowd_heldout, max_people=14)
        extra["crowd_heldout_nms3"] = evaluate(
            mcfg, params, crowd_heldout, max_people=14, center_nms=3)
    out = Path(out) if out else (
        Path(__file__).resolve().parents[1]
        / "multiview_motion_capture_tpu/models/checkpoints/posenet_synth.npz"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    save_posenet(out, mcfg, params, dtype=np.float16)
    extra["checkpoint"] = str(out)
    extra["ckpt_mb"] = round(out.stat().st_size / 1e6, 1)
    print(json.dumps({
        "metric": "posenet_heldout_recall",
        "value": round(q_eval["recall"], 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--crowd", action="store_true",
                    help="dense-crowd curriculum: visibility-aware "
                         "supervision + 5-10-person packed scenes mixed in, "
                         "crowd held-out gates reported")
    ap.add_argument("--noise_aug", type=float, default=0.0,
                    help="photometric augmentation: brightness scale "
                         "[0.5, 1.15] + additive gaussian noise with "
                         "per-sample sigma up to this value (0 disables)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    main(steps=args.steps, batch=args.batch, lr=args.lr, out=args.out,
         resume=args.resume, crowd=args.crowd, noise_aug=args.noise_aug)
