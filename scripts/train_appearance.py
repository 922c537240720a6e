"""Train the appearance embedding head (models.appearance_net).

Metric-learns a tiny MLP on identity-labeled keypoint-color-layout
descriptors from tinted synthetic renders (data.appearance_train), selects
the checkpoint by HELD-OUT cosine gap (fresh scenes, tints, and render
seeds), and saves it self-describing
(models/checkpoints/appearance_head.npz by default).

    python scripts/train_appearance.py               # CPU, ~3 min
    python scripts/train_appearance.py --scenes 24 --iters 400

The measured effect (docs/PERF.md r4): held-out same-vs-different cosine
gap 0.05 raw -> ~0.7 trained; the e2e identity effect is measured by
scripts/appearance_e2e_study.py --head.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np
import optax

from multiview_motion_capture_tpu.data.appearance_train import descriptor_batch
from multiview_motion_capture_tpu.models.appearance_net import (
    AppearanceHeadConfig,
    apply_head,
    cosine_gap,
    init_head,
    make_train_step,
)
from multiview_motion_capture_tpu.models.checkpoint import save_appearance_head

DEFAULT_OUT = (Path(__file__).resolve().parents[1]
               / "multiview_motion_capture_tpu/models/checkpoints"
               / "appearance_head.npz")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--weight_decay", type=float, default=1e-4)
    ap.add_argument("--tau", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=str(DEFAULT_OUT))
    args = ap.parse_args()

    embs, labels = descriptor_batch(seed=args.seed, n_scenes=args.scenes,
                                    n_frames=args.frames)
    # held-out: fresh scenes/tints/styles, NEVER trained on (seed offset
    # far outside the training draw)
    ve, vl = descriptor_batch(seed=args.seed + 100_003, n_scenes=4,
                              n_frames=args.frames)
    ve, vl = jnp.asarray(ve), jnp.asarray(vl)
    raw_s, raw_d = cosine_gap(ve, vl)
    print(f"train {embs.shape} ids={np.unique(labels).size} | "
          f"val {ve.shape} raw gap={float(raw_s - raw_d):.3f}",
          file=sys.stderr)

    cfg = AppearanceHeadConfig(in_dim=embs.shape[-1])
    params = init_head(jax.random.PRNGKey(args.seed), cfg)
    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt = tx.init(params)
    step = make_train_step(cfg, tx, tau=args.tau)

    embs_j, labels_j = jnp.asarray(embs), jnp.asarray(labels)
    best_gap, best_params, best_it = -1.0, params, 0
    for i in range(args.iters):
        params, opt, loss = step(params, opt, embs_j, labels_j)
        if (i + 1) % 25 == 0:
            s, d = cosine_gap(apply_head(cfg, params, ve), vl)
            gap = float(s - d)
            print(f"it {i + 1}: loss={float(loss):.4f} val gap={gap:.3f}",
                  file=sys.stderr)
            if gap > best_gap:
                best_gap, best_params, best_it = gap, params, i + 1

    save_appearance_head(Path(args.out), cfg, best_params)
    s, d = cosine_gap(apply_head(cfg, best_params, ve), vl)
    print(json.dumps({
        "metric": "appearance_head_val_cos_gap",
        "value": round(best_gap, 3),
        "unit": "cosine",
        "extra": {
            "raw_gap": round(float(raw_s - raw_d), 3),
            "val_same": round(float(s), 3),
            "val_diff": round(float(d), 3),
            "best_iter": best_it,
            "n_train": int(embs.shape[0]),
            "out": str(args.out),
        },
    }))


if __name__ == "__main__":
    main()
